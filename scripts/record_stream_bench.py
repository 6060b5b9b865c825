"""Per-round stream-bench artifact (VERDICT r3 #6).

Runs `bench.py --mode stream` and records its JSON line to
BENCH_STREAM_r{N}.json at the repo root, so the transfer-inclusive
throughput number is tracked round-over-round next to the resident
flagship number (BENCH_r{N}.json) instead of living in one NOTES.md
paragraph. The stream number on THIS host benchmarks the ~0.03 GB/s
relay link (honestly attributed in bench.py); on direct-attached hosts
it converges to the resident number — tracking both per round is what
makes that claim falsifiable when the hardware changes.

Usage: python scripts/record_stream_bench.py --round 4 [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--stream-iters", type=int, default=20)
    p.add_argument("--timeout", type=int, default=1800)
    args = p.parse_args()

    cmd = [sys.executable, os.path.join(ROOT, "bench.py"), "--mode", "stream",
           "--batch", str(args.batch), "--stream-iters",
           str(args.stream_iters)]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                       timeout=args.timeout)
    line = ""
    for ln in r.stdout.splitlines():
        if ln.startswith("{"):
            line = ln
    if r.returncode != 0 or not line:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        sys.stderr.write(f"record_stream_bench: bench rc={r.returncode}\n")
        return 1
    parsed = json.loads(line)
    out = {"round": args.round, "batch": args.batch,
           "stream_iters": args.stream_iters, **parsed}
    path = os.path.join(ROOT, f"BENCH_STREAM_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
