"""Aggregate queue eval outputs into the error-bar tables
(VERDICT r3 #2 / r4 #1,#8): per-(severity, seed) coarse-vs-refined metrics
with the night-RMSE delta, plus mean±spread across seeds. Multiple --dir
values merge rounds (r4 holds seeds 42/43, r5 holds 44/45 — the 4-seed
tables need both).

Usage: python scripts/r4_summarize.py [--dir results/r4 results/r5]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def last_json(path: str):
    if not os.path.isfile(path):
        return None
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", nargs="+", default=["results/r4"])
    args = ap.parse_args()

    # tags: s0_sd42 (Phase B), ns05/ns10 (C/A), ns10_sd43 (F),
    # s1_sd42_ms (Phase E plain-multistage arm; "_ms" rides the tag so the
    # s2c-vs-plain contrast prints side by side), s1_sd42_a4 (r5 Phase K
    # trained-at-abs=4 arm)
    pat = re.compile(
        r"^(s\d|ns\d+)_?(?:sd(\d+))?(_ms|_a4)?_eval_(all|night|day)\.txt$")
    table: dict = {}
    for d_ in args.dir:
        for fn in sorted(os.listdir(d_)):
            m = pat.match(fn)
            if not m:
                continue
            tag = m.group(1) + (m.group(3) or "")
            seed, split = m.group(2) or "-", m.group(4)
            d = last_json(os.path.join(d_, fn))
            if d is None:
                continue
            # first dir listed wins on collisions (re-run evals)
            table.setdefault((tag, seed), {}).setdefault(split, d)

    metrics = ("rmse", "mae", "absrel")
    hdr = " ".join(f"{'Δ' + m + '%':>9s}" for m in metrics)
    print(f"{'chain':14s} {'split':6s} {'c_rmse':>8s} {'r_rmse':>8s} {hdr}"
          f"  (negative = refined wins)")
    deltas: dict = {}
    for (tag, seed), splits in sorted(table.items()):
        for split in ("all", "night", "day"):
            if split not in splits:
                continue
            row = []
            for m in metrics:
                c = splits[split]["coarse"][m]
                r = splits[split]["refined"][m]
                dl = 100 * (r - c) / c
                row.append(dl)
                deltas.setdefault((tag, split, m), []).append(dl)
            c0 = splits[split]["coarse"]["rmse"]
            r0 = splits[split]["refined"]["rmse"]
            cells = " ".join(f"{d:+9.2f}" for d in row)
            print(f"{tag + '/sd' + seed:14s} {split:6s} {c0:8.4f} {r0:8.4f} "
                  f"{cells}")

    print("\nmean ± half-spread of Δ% across seeds (refined vs coarse):")
    for (tag, split, m), ds in sorted(deltas.items()):
        if len(ds) < 2:
            continue
        mean = sum(ds) / len(ds)
        half = (max(ds) - min(ds)) / 2
        print(f"  {tag:8s} {split:6s} {m:7s} {mean:+.2f}% ± {half:.2f}%  "
              f"(n={len(ds)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
