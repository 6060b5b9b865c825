"""Claims-vs-artifacts checker (VERDICT r4 #4): every `results/...` (and
`BENCH*/MULTICHIP*` JSON) path cited in the narrative docs must exist on disk
AND be tracked by git. r3 lost a round's experiments at a session boundary
and r4 committed a ROUND4.md that referenced Phase H results which did not
exist yet — this gate turns that class of drift into a loud failure before
the end-of-round commit.

Usage:  python scripts/check_claims.py   (exit 0 = clean, 1 = violations)
Wired into the round queue (scripts/r5_queue.sh) as the final step.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Docs whose claims must be backed by artifacts.
DOCS = ["NOTES.md", "README.md", "PARITY.md", "ARCHITECTURE.md"]
DOC_GLOBS = re.compile(r"ROUND\d+\.md$")

# Artifact path patterns worth gating. Deliberately conservative: only paths
# that look like committed evidence files, not shell globs or prose.
PATH_RE = re.compile(
    r"(?:results/[\w.\-/{},*]+|BENCH_r\d+\.json|BENCH_STREAM_r\d+\.json|"
    r"MULTICHIP_r\d+\.json)")


def expand_braces(path: str) -> list:
    """results/r4/{s0,s1}_sd{42,43}_x.txt -> the 4 concrete paths."""
    m = re.search(r"\{([^{}]*)\}", path)
    if not m:
        return [path]
    out = []
    for alt in m.group(1).split(","):
        out.extend(expand_braces(path[:m.start()] + alt + path[m.end():]))
    return out


def main() -> int:
    docs = list(DOCS)
    docs += sorted(n for n in os.listdir(REPO) if DOC_GLOBS.match(n))

    tracked = set(subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True).stdout.splitlines())

    failures = []
    checked = 0
    for doc in docs:
        full = os.path.join(REPO, doc)
        if not os.path.isfile(full):
            continue
        with open(full) as f:
            for ln, line in enumerate(f, 1):
                for raw in PATH_RE.findall(line):
                    raw = raw.rstrip(".,;:)")
                    for path in expand_braces(raw):
                        if path.endswith("/"):
                            # directory citation: at least one tracked file
                            checked += 1
                            if not any(t.startswith(path) for t in tracked):
                                failures.append(
                                    f"{doc}:{ln}: no tracked file under "
                                    f"cited directory {path!r}")
                            continue
                        if "*" in path:
                            # glob citation: require at least one tracked match
                            pat = re.compile(
                                "^" + re.escape(path).replace(r"\*", "[^/]*")
                                + "$")
                            checked += 1
                            if not any(pat.match(t) for t in tracked):
                                failures.append(
                                    f"{doc}:{ln}: no tracked file matches "
                                    f"glob {path!r}")
                            continue
                        checked += 1
                        if not os.path.exists(os.path.join(REPO, path)):
                            failures.append(
                                f"{doc}:{ln}: cited artifact {path!r} does "
                                "not exist")
                        elif path not in tracked:
                            failures.append(
                                f"{doc}:{ln}: cited artifact {path!r} exists "
                                "but is NOT tracked by git (commit it)")

    if failures:
        print(f"check_claims: {len(failures)} violation(s) "
              f"({checked} citations checked):")
        for f_ in failures:
            print("  " + f_)
        return 1
    print(f"check_claims: OK ({checked} citations across {len(docs)} docs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
