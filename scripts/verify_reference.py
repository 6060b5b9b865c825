"""Step-0 survey verification (SURVEY.md "Mandatory verification protocol").

Inventories /root/reference (or --ref DIR) and diffs it against SURVEY.md §2's
component expectations, flagging every [M]/[L]-confidence claim that the now-
readable reference can confirm or refute. Writes REFERENCE_AUDIT.md next to
SURVEY.md and prints a summary.

Run this FIRST in any session where the reference mount is populated:
  python scripts/verify_reference.py
Exit codes: 0 = mount populated, audit written; 2 = mount still empty.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SURVEY.md §2 inventory: files we expect (upstream: pointers) and the
# [M]/[L] claims each can settle. Patterns are regexes over file contents.
EXPECTED_FILES = {
    "main.py": "C1 CLI+harness (train/validate loops) [H]",
    "utils.py": "C2 parse_command, C10 save_checkpoint, C11 viz, C12 lr [H]",
    "criteria.py": "C8 MaskedMSELoss/MaskedL1Loss [H]",
    "metrics.py": "C9 Result/AverageMeter [H]",
    "dataloaders/dataloader.py": "C3 MyDataloader base [H]",
    "dataloaders/transforms.py": "C4 numpy/PIL transforms [H]",
    "dataloaders/dense_to_sparse.py": "C6 sparsifiers [H exists/M retained]",
    "models.py": "C7 model zoo (base) [H design/M layout]",
}

MEDIUM_LOW_CLAIMS = [
    # (claim id, what to grep, pattern, where our build encodes the guess)
    ("arch-registry", "the --arch registry names (resnet18_latefusion, "
     "*_multistage*, possibly *uncertainty*)",
     r"resnet\d+_\w+", "radar_depth_tpu/models/__init__.py ARCH_REGISTRY"),
    ("filter-rule", "two-stage radar filtering rule + threshold "
     "(abs |d-D1|<tau vs relative)",
     r"(thre|filter|abs\(|torch\.abs)", "models/fusion.py filter_mode/2.0m"),
    ("pickle-schema", "per-sample pickle schema keys",
     r"pickle\.(load|dump)", "scripts/import_reference_pickles.py KEY_CANDIDATES"),
    ("radar-raster", "radar raster representation (plain pixel vs vertical "
     "height extension)", r"(height|extend|vertical)",
     "ops/raster.py height_extension"),
    ("sweep-count", "multi-sweep accumulation count (nsweeps≈5)",
     r"nsweeps|n_sweeps|num_sweeps", "data/schema.py DEFAULT_NUM_SWEEPS=5"),
    ("split-def", "train/val split definition",
     r"(train_scenes|val_scenes|split)", "synthetic split sizes"),
    ("crop-res", "working resolution / crop (assumed 450×800 from 900×1600)",
     r"(450|800|900|1600|crop|resize)", "data/schema.py MODEL_HEIGHT/WIDTH"),
    ("loss-weighting", "multistage per-stage loss weighting",
     r"(loss.*\+.*loss|weight)", "objectives stage_weights=(1,1)"),
    ("lr-schedule", "step decay factor/interval (assumed ×0.1 every 5)",
     r"(adjust_learning_rate|lr)", "OptimConfig lr_decay_epochs=5"),
    ("metric-avg", "metric averaging convention (per-batch AverageMeter "
     "weighting vs per-sample)", r"AverageMeter|\.update\(",
     "metrics/__init__.py mean-of-means note"),
]


def inventory(ref: str):
    files = []
    for root, _, names in os.walk(ref):
        for n in names:
            p = os.path.join(root, n)
            files.append(os.path.relpath(p, ref))
    return sorted(files)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(REPO, "REFERENCE_AUDIT.md"))
    args = ap.parse_args()

    files = inventory(args.ref)
    if not files:
        print(f"reference mount {args.ref} is EMPTY — survey remains the "
              "blueprint of record (SURVEY.md provenance caveat).")
        return 2

    lines = ["# REFERENCE_AUDIT — Step-0 survey verification", "",
             f"Mount: `{args.ref}` — {len(files)} files.", "",
             "## File inventory vs SURVEY.md §2", ""]
    py_files = [f for f in files if f.endswith(".py")]
    for expect, what in EXPECTED_FILES.items():
        hits = [f for f in files if f == expect or f.endswith("/" + expect)
                or os.path.basename(f) == os.path.basename(expect)]
        mark = "FOUND" if hits else "**MISSING**"
        lines.append(f"- `{expect}` ({what}): {mark}"
                     + (f" → {hits[0]}" if hits else ""))
    extra = [f for f in py_files
             if not any(os.path.basename(f) == os.path.basename(e)
                        for e in EXPECTED_FILES)]
    lines += ["", f"Python files not in the survey inventory ({len(extra)}):"]
    lines += [f"- `{f}`" for f in extra[:50]]

    lines += ["", "## [M]/[L] claims to re-check (grep hits)", ""]
    corpus = {}
    for f in py_files:
        try:
            with open(os.path.join(args.ref, f), errors="replace") as fh:
                corpus[f] = fh.read()
        except OSError:
            pass
    for cid, what, pat, ours in MEDIUM_LOW_CLAIMS:
        hits = []
        for f, text in corpus.items():
            for m in re.finditer(pat, text):
                ln = text.count("\n", 0, m.start()) + 1
                hits.append(f"{f}:{ln}")
                if len(hits) >= 5:
                    break
            if len(hits) >= 5:
                break
        lines.append(f"### {cid}")
        lines.append(f"- claim: {what}")
        lines.append(f"- our encoding: `{ours}`")
        lines.append(f"- evidence to read: {', '.join(hits) or 'NO GREP HITS'}")
        lines.append("")

    lines += ["## Next actions", "",
              "1. Replace every `upstream:` citation in SURVEY.md with real "
              "file:line references.",
              "2. For each claim above, read the evidence lines and fix any "
              "divergence in the named module.",
              "3. Re-run the torch-oracle parity suite after any model-shape "
              "fix: `python -m pytest tests/test_parity_torch.py -m slow`.",
              "4. Convert real pickles: scripts/import_reference_pickles.py."]

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"audit written to {args.out}: {len(files)} files, "
          f"{sum('MISSING' in l for l in lines)} expected files missing")
    return 0


if __name__ == "__main__":
    sys.exit(main())
