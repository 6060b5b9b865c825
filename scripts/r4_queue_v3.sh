#!/bin/bash
# Round-4 queue v3 — v2 rescheduled after the 06:18 session boundary killed
# v2 mid-Phase-B. Changes vs v2:
#   - phase order B -> C -> D: with ~7h of round left, the full-res Phase D
#     (450x800: ~5-7h for the standard arm alone, 4x that for the ga4 arm)
#     cannot complete; C (96x160, ~1.2h) can. D is last so a timeout cut
#     loses only its tail.
#   - Phase D re-sized to 96x160 on the EXISTING synth_s0_small shards: the
#     matched-UPDATE question (did step starvation, not large-batch
#     dynamics, cause the matched-epoch gap?) is about optimizer updates,
#     not resolution. The 450x800 partial evidence (r3: ga4 best 3.0658 @
#     ep36 vs standard 3.2013) stays in NOTES.md; this completes the
#     control at a scale that fits the clock. 160 updates per arm:
#     standard B=32 x 8 steps/ep x 20 ep vs ga4 2 updates/ep x 80 ep.
# Carried from v2: restart-safe runs (complete test.csv -> skip; partial
# checkpoints -> --resume), one-process multi-split evals, --ckpt-every 4.
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4
PHASES=${1:-BCD}
want () { case "$PHASES" in *$1*) return 0;; *) return 1;; esac; }

gen () { # gen <out> <args...>
  local out=$1; shift
  if [ -d "$out/train" ] && [ -d "$out/val" ]; then
    echo "[gen] $out exists, skipping"; return 0
  fi
  echo "[gen] $out: $*"
  python scripts/generate_dataset.py --out "$out" "$@" || exit 10
}

run () { # run <tag> <epochs> <timeout_s> <args...>
  local tag=$1 eps=$2 tmo=$3; shift 3
  if [ -f "runs/$tag/test.csv" ] && \
     [ "$(tail -n +2 "runs/$tag/test.csv" | wc -l)" -ge "$eps" ]; then
    echo "[run $tag] already complete ($eps epochs), skipping"; return 0
  fi
  # --ckpt-every 4: the per-epoch device→host state fetch costs 23-28s on
  # the relay vs ~9s of actual training (measured, NOTES.md r4); best
  # improvements and the final epoch still always save, so --stage1-path
  # grafts and the final eval see the exact best checkpoint.
  local cmd=(python -m radar_depth_tpu.train.main --ckpt-every 4)
  if [ -d "runs/$tag/checkpoints" ] && \
     [ -n "$(ls -A "runs/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "[run $tag] resuming $(date +%H:%M:%S)"
    cmd+=(--resume "runs/$tag")
  else
    echo "[run $tag] $(date +%H:%M:%S) $*"
    cmd+=("$@")
  fi
  timeout "$tmo" "${cmd[@]}" >> "runs/${tag}.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[run $tag] FAILED rc=$rc — tail:"; tail -5 "runs/${tag}.log"
    exit 11
  fi
  echo "[run $tag] done $(date +%H:%M:%S)"
}

evm () { # evm <prefix> <rundir> <dataroot> — all/night/day in one process
  if [ -s "$R/${1}_eval_all.txt" ] && [ -s "$R/${1}_eval_night.txt" ] && \
     [ -s "$R/${1}_eval_day.txt" ]; then
    echo "[eval] ${1} outputs exist, skipping"; return 0
  fi
  echo "[eval] ${1} (all,night,day) $(date +%H:%M:%S)"
  timeout 3600 python scripts/eval_two_stage.py --run "$2" --data-root "$3" \
      --split all,night,day --out-prefix "$R/${1}_eval_" \
      > "runs/${1}_eval.log" 2>&1 || {
    echo "[eval] FAILED: $1"; tail -5 "runs/${1}_eval.log"; exit 12; }
  echo "[eval] ${1} done $(date +%H:%M:%S)"
}

# ---------- Phase B: seed x severity error bars at 96x160 (VERDICT #2) ----
if want B; then
for sev in 0.0 1.0; do
  sv=${sev%%.*}
  gen data/synth_s${sv}_small --num-train 256 --num-val 128 --height 96 \
      --width 160 --sweeps 3 --seed 0 --night-severity "$sev" \
      --val-night-frac 0.5
  for seed in 42 43; do
    t=s${sv}_sd${seed}
    run ${t}_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
        --dataset packed --data-root data/synth_s${sv}_small --height 96 \
        --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
        --lr-decay-epochs 8 --workers 1 --seed "$seed" \
        --output-dir runs/${t}_lf
    run ${t}_s2c 14 7200 --arch resnet18_multistage --decoder upproj \
        --stage1-path runs/${t}_lf --dataset packed \
        --data-root data/synth_s${sv}_small --height 96 --width 160 \
        --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
        --filter-mode rel --stage2-coarse --workers 1 --seed "$seed" \
        --output-dir runs/${t}_s2c
    evm "$t" "runs/${t}_s2c" "data/synth_s${sv}_small"
  done
done
echo "PHASE_B_DONE $(date +%H:%M:%S)"
fi

# ---------- Phase C: sev-0.5 midpoint (VERDICT #3b) -----------------------
if want C; then
gen data/synth_ns05_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 0.5 --val-night-frac 0.5
run ns05_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_ns05_small --height 96 \
    --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
    --lr-decay-epochs 8 --workers 1 --seed 42 --output-dir runs/ns05_lf
run ns05_s2c 14 7200 --arch resnet18_multistage --decoder upproj \
    --stage1-path runs/ns05_lf --dataset packed \
    --data-root data/synth_ns05_small --height 96 --width 160 \
    --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
    --filter-mode rel --stage2-coarse --workers 1 --seed 42 \
    --output-dir runs/ns05_s2c
evm ns05 runs/ns05_s2c data/synth_ns05_small
echo "PHASE_C_DONE $(date +%H:%M:%S)"
fi

# ---------- Phase D: matched-UPDATE grad-accum control (VERDICT #3a) ------
# Both arms on the SAME shards (synth_s0_small from Phase B), 160 optimizer
# updates each: standard B=32 20 ep (8 steps/ep) vs accum 4xB=32 80 ep
# (2 updates/ep), lr 0.02 decay@32 per the r3 matched-update recipe. The
# r3 recipe ran at 450x800 (partial: ga4 3.0658 @ ep36 beat standard
# 3.2013); this completes the control at 96x160 where 80 epochs fit the
# round's remaining wall clock.
if want D; then
gen data/synth_s0_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 0.0 --val-night-frac 0.5
run std96_b32 20 7200 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_s0_small --height 96 \
    --width 160 --num-sweeps 3 -b 32 --epochs 20 --lr 0.01 \
    --lr-decay-epochs 8 --workers 1 --seed 42 --output-dir runs/std96_b32
run std96_ga4 80 12600 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_s0_small --height 96 \
    --width 160 --num-sweeps 3 -b 32 --grad-accum 4 --epochs 80 --lr 0.02 \
    --lr-decay-epochs 32 --workers 1 --seed 42 --output-dir runs/std96_ga4
{ echo "== std96_b32 (B=32, 20ep, 160 updates) =="; cat runs/std96_b32/best.txt;
  echo "== std96_ga4 (4xB=32, 80ep, 160 updates) =="; cat runs/std96_ga4/best.txt;
} > "$R/ga4_control96.txt" 2>/dev/null || true
echo "PHASE_D_DONE $(date +%H:%M:%S)"
fi
echo QUEUE_DONE
