#!/bin/bash
# Round-4 queue v2 — same experiments as r4_queue.sh phases B/C/D, retooled
# after measuring the v1 schedule on this relay host:
#   - restart-safe: a run whose test.csv already holds all its epochs is
#     skipped; a partial run dir with checkpoints is --resume'd (exact
#     continuation, config adopted from the run dir)
#   - evals run all three splits IN ONE PROCESS (eval_two_stage
#     --split all,night,day): the jitted coarse+refined graphs compile once
#     instead of three times (~3x faster per chain on this relay, where a
#     compile costs minutes)
#   - phase order B -> D -> C: error bars (VERDICT #2) and the matched-update
#     control (#3a) outrank the sev-0.5 midpoint (#3b) if the round's wall
#     clock runs out
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4
PHASES=${1:-BDC}
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

# ---------- Phase D: matched-UPDATE grad-accum control (VERDICT #3a) ------
# Both arms on the SAME fresh shards: standard B=32 20ep (160 updates on a
# 256-sample split at 8 steps/ep) vs accum 4xB=32 80ep (2 updates/ep x 80 =
# 160 updates), lr 0.02 decay@32 per the r3 recipe.
if want D; then
gen data/synth_std --num-train 256 --num-val 64 --height 450 --width 800 \
    --sweeps 5 --seed 0 --night-severity 0.0
run std_b32 20 14400 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_std -b 32 --epochs 20 \
    --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 --seed 42 \
    --output-dir runs/std_b32
run std_ga4 80 21600 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_std -b 32 --grad-accum 4 \
    --epochs 80 --lr 0.02 --lr-decay-epochs 32 --dtype bfloat16 --workers 2 \
    --seed 42 --output-dir runs/std_ga4
cat runs/std_b32/best.txt runs/std_ga4/best.txt > "$R/ga4_control.txt" \
    2>/dev/null || true
echo "PHASE_D_DONE $(date +%H:%M:%S)"
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
echo QUEUE_DONE
