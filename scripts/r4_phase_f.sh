#!/bin/bash
# Round-4 Phase F — second SEED under the full-resolution headline result.
# Phase A (450x800 sev-1.0, seed 42, n_night=64) found: night RMSE tie,
# refined wins night MAE/absrel/d1. This replicates the identical chain at
# seed 43 so the full-res conclusion carries a seed spread like the 96x160
# Phase B one does. Shards are regenerated if absent (data/ is gitignored);
# restart-safe like r4_queue_v3.sh.
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4

if [ ! -d data/synth_ns10/train ] || [ ! -d data/synth_ns10/val ]; then
  echo "[gen] data/synth_ns10 $(date +%H:%M:%S)"
  python scripts/generate_dataset.py --out data/synth_ns10 --num-train 512 \
      --num-val 128 --height 450 --width 800 --sweeps 5 --seed 0 \
      --night-severity 1.0 --val-night-frac 0.5 || exit 10
fi

run () { # run <tag> <epochs> <timeout_s> <args...>
  local tag=$1 eps=$2 tmo=$3; shift 3
  if [ -f "runs/$tag/test.csv" ] && \
     [ "$(tail -n +2 "runs/$tag/test.csv" | wc -l)" -ge "$eps" ]; then
    echo "[run $tag] already complete ($eps epochs), skipping"; return 0
  fi
  local cmd=(python -m radar_depth_tpu.train.main --ckpt-every 4)
  if [ -d "runs/$tag/checkpoints" ] && \
     [ -n "$(ls -A "runs/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "[run $tag] resuming $(date +%H:%M:%S)"
    cmd+=(--resume "runs/$tag")
  else
    echo "[run $tag] $(date +%H:%M:%S) $*"
    cmd+=("$@")
  fi
  timeout "$tmo" "${cmd[@]}" >> "runs/${tag}.log" 2>&1 || {
    echo "[run $tag] FAILED — tail:"; tail -5 "runs/${tag}.log"; exit 11; }
  echo "[run $tag] done $(date +%H:%M:%S)"
}

run ns10_sd43_lf 20 14400 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_ns10 -b 32 --epochs 20 \
    --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 --seed 43 \
    --output-dir runs/ns10_sd43_lf
run ns10_sd43_s2c 14 14400 --arch resnet18_multistage --decoder upproj \
    --stage1-path runs/ns10_sd43_lf --dataset packed \
    --data-root data/synth_ns10 -b 32 --epochs 14 --lr 0.002 \
    --lr-decay-epochs 8 --filter-mode rel --stage2-coarse --dtype bfloat16 \
    --workers 2 --seed 43 --output-dir runs/ns10_sd43_s2c

if [ -s "$R/ns10_sd43_eval_all.txt" ] && [ -s "$R/ns10_sd43_eval_night.txt" ] \
   && [ -s "$R/ns10_sd43_eval_day.txt" ]; then
  echo "[eval] ns10_sd43 outputs exist, skipping"
else
  echo "[eval] ns10_sd43 (all,night,day) $(date +%H:%M:%S)"
  timeout 7200 python scripts/eval_two_stage.py --run runs/ns10_sd43_s2c \
      --data-root data/synth_ns10 --split all,night,day \
      --out-prefix "$R/ns10_sd43_eval_" > runs/ns10_sd43_eval.log 2>&1 || {
    echo "[eval] FAILED"; tail -5 runs/ns10_sd43_eval.log; exit 12; }
fi
echo "PHASE_F_DONE $(date +%H:%M:%S)"
