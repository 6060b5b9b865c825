#!/bin/bash
# Round-4 Phase E — put a second seed (and a powered night split) under the
# one remaining single-seed claim: "--stage2-coarse beats plain multistage"
# (r3, 96x160, 1 seed). Reuses Phase B's sev-1.0 shards and stage-1 runs
# (runs/s1_sd{42,43}_lf): train PLAIN multistage (no --stage2-coarse) with
# the otherwise-identical recipe, then eval all/night/day. Comparing
# refined rows vs the existing s1_sd*_s2c evals isolates the D1-feed.
# Self-contained: regenerates shards and stage-1 if absent (fresh checkout).
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4

if [ ! -d data/synth_s1_small/train ]; then
  python scripts/generate_dataset.py --out data/synth_s1_small \
      --num-train 256 --num-val 128 --height 96 --width 160 --sweeps 3 \
      --seed 0 --night-severity 1.0 --val-night-frac 0.5 || exit 10
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

for seed in 42 43; do
  lf=runs/s1_sd${seed}_lf
  run s1_sd${seed}_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
      --dataset packed --data-root data/synth_s1_small --height 96 \
      --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
      --lr-decay-epochs 8 --workers 1 --seed "$seed" --output-dir "$lf"
  t=s1_sd${seed}_ms
  run "$t" 14 7200 --arch resnet18_multistage --decoder upproj \
      --stage1-path "$lf" --dataset packed --data-root data/synth_s1_small \
      --height 96 --width 160 --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 \
      --lr-decay-epochs 8 --filter-mode rel --workers 1 --seed "$seed" \
      --output-dir "runs/$t"
  if [ -s "$R/${t}_eval_all.txt" ] && [ -s "$R/${t}_eval_night.txt" ] && \
     [ -s "$R/${t}_eval_day.txt" ]; then
    echo "[eval] ${t} outputs exist, skipping"
  else
    echo "[eval] ${t} (all,night,day) $(date +%H:%M:%S)"
    timeout 3600 python scripts/eval_two_stage.py --run "runs/$t" \
        --data-root data/synth_s1_small --split all,night,day \
        --out-prefix "$R/${t}_eval_" > "runs/${t}_eval.log" 2>&1 || {
      echo "[eval] FAILED: $t"; tail -5 "runs/${t}_eval.log"; exit 12; }
    echo "[eval] ${t} done $(date +%H:%M:%S)"
  fi
done
echo "PHASE_E_DONE $(date +%H:%M:%S)"
