#!/bin/bash
# Round-4 Phase H — plain-multistage arms at SEVERITY 0 (2 seeds), the
# mirror of Phase E (which ran them at severity 1.0). Together they give the
# s2c-vs-plain contrast at both ends of the severity axis with seed spread:
# r3's "s2c beats plain on every metric" claim was made at sev-0 / 1 seed.
# Reuses Phase B's sev-0 shards and stage-1 runs (runs/s0_sd{42,43}_lf);
# regenerates them if absent. Restart-safe.
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4

if [ ! -d data/synth_s0_small/train ]; then
  python scripts/generate_dataset.py --out data/synth_s0_small \
      --num-train 256 --num-val 128 --height 96 --width 160 --sweeps 3 \
      --seed 0 --night-severity 0.0 --val-night-frac 0.5 || exit 10
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
  lf=runs/s0_sd${seed}_lf
  run s0_sd${seed}_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
      --dataset packed --data-root data/synth_s0_small --height 96 \
      --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
      --lr-decay-epochs 8 --workers 1 --seed "$seed" --output-dir "$lf"
  t=s0_sd${seed}_ms
  run "$t" 14 7200 --arch resnet18_multistage --decoder upproj \
      --stage1-path "$lf" --dataset packed --data-root data/synth_s0_small \
      --height 96 --width 160 --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 \
      --lr-decay-epochs 8 --filter-mode rel --workers 1 --seed "$seed" \
      --output-dir "runs/$t"
  if [ -s "$R/${t}_eval_all.txt" ] && [ -s "$R/${t}_eval_night.txt" ] && \
     [ -s "$R/${t}_eval_day.txt" ]; then
    echo "[eval] ${t} outputs exist, skipping"
  else
    echo "[eval] ${t} (all,night,day) $(date +%H:%M:%S)"
    timeout 3600 python scripts/eval_two_stage.py --run "runs/$t" \
        --data-root data/synth_s0_small --split all,night,day \
        --out-prefix "$R/${t}_eval_" > "runs/${t}_eval.log" 2>&1 || {
      echo "[eval] FAILED: $t"; tail -5 "runs/${t}_eval.log"; exit 12; }
    echo "[eval] ${t} done $(date +%H:%M:%S)"
  fi
done
echo "PHASE_H_DONE $(date +%H:%M:%S)"
