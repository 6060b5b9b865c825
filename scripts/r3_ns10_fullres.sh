#!/bin/bash
# Round-3 queued decisive experiment (ROUND3.md "THE CROSSING" full-res
# confirmation): stage2-coarse x night-severity 1.0 at 450x800 on TPU.
# Shards: data/synth_ns10 (generated this session, seed default).
# SUPERSEDED by scripts/r4_queue.sh Phase A (round 4), which also powers the
# night val split (num-val 128 @ night-frac 0.5). Kept runnable: the exact
# r3 generation command is now included below (ADVICE r3 #1) and evals write
# to the tracked results/ dir with loud failures (ADVICE r3 #2).
set -x
cd /root/repo
D=data/synth_ns10
LF=runs/ns10_lf
MS=runs/ns10_s2c
mkdir -p results
if [ ! -d "$D/train" ]; then
  python scripts/generate_dataset.py --out $D --num-train 512 --num-val 128 \
      --height 450 --width 800 --sweeps 5 --seed 0 --night-severity 1.0 \
      || exit 3
fi

python -m radar_depth_tpu.train.main --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root $D -b 32 --epochs 20 --lr 0.01 \
    --lr-decay-epochs 8 --dtype bfloat16 --workers 2 \
    --output-dir $LF || exit 1

python -m radar_depth_tpu.train.main --arch resnet18_multistage --decoder upproj \
    --stage1-path $LF --dataset packed --data-root $D -b 32 --epochs 14 \
    --lr 0.002 --lr-decay-epochs 8 --filter-mode rel --stage2-coarse \
    --dtype bfloat16 --workers 2 --output-dir $MS || exit 2

python scripts/eval_two_stage.py --run $MS --data-root $D > results/ns10_eval_all.txt 2>&1 || exit 3
python scripts/eval_two_stage.py --run $MS --data-root $D --split night > results/ns10_eval_night.txt 2>&1 || exit 3
python scripts/eval_two_stage.py --run $MS --data-root $D --split day > results/ns10_eval_day.txt 2>&1 || exit 3
echo CHAIN_DONE
