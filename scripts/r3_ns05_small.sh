#!/bin/bash
# Severity-0.5 midpoint of the night-severity x stage2-coarse ablation
# (96x160/3-sweep CPU tier, same recipe as the sev-0/sev-1 rows in NOTES.md):
# locates the crossing point between sev-0 (s2c wins MAE/absrel/d1 only)
# and sev-1 (s2c refined beats coarse on RMSE outright).
# SUPERSEDED by scripts/r4_queue.sh Phase C (round 4; runs on TPU with a
# powered night val split). Kept runnable: exact generation command included
# (ADVICE r3 #1); evals write to tracked results/ with loud failures
# (ADVICE r3 #2).
set -x
cd /root/repo
# (JAX_PLATFORMS is ignored by the axon plugin; --platform cpu below is the real switch)
D=data/synth_ns05_small
LF=runs/ns05_lf
MS=runs/ns05_s2c
mkdir -p results
if [ ! -d "$D/train" ]; then
  python scripts/generate_dataset.py --out $D --num-train 256 --num-val 32 \
      --height 96 --width 160 --sweeps 3 --seed 0 --night-severity 0.5 \
      || exit 3
fi

nice -n 15 python -m radar_depth_tpu.train.main --arch resnet18_latefusion \
    --decoder upproj --dataset packed --data-root $D --height 96 --width 160 \
    --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 --lr-decay-epochs 8 \
    --workers 1 --platform cpu --output-dir $LF || exit 1

nice -n 15 python -m radar_depth_tpu.train.main --arch resnet18_multistage \
    --decoder upproj --stage1-path $LF --dataset packed --data-root $D \
    --height 96 --width 160 --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 \
    --lr-decay-epochs 8 --filter-mode rel --stage2-coarse \
    --workers 1 --platform cpu --output-dir $MS || exit 2

nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu > results/ns05_eval_all.txt 2>&1 || exit 3
nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu --split night > results/ns05_eval_night.txt 2>&1 || exit 3
nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu --split day > results/ns05_eval_day.txt 2>&1 || exit 3
echo CHAIN_DONE
