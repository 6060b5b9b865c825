#!/bin/bash
# Severity-0.5 midpoint of the night-severity x stage2-coarse ablation
# (96x160/3-sweep CPU tier, same recipe as the sev-0/sev-1 rows in NOTES.md):
# locates the crossing point between sev-0 (s2c wins MAE/absrel/d1 only)
# and sev-1 (s2c refined beats coarse on RMSE outright).
set -x
cd /root/repo
# (JAX_PLATFORMS is ignored by the axon plugin; --platform cpu below is the real switch)
D=data/synth_ns05_small
LF=runs/ns05_lf
MS=runs/ns05_s2c

nice -n 15 python -m radar_depth_tpu.train.main --arch resnet18_latefusion \
    --decoder upproj --dataset packed --data-root $D --height 96 --width 160 \
    --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 --lr-decay-epochs 8 \
    --workers 1 --platform cpu --output-dir $LF || exit 1

nice -n 15 python -m radar_depth_tpu.train.main --arch resnet18_multistage \
    --decoder upproj --stage1-path $LF --dataset packed --data-root $D \
    --height 96 --width 160 --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 \
    --lr-decay-epochs 8 --filter-mode rel --stage2-coarse \
    --workers 1 --platform cpu --output-dir $MS || exit 2

nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu > data/ns05_eval_all.txt 2>&1
nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu --split night > data/ns05_eval_night.txt 2>&1
nice -n 15 python scripts/eval_two_stage.py --run $MS --data-root $D --platform cpu --split day > data/ns05_eval_day.txt 2>&1
echo CHAIN_DONE
