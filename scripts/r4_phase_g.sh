#!/bin/bash
# Round-4 Phase G — on-TPU evidence for the new ResNet-50 (Bottleneck)
# family: an inference-throughput row at the working resolution and a small
# training run (synthetic inline data) proving the train path end-to-end.
# Outputs land in tracked results/r4/.
set -u
cd /root/repo
mkdir -p results/r4 runs
R=results/r4

if [ ! -s "$R/resnet50_bench.json" ]; then
  for b in 32 16; do
    echo "[bench r50] B=$b $(date +%H:%M:%S)"
    if timeout 3600 python bench.py --arch resnet50_latefusion --batch "$b" \
        --iters 15 --warmup 3 > "$R/resnet50_bench.json" \
        2> runs/r50_bench.log; then
      break
    fi
    echo "[bench r50] B=$b failed (see runs/r50_bench.log tail):"
    tail -3 runs/r50_bench.log
    rm -f "$R/resnet50_bench.json"
  done
  cat "$R/resnet50_bench.json" 2>/dev/null || echo "[bench r50] no result"
fi

if [ ! -f runs/r50_smoke/test.csv ] || \
   [ "$(tail -n +2 runs/r50_smoke/test.csv | wc -l)" -lt 2 ]; then
  echo "[train r50] $(date +%H:%M:%S)"
  timeout 5400 python -m radar_depth_tpu.train.main \
      --arch resnet50_latefusion --decoder upproj --dataset synthetic \
      --num-train 24 --num-val 8 --height 96 --width 160 --num-sweeps 3 \
      -b 8 --epochs 2 --lr 0.01 --workers 0 --seed 42 \
      --output-dir runs/r50_smoke > runs/r50_smoke.log 2>&1 \
      || { echo "[train r50] FAILED"; tail -5 runs/r50_smoke.log; exit 12; }
  { echo "== resnet50_latefusion 2-epoch TPU smoke (96x160 synthetic) =="
    cat runs/r50_smoke/test.csv; } > "$R/resnet50_train_smoke.txt"
fi
echo "PHASE_G_DONE $(date +%H:%M:%S)"
