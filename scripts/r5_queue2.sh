#!/bin/bash
# Round-5 follow-up queue — run AFTER scripts/r5_queue.sh drains.
# Phases:
#   U  full-res filter sweep + blend on every 450x800 s2c run that exists
#      (sd43 from r4; sd44/45 from r5 Phase I). The original Phase S
#      full-res leg targeted runs/ns10_s2c (seed 42), which did not
#      survive the r4 round boundary — runs/ are gitignored and the
#      seed-42 full-res chain was never regenerated. VERDICT r4 #2's
#      full-res operating point comes from the surviving seeds.
#   K  trained-at-winner consistency check (VERDICT r4 #2 "then retrain
#      one arm at the winning point"): the 96x160 sweep found abs=4 the
#      best night cell at BOTH seeds at eval time; retrain the s2c arm
#      with --filter-mode abs --abs-threshold 4 at both seeds and eval.
#   W  serve-coalescing TPU re-bench after the warmup fix (serve.py now
#      warms the full pow2 tile ladder; the Phase N run paid 3 in-band
#      ~40 s relay compiles inside its 64-request window — kept as
#      results/r5/serve_concurrency_tpu.txt for the before/after).
# Usage: bash scripts/r5_queue2.sh [PHASES]   (default UKW)
set -u
cd /root/repo
mkdir -p results/r5 runs data
R=results/r5
PHASES=${1:-UKW}
want () { case "$PHASES" in *$1*) return 0;; *) return 1;; esac; }

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
    cmd+=(--resume "runs/$tag" --output-dir "runs/$tag")
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

evm () { # evm <prefix> <rundir> <dataroot>
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

# ---------- Phase U: full-res sweep + blend on surviving 450x800 runs -----
if want U; then (
for tag in ns10_sd43 ns10_sd44 ns10_sd45; do
  rdir=runs/${tag}_s2c
  if [ ! -f "$rdir/config.json" ]; then
    echo "[U] $rdir absent, skipping"; continue
  fi
  if [ ! -s "$R/filter_sweep_${tag}.txt" ]; then
    echo "[sweep] $rdir (450x800) $(date +%H:%M:%S)"
    timeout 10800 python scripts/r5_filter_sweep.py --run "$rdir" \
        --data-root data/synth_ns10 --out "$R/filter_sweep_${tag}.txt" \
        > "runs/r5_sweep_${tag}.log" 2>&1 || {
      echo "[sweep] FAILED $tag"; tail -5 "runs/r5_sweep_${tag}.log"; exit 13; }
  fi
  if [ ! -s "$R/blend_${tag}.txt" ]; then
    echo "[blend] $rdir (450x800) $(date +%H:%M:%S)"
    timeout 3600 python scripts/r5_blend.py --run "$rdir" \
        --data-root data/synth_ns10 --out "$R/blend_${tag}.txt" \
        > "runs/r5_blend_${tag}.log" 2>&1 || {
      echo "[blend] FAILED $tag"; tail -5 "runs/r5_blend_${tag}.log"; exit 13; }
  fi
done
echo "PHASE_U_DONE $(date +%H:%M:%S)"
) || echo "PHASE_U_FAILED rc=$?"; fi

# ---------- Phase K: retrain 96x160 s2c at the sweep winner (abs=4) -------
if want K; then (
for seed in 42 43; do
  t=s1_sd${seed}_a4
  run ${t} 14 7200 --arch resnet18_multistage --decoder upproj \
      --stage1-path runs/s1_sd${seed}_lf --dataset packed \
      --data-root data/synth_s1_small --height 96 --width 160 \
      --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
      --filter-mode abs --abs-threshold 4 --stage2-coarse --workers 1 \
      --seed "$seed" --output-dir runs/${t}
  evm "$t" "runs/${t}" data/synth_s1_small
done
echo "PHASE_K_DONE $(date +%H:%M:%S)"
) || echo "PHASE_K_FAILED rc=$?"; fi
# ---------- Phase W: serve TPU re-bench with full-ladder warmup -----------
if want W; then (
if [ ! -s "$R/serve_concurrency_tpu_warm.txt" ]; then
  echo "[serve] TPU concurrency re-bench (warm tile ladder) $(date +%H:%M:%S)"
  timeout 7200 python scripts/bench_serve_concurrency.py \
      --height 96 --width 160 --sweeps 3 --clients 8 --requests 64 \
      > "$R/serve_concurrency_tpu_warm.txt" 2> runs/r5_serve_warm.log || {
    echo "[serve] FAILED"; tail -5 runs/r5_serve_warm.log;
    rm -f "$R/serve_concurrency_tpu_warm.txt"; }
  cat "$R/serve_concurrency_tpu_warm.txt" 2>/dev/null
fi
echo "PHASE_W_DONE $(date +%H:%M:%S)"
) || echo "PHASE_W_FAILED rc=$?"; fi
echo "QUEUE2_DONE $(date +%H:%M:%S)"
