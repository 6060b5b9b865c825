#!/bin/bash
# Round-5 RESTART queue — the host rebooted mid-round, wiping the
# gitignored runs/ and data/ (checkpoints, shards, XLA cache). Everything
# already COMMITTED to results/ stays authoritative; this queue regenerates
# only what the remaining r5 phases still need, in priority order:
#   G  regenerate datasets (synth_s1_small, synth_s0_small, synth_ns10)
#   W  serve TPU re-bench with the fixed full-ladder warmup (quiet host,
#      so it runs before any training contention)
#   K  96x160 trained-at-abs4 consistency arms, seeds 42+43
#      (regenerates the s1_sd{42,43}_lf stage-1 runs first)
#   I  full-res crossing: train sd45 fresh (the missing 4th seed —
#      VERDICT #1, highest value) then retrain sd44 (run dir lost;
#      committed evals stay the reference — a determinism cross-check
#      re-evals the retrained model and diffs against the committed file)
#   U  full-res filter sweep + blend on the (re)trained 450x800 s2c runs
#   J  96x160 severity chains, seeds 44+45 x sev {0,1} (VERDICT #8 —
#      lowest-priority remaining evidence, so it runs last)
#   T  stream bench artifact + claims-vs-artifacts check
# Usage: bash scripts/r5_queue3.sh [PHASES]   (default GWKIUJT)
set -u
cd /root/repo
mkdir -p results/r5 runs data
R=results/r5
PHASES=${1:-GWKIUJT}
want () { case "$PHASES" in *$1*) return 0;; *) return 1;; esac; }

gen () { # gen <out> <args...>
  local out=$1; shift
  if [ -d "$out/train" ] && [ -d "$out/val" ]; then
    echo "[gen] $out exists, skipping"; return 0
  fi
  echo "[gen] $out $(date +%H:%M:%S): $*"
  python scripts/generate_dataset.py --out "$out" "$@" || exit 10
}

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

# ---------- Phase G: regenerate the wiped datasets ------------------------
if want G; then (
gen data/synth_s1_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 1.0 --val-night-frac 0.5
gen data/synth_s0_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 0.0 --val-night-frac 0.5
gen data/synth_ns10 --num-train 512 --num-val 128 --height 450 --width 800 \
    --sweeps 5 --seed 0 --night-severity 1.0 --val-night-frac 0.5
echo "PHASE_G_DONE $(date +%H:%M:%S)"
) || echo "PHASE_G_FAILED rc=$?"; fi

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

# ---------- Phase K: trained-at-abs4 arms (regenerates stage-1) -----------
if want K; then (
for seed in 42 43; do
  run s1_sd${seed}_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
      --dataset packed --data-root data/synth_s1_small --height 96 \
      --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
      --lr-decay-epochs 8 --workers 1 --seed "$seed" \
      --output-dir runs/s1_sd${seed}_lf
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

# ---------- Phase I: full-res crossing, seed 45 (fresh) + 44 (retrain) ----
if want I; then (
for seed in 45 44; do
  t=ns10_sd${seed}
  run ${t}_lf 20 10800 --arch resnet18_latefusion --decoder upproj \
      --dataset packed --data-root data/synth_ns10 -b 32 --epochs 20 \
      --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 \
      --seed "$seed" --output-dir runs/${t}_lf
  run ${t}_s2c 14 10800 --arch resnet18_multistage --decoder upproj \
      --stage1-path runs/${t}_lf --dataset packed --data-root data/synth_ns10 \
      -b 32 --epochs 14 --lr 0.002 --lr-decay-epochs 8 --filter-mode rel \
      --stage2-coarse --dtype bfloat16 --workers 2 --seed "$seed" \
      --output-dir runs/${t}_s2c
  evm "$t" "runs/${t}_s2c" data/synth_ns10
done
# Determinism cross-check: the sd44 evals were committed before the host
# reboot; the retrained sd44 chain (same seed, same generated data, same
# recipe) must reproduce them bit-for-bit.
if [ ! -s "$R/ns10_sd44_determinism.txt" ] && \
   [ -f runs/ns10_sd44_s2c/config.json ]; then
  echo "[determinism] re-eval retrained sd44 vs committed $(date +%H:%M:%S)"
  timeout 3600 python scripts/eval_two_stage.py --run runs/ns10_sd44_s2c \
      --data-root data/synth_ns10 --split night \
      --out-prefix /tmp/sd44_recheck_ > runs/sd44_recheck.log 2>&1 || true
  if [ -f /tmp/sd44_recheck_eval_night.txt ]; then
    if diff -q /tmp/sd44_recheck_eval_night.txt \
         "$R/ns10_sd44_eval_night.txt" > /dev/null 2>&1; then
      echo "DETERMINISM_OK: retrained ns10_sd44_s2c reproduces the committed night eval bit-for-bit after a host reboot + dataset regeneration" \
        > "$R/ns10_sd44_determinism.txt"
    else
      { echo "DETERMINISM_MISMATCH: retrained sd44 differs from committed"; \
        diff /tmp/sd44_recheck_eval_night.txt \
          "$R/ns10_sd44_eval_night.txt" | head -20; } \
        > "$R/ns10_sd44_determinism.txt"
    fi
    cat "$R/ns10_sd44_determinism.txt"
  fi
fi
echo "PHASE_I_DONE $(date +%H:%M:%S)"
) || echo "PHASE_I_FAILED rc=$?"; fi

# ---------- Phase U: full-res sweep + blend on (re)trained runs -----------
if want U; then (
for tag in ns10_sd44 ns10_sd45; do
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

# ---------- Phase J: 96x160 severity chains, seeds 44+45 ------------------
if want J; then (
for sev in 1 0; do
  for seed in 44 45; do
    t=s${sev}_sd${seed}
    run ${t}_lf 20 7200 --arch resnet18_latefusion --decoder upproj \
        --dataset packed --data-root data/synth_s${sev}_small --height 96 \
        --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
        --lr-decay-epochs 8 --workers 1 --seed "$seed" \
        --output-dir runs/${t}_lf
    run ${t}_s2c 14 7200 --arch resnet18_multistage --decoder upproj \
        --stage1-path runs/${t}_lf --dataset packed \
        --data-root data/synth_s${sev}_small --height 96 --width 160 \
        --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
        --filter-mode rel --stage2-coarse --workers 1 --seed "$seed" \
        --output-dir runs/${t}_s2c
    evm "$t" "runs/${t}_s2c" "data/synth_s${sev}_small"
  done
done
echo "PHASE_J_DONE $(date +%H:%M:%S)"
) || echo "PHASE_J_FAILED rc=$?"; fi

# ---------- Phase T: stream bench + claims check --------------------------
if want T; then
python scripts/record_stream_bench.py --round 5 || true
python scripts/check_claims.py || echo "CLAIMS_CHECK_FAILED"
echo "PHASE_T_DONE $(date +%H:%M:%S)"
fi
echo "QUEUE3_DONE $(date +%H:%M:%S)"
