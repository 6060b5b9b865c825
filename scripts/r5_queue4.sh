#!/bin/bash
# Round-5 queue, stage 4 — restructured from r5_queue3.sh so that the
# full-res filter sweep + blend (old Phase U) run PER SEED immediately
# after that seed's chain finishes, instead of being gated behind the
# sd44 determinism retrain. Priority order with the remaining TPU hours:
#   K    96x160 trained-at-abs4 consistency arm, seed 43 (42 landed)
#   I45  full-res chain seed 45 (the missing 4th crossing seed) + eval
#        + filter sweep + blend
#   I44  full-res sd44 retrain (run dir lost to the host reboot) +
#        determinism cross-check vs the committed evals + sweep + blend
#   J    96x160 severity chains, seeds 44+45 x sev {0,1} (lowest value)
#   T    stream bench artifact + claims-vs-artifacts check
# Every step skips work whose outputs already exist, so this queue can be
# killed and relaunched at any point (the r4/r5 wedge lesson).
# Usage: bash scripts/r5_queue4.sh [PHASES]   (default KIUJT; 'I' covers
# I45+I44, 'U' enables the per-seed sweep+blend steps)
set -u
cd /root/repo
mkdir -p results/r5 runs data
R=results/r5
PHASES=${1:-KIUJT}
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

sweepblend () { # sweepblend <tag> — full-res filter sweep + blend on runs/<tag>_s2c
  local tag=$1 rdir=runs/${1}_s2c
  if [ ! -f "$rdir/config.json" ]; then
    echo "[sweepblend] $rdir absent, skipping"; return 0
  fi
  if [ ! -s "$R/filter_sweep_${tag}.txt" ]; then
    echo "[sweep] $rdir (450x800) $(date +%H:%M:%S)"
    timeout 10800 python scripts/r5_filter_sweep.py --run "$rdir" \
        --data-root data/synth_ns10 --out "$R/filter_sweep_${tag}.txt" \
        > "runs/r5_sweep_${tag}.log" 2>&1 || {
      echo "[sweep] FAILED $tag"; tail -5 "runs/r5_sweep_${tag}.log"; return 0; }
    echo "[sweep] $tag done $(date +%H:%M:%S)"
  fi
  if [ ! -s "$R/blend_${tag}.txt" ]; then
    echo "[blend] $rdir (450x800) $(date +%H:%M:%S)"
    timeout 3600 python scripts/r5_blend.py --run "$rdir" \
        --data-root data/synth_ns10 --out "$R/blend_${tag}.txt" \
        > "runs/r5_blend_${tag}.log" 2>&1 || {
      echo "[blend] FAILED $tag"; tail -5 "runs/r5_blend_${tag}.log"; return 0; }
    echo "[blend] $tag done $(date +%H:%M:%S)"
  fi
}

chain () { # chain <tag> — full-res lf(20) -> s2c(14) -> eval at 450x800
  local tag=$1 seed=$2
  run ${tag}_lf 20 10800 --arch resnet18_latefusion --decoder upproj \
      --dataset packed --data-root data/synth_ns10 -b 32 --epochs 20 \
      --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 \
      --seed "$seed" --output-dir runs/${tag}_lf
  run ${tag}_s2c 14 10800 --arch resnet18_multistage --decoder upproj \
      --stage1-path runs/${tag}_lf --dataset packed --data-root data/synth_ns10 \
      -b 32 --epochs 14 --lr 0.002 --lr-decay-epochs 8 --filter-mode rel \
      --stage2-coarse --dtype bfloat16 --workers 2 --seed "$seed" \
      --output-dir runs/${tag}_s2c
  evm "$tag" "runs/${tag}_s2c" data/synth_ns10
}

# Datasets must exist whatever phases run (cheap skips if present).
gen data/synth_s1_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 1.0 --val-night-frac 0.5
gen data/synth_s0_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 0.0 --val-night-frac 0.5
gen data/synth_ns10 --num-train 512 --num-val 128 --height 450 --width 800 \
    --sweeps 5 --seed 0 --night-severity 1.0 --val-night-frac 0.5

# ---------- Phase K: trained-at-abs4 arms (seed 42 landed; 43 remains) ----
if want K; then (
for seed in 42 43; do
  # The eval triplet is the phase's committed artifact; after a host reboot
  # wipes runs/, a seed whose triplet survives needs no retrain at all.
  if [ -s "$R/s1_sd${seed}_a4_eval_all.txt" ] && \
     [ -s "$R/s1_sd${seed}_a4_eval_night.txt" ] && \
     [ -s "$R/s1_sd${seed}_a4_eval_day.txt" ]; then
    echo "[K sd${seed}] a4 eval triplet already committed, skipping seed"
    continue
  fi
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

# ---------- Phase I45: full-res seed 45 chain + sweep + blend --------------
if want I; then (
chain ns10_sd45 45
want U && sweepblend ns10_sd45
echo "PHASE_I45_DONE $(date +%H:%M:%S)"
) || echo "PHASE_I45_FAILED rc=$?"; fi

# ---------- Phase I44: sd44 retrain + determinism check + sweep + blend ----
if want I; then (
chain ns10_sd44 44
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
want U && sweepblend ns10_sd44
echo "PHASE_I44_DONE $(date +%H:%M:%S)"
) || echo "PHASE_I44_FAILED rc=$?"; fi

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
echo "QUEUE4_DONE $(date +%H:%M:%S)"
