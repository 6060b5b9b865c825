#!/bin/bash
# Round-5 experiment queue — serialized TPU work (ONE host core: never two
# compiling processes). Restart-safe: completed runs/evals/sweeps are
# skipped, partial training runs --resume. Phases (VERDICT r4 "Next round"):
#   S  filter-threshold sweep + brightness-blend eval on existing ckpts (#2,#6)
#   I  full-res (450x800) crossing chains, seeds 44+45 (#1)
#   J  96x160 severity chains, seeds 44+45 x sev {0,1.0} (#8)
#   M  ResNet-50 batch sweep + component profile (#5)
#   N  serve-coalescing benchmark on the real TPU (#7)
#   T  stream bench artifact + claims-vs-artifacts check (#4)
# Usage: bash scripts/r5_queue.sh [PHASES]   (default SMNIJT — quick wins
# first; each phase runs in a subshell so one failure skips to the next
# phase instead of aborting the queue)
set -u
cd /root/repo
mkdir -p results/r5 runs data
R=results/r5
PHASES=${1:-SMNIJT}
want () { case "$PHASES" in *$1*) return 0;; *) return 1;; esac; }

gen () { # gen <out> <args...>
  local out=$1; shift
  if [ -d "$out/train" ] && [ -d "$out/val" ]; then
    echo "[gen] $out exists, skipping"; return 0
  fi
  echo "[gen] $out: $*"
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

# ---------- Phase S: threshold sweep + blend on EXISTING checkpoints ------
if want S; then (
for seed in 42 43; do
  if [ ! -s "$R/filter_sweep_sd${seed}.txt" ]; then
    echo "[sweep] s1_sd${seed}_s2c $(date +%H:%M:%S)"
    timeout 7200 python scripts/r5_filter_sweep.py --run runs/s1_sd${seed}_s2c \
        --data-root data/synth_s1_small --out "$R/filter_sweep_sd${seed}.txt" \
        > runs/r5_sweep_sd${seed}.log 2>&1 || {
      echo "[sweep] FAILED sd${seed}"; tail -5 runs/r5_sweep_sd${seed}.log; exit 13; }
  fi
  if [ ! -s "$R/blend_sd${seed}.txt" ]; then
    echo "[blend] s1_sd${seed}_s2c $(date +%H:%M:%S)"
    timeout 3600 python scripts/r5_blend.py --run runs/s1_sd${seed}_s2c \
        --data-root data/synth_s1_small --out "$R/blend_sd${seed}.txt" \
        > runs/r5_blend_sd${seed}.log 2>&1 || {
      echo "[blend] FAILED sd${seed}"; tail -5 runs/r5_blend_sd${seed}.log; exit 13; }
  fi
done
# full-res operating points: the seed-42 450x800 model lives in
# runs/ns05_s2c (trained on synth_ns05_small; r4 evaluated it against the
# bigger synth_ns10 val set, n_night=64 — same protocol here), seed 43 in
# runs/ns10_sd43_s2c.
for pair in "ns10:runs/ns05_s2c" "ns10_sd43:runs/ns10_sd43_s2c"; do
  tag=${pair%%:*}; rdir=${pair#*:}
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
echo "PHASE_S_DONE $(date +%H:%M:%S)"
) || echo "PHASE_S_FAILED rc=$?"; fi

# ---------- Phase M: ResNet-50 batch sweep + profile (VERDICT #5) ---------
if want M; then (
if [ ! -s "$R/resnet50_bsweep.txt" ]; then
  : > "$R/resnet50_bsweep.tmp"
  for b in 16 32 64; do
    echo "[r50 bench] B=$b $(date +%H:%M:%S)"
    if timeout 3600 python bench.py --arch resnet50_latefusion --batch "$b" \
        --iters 15 --warmup 3 --repeat 3 >> "$R/resnet50_bsweep.tmp" \
        2>> runs/r5_r50_bsweep.log; then :; else
      echo "{\"batch\": $b, \"error\": \"failed\"}" >> "$R/resnet50_bsweep.tmp"
      tail -3 runs/r5_r50_bsweep.log
    fi
  done
  mv "$R/resnet50_bsweep.tmp" "$R/resnet50_bsweep.txt"
  cat "$R/resnet50_bsweep.txt"
fi
if [ ! -s "$R/resnet50_profile.txt" ]; then
  echo "[r50 profile] $(date +%H:%M:%S)"
  timeout 3600 python scripts/profile_components.py --arch resnet50_latefusion \
      --batch 32 > "$R/resnet50_profile.txt" 2> runs/r5_r50_profile.log || {
    echo "[r50 profile] FAILED"; tail -5 runs/r5_r50_profile.log;
    rm -f "$R/resnet50_profile.txt"; }
fi
echo "PHASE_M_DONE $(date +%H:%M:%S)"
) || echo "PHASE_M_FAILED rc=$?"; fi

# ---------- Phase N: serve coalescing on the real TPU (VERDICT #7) --------
if want N; then (
if [ ! -s "$R/serve_concurrency_tpu.txt" ]; then
  echo "[serve] TPU concurrency bench $(date +%H:%M:%S)"
  timeout 7200 python scripts/bench_serve_concurrency.py \
      --height 96 --width 160 --sweeps 3 --clients 8 --requests 64 \
      > "$R/serve_concurrency_tpu.txt" 2> runs/r5_serve.log || {
    echo "[serve] FAILED"; tail -5 runs/r5_serve.log;
    rm -f "$R/serve_concurrency_tpu.txt"; }
  cat "$R/serve_concurrency_tpu.txt" 2>/dev/null
fi
echo "PHASE_N_DONE $(date +%H:%M:%S)"
) || echo "PHASE_N_FAILED rc=$?"; fi

# ---------- Phase I: full-res crossing, seeds 44+45 (VERDICT #1) ----------
if want I; then (
for seed in 44 45; do
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
echo "PHASE_I_DONE $(date +%H:%M:%S)"
) || echo "PHASE_I_FAILED rc=$?"; fi

# ---------- Phase J: 96x160 severity chains, seeds 44+45 (VERDICT #8) -----
if want J; then (
for sev in 0 1; do
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
echo "QUEUE_DONE $(date +%H:%M:%S)"
