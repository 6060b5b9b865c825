#!/bin/bash
# Round-4 experiment queue (VERDICT r3 "Next round" #1-#3, ADVICE r3).
#
# Self-contained: every dataset is generated here with its exact seed /
# split-size / night-severity provenance (ADVICE r3 #1), every eval writes
# to the TRACKED results/r4/ dir and failures are loud (ADVICE r3 #2).
# TPU jobs are strictly sequential (one chip behind the axon relay).
#
# Phases:
#   A  full-res (450x800) sev-1.0 stage2-coarse chain -> eval all/night/day
#      [VERDICT #1 "THE CROSSING" at working resolution; val n_night ~64]
#   B  96x160 sev-{0,1} x seed-{42,43} stage2-coarse chains -> error bars
#      [VERDICT #2; val 128 @ night_frac 0.5 => n_night ~64]
#   C  96x160 sev-0.5 midpoint chain [VERDICT #3b]
#   D  450x800 sev-0 matched-UPDATE grad-accum control: standard B=32 20ep
#      vs accum-4 80ep (160 optimizer updates each) [VERDICT #3a]
set -u
cd /root/repo
mkdir -p results/r4 runs data
R=results/r4
# Optional phase selection: `r4_queue.sh BCD` runs only phases B, C, D
# (e.g. when Phase A's evals are already committed in results/r4/).
PHASES=${1:-ABCD}
want () { case "$PHASES" in *$1*) return 0;; *) return 1;; esac; }

gen () { # gen <out> <args...>
  local out=$1; shift
  if [ -d "$out/train" ] && [ -d "$out/val" ]; then
    echo "[gen] $out exists, skipping"; return 0
  fi
  echo "[gen] $out: $*"
  python scripts/generate_dataset.py --out "$out" "$@" || exit 10
}

run () { # run <tag> <timeout_s> <args...>
  local tag=$1 tmo=$2; shift 2
  echo "[run $tag] $(date +%H:%M:%S) $*"
  timeout "$tmo" python -m radar_depth_tpu.train.main "$@" \
      > "runs/${tag}.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[run $tag] FAILED rc=$rc — tail:"; tail -5 "runs/${tag}.log"
    exit 11
  fi
  echo "[run $tag] done $(date +%H:%M:%S)"
}

ev () { # ev <outfile> <args...>
  echo "[eval] $1"
  python scripts/eval_two_stage.py "${@:2}" > "$R/$1" 2>&1 || {
    echo "[eval] FAILED: $1"; tail -5 "$R/$1"; exit 12; }
}

# ---------- Phase A: full-res crossing confirmation (VERDICT #1) ----------
if want A; then
gen data/synth_ns10 --num-train 512 --num-val 128 --height 450 --width 800 \
    --sweeps 5 --seed 0 --night-severity 1.0 --val-night-frac 0.5
run ns10_lf 14400 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_ns10 -b 32 --epochs 20 \
    --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 --seed 42 \
    --output-dir runs/ns10_lf
run ns10_s2c 14400 --arch resnet18_multistage --decoder upproj \
    --stage1-path runs/ns10_lf --dataset packed --data-root data/synth_ns10 \
    -b 32 --epochs 14 --lr 0.002 --lr-decay-epochs 8 --filter-mode rel \
    --stage2-coarse --dtype bfloat16 --workers 2 --seed 42 \
    --output-dir runs/ns10_s2c
ev ns10_eval_all.txt   --run runs/ns10_s2c --data-root data/synth_ns10
ev ns10_eval_night.txt --run runs/ns10_s2c --data-root data/synth_ns10 --split night
ev ns10_eval_day.txt   --run runs/ns10_s2c --data-root data/synth_ns10 --split day
echo "PHASE_A_DONE $(date +%H:%M:%S)"
fi

# ---------- Phase B: seed x severity error bars at 96x160 (VERDICT #2) ----
if want B; then
for sev in 0.0 1.0; do
  sv=${sev%%.*}
  gen data/synth_s${sv}_small --num-train 256 --num-val 128 --height 96 \
      --width 160 --sweeps 3 --seed 0 --night-severity "$sev" \
      --val-night-frac 0.5
  for seed in 42 43; do
    t=s${sv}_sd${seed}
    run ${t}_lf 7200 --arch resnet18_latefusion --decoder upproj \
        --dataset packed --data-root data/synth_s${sv}_small --height 96 \
        --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
        --lr-decay-epochs 8 --workers 1 --seed "$seed" \
        --output-dir runs/${t}_lf
    run ${t}_s2c 7200 --arch resnet18_multistage --decoder upproj \
        --stage1-path runs/${t}_lf --dataset packed \
        --data-root data/synth_s${sv}_small --height 96 --width 160 \
        --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
        --filter-mode rel --stage2-coarse --workers 1 --seed "$seed" \
        --output-dir runs/${t}_s2c
    for sp in "" night day; do
      sfx=${sp:-all}
      ev ${t}_eval_${sfx}.txt --run runs/${t}_s2c \
         --data-root data/synth_s${sv}_small ${sp:+--split $sp}
    done
  done
done
echo "PHASE_B_DONE $(date +%H:%M:%S)"
fi

# ---------- Phase C: sev-0.5 midpoint (VERDICT #3b) -----------------------
if want C; then
gen data/synth_ns05_small --num-train 256 --num-val 128 --height 96 \
    --width 160 --sweeps 3 --seed 0 --night-severity 0.5 --val-night-frac 0.5
run ns05_lf 7200 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_ns05_small --height 96 \
    --width 160 --num-sweeps 3 -b 8 --epochs 20 --lr 0.01 \
    --lr-decay-epochs 8 --workers 1 --seed 42 --output-dir runs/ns05_lf
run ns05_s2c 7200 --arch resnet18_multistage --decoder upproj \
    --stage1-path runs/ns05_lf --dataset packed \
    --data-root data/synth_ns05_small --height 96 --width 160 \
    --num-sweeps 3 -b 8 --epochs 14 --lr 0.002 --lr-decay-epochs 8 \
    --filter-mode rel --stage2-coarse --workers 1 --seed 42 \
    --output-dir runs/ns05_s2c
for sp in "" night day; do
  sfx=${sp:-all}
  ev ns05_eval_${sfx}.txt --run runs/ns05_s2c \
     --data-root data/synth_ns05_small ${sp:+--split $sp}
done
echo "PHASE_C_DONE $(date +%H:%M:%S)"
fi

# ---------- Phase D: matched-UPDATE grad-accum control (VERDICT #3a) ------
if want D; then
# Both arms on the SAME fresh shards: standard B=32 20ep (160 updates on a
# 256-sample split at 8 steps/ep) vs accum 4xB=32 80ep (2 updates/ep x 80 =
# 160 updates), lr 0.02 decay@32 per the r3 recipe.
gen data/synth_std --num-train 256 --num-val 64 --height 450 --width 800 \
    --sweeps 5 --seed 0 --night-severity 0.0
run std_b32 14400 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_std -b 32 --epochs 20 \
    --lr 0.01 --lr-decay-epochs 8 --dtype bfloat16 --workers 2 --seed 42 \
    --output-dir runs/std_b32
run std_ga4 21600 --arch resnet18_latefusion --decoder upproj \
    --dataset packed --data-root data/synth_std -b 32 --grad-accum 4 \
    --epochs 80 --lr 0.02 --lr-decay-epochs 32 --dtype bfloat16 --workers 2 \
    --seed 42 --output-dir runs/std_ga4
grep -h "best" runs/std_b32/best.txt runs/std_ga4/best.txt \
    > "$R/ga4_control.txt" 2>&1 || true
cat runs/std_b32/best.txt runs/std_ga4/best.txt >> "$R/ga4_control.txt" 2>/dev/null
echo "PHASE_D_DONE $(date +%H:%M:%S)"
fi
echo QUEUE_DONE
