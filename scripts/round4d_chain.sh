#!/bin/bash
# Round-4d chip chain: the decisive dtype A/B for the Darcy late-training
# residual drift, then the mechanics correction ablation + bench recapture
# that round4c_chain.sh stages 4-5 would have run.
#
# Motivation (see docs/DARCY_DRIFT.md): the cosine-lr 300k A/B *refuted*
# the constant-lr-Adam-tail root cause — under cosine decay the parameter
# L2 saturates (172.5 vs 197.9) yet the sampled/x0 residual still degrades
# 0.115 -> 0.64 (t=25), and the low-t data MSE grows on BOTH splits. The
# grad-precision probe (scripts/probe_grad_precision.py) shows bf16
# gradients decorrelate from fp32 gradients late in training
# (cos +0.99 at it-40k -> cos -0.2..-0.9 at it-300k). Decisive test:
# resume the SAME it-100k checkpoint (no optimizer state, so both arms
# restart Adam identically) for 50k steps in bf16 vs fp32 compute.
# If fp32 holds ~flat while bf16 re-drifts, bf16 compute is causal.
#
# Usage: nohup bash scripts/round4d_chain.sh > /tmp/r4d_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

SRC_CKPT=trained_models/darcy_300k_cosine/model/checkpoint_100000.msgpack

start_watcher() {  # $1 = run name; persists evidence every 15 min
  ( while sleep 900; do
      [ -d "trained_models/$1" ] || continue
      python scripts/persist_results.py "$1" >/dev/null 2>&1 || true
      it=$(tail -2 "trained_models/$1/metrics.csv" 2>/dev/null | head -1 | cut -d, -f1)
      git add "results/$1" >/dev/null 2>&1 && \
        git commit -q -m "Persist $1 evidence (it ${it:-?})" || true
    done ) & WATCH_PID=$!
}
stop_watcher() { kill "$WATCH_PID" 2>/dev/null || true; }

# ---- stage A: dtype A/B arms -------------------------------------------------
run_arm() {  # $1 = arm (bf16|fp32), $2.. = extra train.py flags
  local arm=$1; shift
  local name="darcy_ab_${arm}"
  if awk -F, 'NR>1 && $1+0 >= 149000 {found=1} END {exit !found}' \
      "trained_models/$name/metrics.csv" 2>/dev/null; then
    log "arm $arm already complete"; return 0
  fi
  mkdir -p "trained_models/$name/model"
  if ! ls "trained_models/$name/model/"checkpoint_1[1-5]*.msgpack >/dev/null 2>&1; then
    cp -n "$SRC_CKPT" "trained_models/$name/model/" || return 1
  fi
  log "arm $arm: resume it-100k -> 150k"
  start_watcher "$name"
  timeout -s TERM 5400 python train.py --gov-eqs darcy --name "$name" \
    --iterations 150000 --chunk-steps 20 \
    --sample-freq 10000 --no-samples 8 --resume "$@"
  stop_watcher
}

run_arm bf16
run_arm fp32 --compute-dtype float32

# CPU ladder diagnosis on both arms runs in the BACKGROUND (fp32 eval;
# isolates the stored weights) so the chip can start stage A2 immediately —
# the one-core host is otherwise idle while the chip trains.
( for arm in bf16 fp32; do
    name="darcy_ab_${arm}"
    [ -d "trained_models/$name/model" ] || continue
    JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 timeout 3600 \
      python scripts/diagnose_darcy_drift.py \
        --model-dir "trained_models/$name" \
        --out "trained_models/$name/drift_diagnosis.json" || true
  done ) > /tmp/ab_diagnosis.log 2>&1 & DIAG_PID=$!
# persist the raw training curves now; diagnosis evidence lands after wait
for arm in bf16 fp32; do
  python scripts/persist_results.py "darcy_ab_${arm}" || true
done
git add -A results/darcy_ab_bf16 results/darcy_ab_fp32 2>/dev/null
git commit -q -m "Darcy drift dtype A/B: it-100k checkpoint resumed 50k steps in bf16 vs fp32" || true
log "stage A arms done (diagnosis in background)"

# ---- stage A2: finish the DDIM sample-estimation run (VERDICT r3 ask #8) ----
# darcy_sample_100k only reached it-26,180 before a VM restart; resume to
# the full 100k budget while the A/B diagnosis occupies the host CPU.
sample_reached() {
  [ -f trained_models/darcy_sample_100k/metrics.csv ] && \
    awk -F, 'NR>1 && $1+0 >= 99000 {found=1} END {exit !found}' \
      trained_models/darcy_sample_100k/metrics.csv
}
if ! sample_reached && [ -d trained_models/darcy_sample_100k/model ]; then
  log "stage A2: resume darcy_sample_100k -> 100k"
  start_watcher darcy_sample_100k
  timeout -s TERM 6000 python train.py --gov-eqs darcy --name darcy_sample_100k \
    --iterations 100000 --x0-estimation sample \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
fi
if sample_reached; then
  timeout 1800 python sample_eval.py --model-dir trained_models/darcy_sample_100k \
    --no-samples 64 || true
  python scripts/export_portable_checkpoint.py \
    --model-dir trained_models/darcy_sample_100k \
    --out results/darcy_sample_100k/portable || true
  python scripts/persist_results.py darcy_sample_100k || true
  git add -A results/darcy_sample_100k
  git commit -q -m "DDIM sample-estimation trained to the full 100k budget: n=64 eval" || true
fi
log "stage A2 done"

# ---- stage A3: dtype A/B verdict (waits for the CPU diagnosis) ---------------
wait "$DIAG_PID" 2>/dev/null || true
for arm in bf16 fp32; do
  python scripts/persist_results.py "darcy_ab_${arm}" || true
done
python scripts/compare_dtype_ab.py || true
git add -A results/darcy_ab_bf16 results/darcy_ab_fp32 results/dtype_ab_verdict.json 2>/dev/null
git commit -q -m "Dtype A/B drift diagnosis ladders + machine verdict" || true
log "stage A3 done"

# ---- stage C first: bench recapture (higher priority than the ablation) ------
log "stage C: bench"
timeout 3600 python bench.py || true
git add -A BENCH_CACHE.json results/ 2>/dev/null
git commit -q -m "Round-4 chain: bench recapture" || true

# ---- stage B: mechanics CoCoGen-correction ablation (from r4c stage 4) -------
if [ -d results/mech_600k/portable ] && \
   ! ls results/mech_600k/evaluation_corr* >/dev/null 2>&1; then
  log "stage B: mechanics correction ablation"
  timeout 5400 python sample_eval.py --model-dir results/mech_600k/portable \
    --no-samples 4 --correction-mode xt --n-correction 3 --m-correction 3 || true
  for d in results/mech_600k/portable/evaluation*; do
    [ -d "$d" ] || continue
    i=0; dst="results/mech_600k/evaluation_corr"
    while [ -e "$dst" ]; do i=$((i+1)); dst="results/mech_600k/evaluation_corr_$i"; done
    mv "$d" "$dst"
    find "$dst" -name "sample_*" -type d -exec rm -rf {} + 2>/dev/null
  done
  python - <<'EOF'
import sys
from pathlib import Path
sys.path.insert(0, "scripts")
from persist_results import persist_run
persist_run(Path("results/mech_600k"), Path("results/mech_600k"))
EOF
  git add -A results/mech_600k
  git commit -q -m "Mechanics 600k: CoCoGen xt-correction ablation on the OOD sweep" || true
fi
log "stage B done"

git add -A results/ 2>/dev/null
git commit -q -m "Round-4 chain: final evidence persist" || true
log "chain complete"
