#!/bin/bash
# Round-4e chip chain: the THIRD dtype A/B arm — bf16 body + fp32 head
# (--fp32-head) — resumed from the same darcy_300k_cosine it-100k
# checkpoint as the bf16/fp32 arms (scripts/round4d_chain.sh stage A).
#
# Rationale (docs/DARCY_DRIFT.md): the FD residual amplifies bf16 output
# quantization noise by ~1/d0^2; the grad-precision probe shows the fp32
# head restores bf16 gradient fidelity. If this arm's ladder holds flat
# like fp32 while plain bf16 re-drifts, the drift is fixed at bf16 speed.
#
# Waits for round4d_chain.sh (reads /tmp/r4d_chain.pid) to finish before
# touching the chip. Usage:
#   nohup bash scripts/round4e_chain.sh > /tmp/r4e_chain.log 2>&1 &
#   echo $! > /tmp/r4e_chain.pid
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

if [ -f /tmp/r4d_chain.pid ]; then
  while kill -0 "$(cat /tmp/r4d_chain.pid)" 2>/dev/null; do sleep 30; done
fi
log "r4d finished; starting fp32-head arm"

SRC_CKPT=trained_models/darcy_300k_cosine/model/checkpoint_100000.msgpack
name=darcy_ab_fp32head

start_watcher() {
  ( while sleep 900; do
      [ -d "trained_models/$name" ] || continue
      python scripts/persist_results.py "$name" >/dev/null 2>&1 || true
      it=$(tail -2 "trained_models/$name/metrics.csv" 2>/dev/null | head -1 | cut -d, -f1)
      git add "results/$name" >/dev/null 2>&1 && \
        git commit -q -m "Persist $name evidence (it ${it:-?})" || true
    done ) & WATCH_PID=$!
}

if ! awk -F, 'NR>1 && $1+0 >= 149000 {found=1} END {exit !found}' \
    "trained_models/$name/metrics.csv" 2>/dev/null; then
  mkdir -p "trained_models/$name/model"
  if ! ls "trained_models/$name/model/"checkpoint_1[1-5]*.msgpack >/dev/null 2>&1; then
    cp -n "$SRC_CKPT" "trained_models/$name/model/" || exit 1
  fi
  start_watcher
  timeout -s TERM 5400 python train.py --gov-eqs darcy --name "$name" \
    --iterations 150000 --chunk-steps 20 --fp32-head \
    --sample-freq 10000 --no-samples 8 --resume
  kill "$WATCH_PID" 2>/dev/null || true
fi

JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 timeout 3600 \
  python scripts/diagnose_darcy_drift.py \
    --model-dir "trained_models/$name" \
    --out "trained_models/$name/drift_diagnosis.json" || true
python scripts/persist_results.py "$name" || true
python scripts/compare_dtype_ab.py || true
git add -A "results/$name" results/dtype_ab_verdict.json 2>/dev/null
git commit -q -m "Dtype A/B third arm: bf16 + fp32 head resumed from the same it-100k checkpoint" || true
log "r4e complete"
