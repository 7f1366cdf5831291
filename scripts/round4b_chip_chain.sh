#!/bin/bash
# Round-4 continuation chip chain (post VM-restart session).
#
# Stage A: full mechanics eval sweep + OOD-tail diagnosis on the COMMITTED
#          portable mech_600k it-100k checkpoint (VERDICT r3 ask #1: every
#          mechanics number must resolve to a committed file).
# Stage B: Darcy cosine-lr 300k A/B against results/darcy_300k (constant lr,
#          VERDICT r3 ask #2), with insurance persists every ~15 min and
#          n=64 sampled-residual evals at 40k/100k/final (ask #3).
#
# Usage: TRAIN_DEADLINE_EPOCH=<epoch> nohup bash scripts/round4b_chip_chain.sh \
#          > /tmp/r4b_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
DEADLINE=${TRAIN_DEADLINE_EPOCH:?set TRAIN_DEADLINE_EPOCH}

# persistent XLA compile cache: first compiles on the tunneled chip run
# 10-25 min; every later process with the same program reuses them
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

# ---- stage A: mechanics eval on the committed portable checkpoint ----------
log "waiting for mechanics test sets"
while [ ! -f data/mechanics/test/test_level_2/fields/127.npy ] || \
      [ ! -f data/mechanics/test/test_level_2/fields/scenarios.csv ]; do
  sleep 20
done
sleep 5
log "stage A: mechanics full 2-level sweep (portable it-100k)"
if [ ! -d results/mech_600k/evaluation ]; then
  timeout 5400 python sample_eval.py --model-dir results/mech_600k/portable \
    --no-samples 4 | tee /tmp/mech_eval_stdout.log
  # relocate the eval out of portable/ to the run root and drop per-sample dumps
  for d in results/mech_600k/portable/evaluation*; do
    [ -d "$d" ] && mv "$d" "results/mech_600k/$(basename "$d")"
  done
  rm -rf results/mech_600k/evaluation*/*/sample_*
fi
for level in test_level_1 test_level_2; do
  timeout 600 python scripts/diagnose_ood_tail.py --model-dir results/mech_600k \
    --level $level || true
done
python - <<'EOF'
import sys
from pathlib import Path
sys.path.insert(0, "scripts")
from persist_results import persist_run
persist_run(Path("results/mech_600k"), Path("results/mech_600k"))
EOF
git add results/mech_600k
git commit -q -m "Mechanics 600k (it-100k portable): full 2-level eval sweep + OOD-tail report" || true
log "stage A done"

# ---- stage B: Darcy cosine 300k A/B ----------------------------------------
log "waiting for Darcy data"
while [ ! -f data/darcy/valid/K_data.csv ]; do sleep 20; done
sleep 5
NOW=$(date +%s)
TRAIN_T=$(( DEADLINE - NOW ))
if [ "$TRAIN_T" -lt 600 ]; then log "no time left for training"; exit 0; fi
log "stage B: darcy cosine 300k (budget ${TRAIN_T}s)"
( # insurance watcher: persist metrics + export latest portable every 15 min
  while sleep 900; do
    [ -d trained_models/darcy_300k_cosine ] || continue
    python scripts/persist_results.py darcy_300k_cosine >/dev/null 2>&1 || true
    python scripts/export_portable_checkpoint.py \
      --model-dir trained_models/darcy_300k_cosine \
      --out results/darcy_300k_cosine/portable >/dev/null 2>&1 || true
    it=$(tail -2 trained_models/darcy_300k_cosine/metrics.csv 2>/dev/null | head -1 | cut -d, -f1)
    git add results/darcy_300k_cosine >/dev/null 2>&1 && \
      git commit -q -m "Persist darcy cosine-A/B evidence (it ${it:-?})" || true
  done
) & WATCH_PID=$!
timeout -s TERM "$TRAIN_T" python train.py --gov-eqs darcy --name darcy_300k_cosine \
  --iterations 300000 --lr-schedule cosine --chunk-steps 20 \
  --sample-freq 20000 --no-samples 8 --resume
kill "$WATCH_PID" 2>/dev/null

# n>=64 headline evals at the drift-critical steps (whichever exist)
for st in 40000 100000 200000 300000; do
  if [ -f trained_models/darcy_300k_cosine/model/checkpoint_${st}.msgpack ]; then
    log "n=64 eval at step $st"
    timeout 1200 python sample_eval.py --model-dir trained_models/darcy_300k_cosine \
      --step $st --no-samples 64 || true
  fi
done
python scripts/export_portable_checkpoint.py \
  --model-dir trained_models/darcy_300k_cosine \
  --out results/darcy_300k_cosine/portable || true
# CPU-side drift A/B over the cosine checkpoint ladder — direct comparison
# against the committed constant-lr results/darcy_300k/drift_diagnosis.json
JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 timeout 3600 python scripts/diagnose_darcy_drift.py \
  --model-dir trained_models/darcy_300k_cosine \
  --out trained_models/darcy_300k_cosine/drift_diagnosis.json || true
python scripts/persist_results.py darcy_300k_cosine
# if the run was cut short, commit a FULL resume checkpoint (params+EMA+opt)
# so round 5's queue continues instead of restarting (stage-1 resume hook)
last_it=$(tail -2 trained_models/darcy_300k_cosine/metrics.csv 2>/dev/null | head -1 | cut -d, -f1)
if [ "${last_it:-0}" -lt 300000 ] 2>/dev/null; then
  rm -rf results/darcy_300k_cosine/resume
  mkdir -p results/darcy_300k_cosine/resume/model
  latest=$(ls -v trained_models/darcy_300k_cosine/model/checkpoint_*.msgpack 2>/dev/null | tail -1)
  [ -n "$latest" ] && cp "$latest" results/darcy_300k_cosine/resume/model/
  cp trained_models/darcy_300k_cosine/config.json results/darcy_300k_cosine/resume/ 2>/dev/null || true
  cp trained_models/darcy_300k_cosine/metrics.csv results/darcy_300k_cosine/resume/ 2>/dev/null || true
fi
git add results/darcy_300k_cosine
git commit -q -m "Darcy cosine-lr 300k A/B: n=64 sampled-residual evals across the checkpoint ladder" || true
log "chain complete"
