#!/bin/bash
# Round-4 continuation chain (post second VM-restart).
#
# State at launch: darcy_300k_cosine interrupted at it-181,680 (ladder of
# checkpoints every 20k survives in trained_models/); n=64 evals at 40k and
# 100k already committed under results/darcy_300k_cosine. Mechanics 600k
# eval sweep + OOD report committed (results/mech_600k).
#
# Stages (each commits its evidence before the next starts):
#   1. resume cosine -> 300k, n=64 evals at 200k/300k, CPU drift diagnosis
#   2. DDIM sample-estimation 100k + n=64 eval
#   3. residual-grad-guidance 100k + n=64 evals at scale 1.0 / 3.0
#   4. mechanics CoCoGen-correction ablation on the committed portable 600k
#   5. bench recapture
#
# Usage: nohup bash scripts/round4c_chain.sh > /tmp/r4c_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

start_watcher() {  # $1 = run name; persists evidence every 15 min
  ( while sleep 900; do
      [ -d "trained_models/$1" ] || continue
      python scripts/persist_results.py "$1" >/dev/null 2>&1 || true
      python scripts/export_portable_checkpoint.py \
        --model-dir "trained_models/$1" \
        --out "results/$1/portable" >/dev/null 2>&1 || true
      it=$(tail -2 "trained_models/$1/metrics.csv" 2>/dev/null | head -1 | cut -d, -f1)
      git add "results/$1" >/dev/null 2>&1 && \
        git commit -q -m "Persist $1 evidence (it ${it:-?})" || true
    done ) & WATCH_PID=$!
}
stop_watcher() { kill "$WATCH_PID" 2>/dev/null || true; }

cosine_reached() {
  [ -f trained_models/darcy_300k_cosine/metrics.csv ] && \
    awk -F, 'NR>1 && $1+0 >= 299000 {found=1} END {exit !found}' \
      trained_models/darcy_300k_cosine/metrics.csv
}

# ---- stage 1: finish cosine 300k -------------------------------------------
if ! cosine_reached; then
  log "stage 1: resume darcy cosine -> 300k"
  start_watcher darcy_300k_cosine
  timeout -s TERM 9000 python train.py --gov-eqs darcy --name darcy_300k_cosine \
    --iterations 300000 --lr-schedule cosine --chunk-steps 20 \
    --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
fi
for st in 200000 300000; do
  if [ -f trained_models/darcy_300k_cosine/model/checkpoint_${st}.msgpack ] && \
     ! grep -q "\"checkpoint_step\": $st" \
        results/darcy_300k_cosine/evaluation*/eval_settings.json 2>/dev/null; then
    log "n=64 eval at step $st"
    timeout 1800 python sample_eval.py --model-dir trained_models/darcy_300k_cosine \
      --step $st --no-samples 64 || true
  fi
done
python scripts/export_portable_checkpoint.py \
  --model-dir trained_models/darcy_300k_cosine \
  --out results/darcy_300k_cosine/portable || true
JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 timeout 5400 python scripts/diagnose_darcy_drift.py \
  --model-dir trained_models/darcy_300k_cosine \
  --out trained_models/darcy_300k_cosine/drift_diagnosis.json || true
python scripts/persist_results.py darcy_300k_cosine || true
rm -rf results/darcy_300k_cosine/resume
git add -A results/darcy_300k_cosine
git commit -q -m "Darcy cosine 300k complete: n=64 evals at 200k/300k + ladder drift diagnosis" || true
log "stage 1 done"

# ---- stage 2: DDIM sample-estimation at 100k -------------------------------
if [ ! -f results/darcy_sample_100k/summary.json ]; then
  log "stage 2: DDIM sample-estimation 100k"
  start_watcher darcy_sample_100k
  timeout -s TERM 7200 python train.py --gov-eqs darcy --name darcy_sample_100k \
    --iterations 100000 --x0-estimation sample \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
  timeout 1800 python sample_eval.py --model-dir trained_models/darcy_sample_100k \
    --no-samples 64 || true
  python scripts/export_portable_checkpoint.py \
    --model-dir trained_models/darcy_sample_100k \
    --out results/darcy_sample_100k/portable || true
  python scripts/persist_results.py darcy_sample_100k || true
  git add -A results/darcy_sample_100k
  git commit -q -m "DDIM sample-estimation at 100k: n=64 eval evidence" || true
fi
log "stage 2 done"

# ---- stage 3: guided retrain at 100k ----------------------------------------
if [ ! -f results/darcy_guided_100k/summary.json ]; then
  log "stage 3: residual-grad-guidance 100k"
  start_watcher darcy_guided_100k
  timeout -s TERM 7200 python train.py --gov-eqs darcy --name darcy_guided_100k \
    --iterations 100000 --residual-grad-guidance \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
  timeout 1800 python sample_eval.py --model-dir trained_models/darcy_guided_100k \
    --no-samples 64 --guidance-scale 1.0 || true
  timeout 1800 python sample_eval.py --model-dir trained_models/darcy_guided_100k \
    --no-samples 64 --guidance-scale 3.0 || true
  python scripts/export_portable_checkpoint.py \
    --model-dir trained_models/darcy_guided_100k \
    --out results/darcy_guided_100k/portable || true
  python scripts/persist_results.py darcy_guided_100k || true
  git add -A results/darcy_guided_100k
  git commit -q -m "Guided 100k: n=64 evals at scale 1.0 (operating point) and 3.0 (reference default)" || true
fi
log "stage 3 done"

# ---- stage 4: mechanics CoCoGen-correction ablation -------------------------
if [ -d results/mech_600k/portable ] && \
   ! ls results/mech_600k/evaluation*/eval_settings.json 2>/dev/null | \
     xargs grep -l '"correction_mode": "xt"' >/dev/null 2>&1; then
  log "stage 4: mechanics correction ablation"
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
log "stage 4 done"

# ---- stage 5: bench recapture -----------------------------------------------
log "stage 5: bench"
timeout 3600 python bench.py || true
git add -A BENCH_CACHE.json results/ 2>/dev/null
git commit -q -m "Round-4 chain: bench recapture + final evidence persist" || true
log "chain complete"
