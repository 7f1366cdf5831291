#!/bin/bash
# Round-5 takeover chain — replaces scripts/round5_master.sh mid-round.
#
# Why: the tunneled chip developed ~20-min-to-indefinite dispatch stalls
# (first observed 15:03 UTC; the 15:43 one never self-recovered — the
# backend accepts NEW clients while the wedged session hangs forever, see
# docs/OPERATIONS.md "flaky tunnel"). round5_master.sh runs each training
# stage as ONE timeout'd process with no retry, so a wedge burns the whole
# stage budget. This script adds a stall WATCHDOG around every training
# stage: if metrics.csv stops advancing for >12 min, the trainer is killed
# and relaunched with --resume (drivers checkpoint at every sample_freq).
#
# Stages (same agenda, same guards as round5_master.sh S3-S5):
#   T1  finish darcy_300k_fp32head to 300k           (VERDICT r4 ask #1)
#   T2  n=64 sampled-residual evals at 40k + 300k
#   T3  bounded bench recapture (warms + measures the big-tile scenarios)
#   T4  mechanics to 600k, watchdog, deadline-aware   (ask #3)
#   T5  mech eval sweep + OOD-tail report             (ask #3)
#
# Usage: nohup bash scripts/round5_takeover.sh > /tmp/r5_takeover.log 2>&1 &
#        echo $! > /tmp/r5_takeover.pid
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

CHAIN_DEADLINE=${CHAIN_DEADLINE:-1787271600}   # ~00:20 UTC, chip free before bench
remaining() { echo $(( CHAIN_DEADLINE - $(date +%s) )); }

reached() {  # $1 = metrics.csv path, $2 = target iteration
  [ -f "$1" ] && awk -F, -v t="$2" 'NR>1 && $1+0 >= t {f=1} END {exit !f}' "$1"
}

start_watcher() {  # $1 = run name; persists evidence every 15 min
  ( while sleep 900; do
      [ -d "trained_models/$1" ] || continue
      python scripts/persist_results.py "$1" >/dev/null 2>&1 || true
      it=$(tail -2 "trained_models/$1/metrics.csv" 2>/dev/null | head -1 | cut -d, -f1)
      git add "results/$1" >/dev/null 2>&1 && \
        git commit -q -m "Persist $1 evidence (it ${it:-?})" || true
    done ) & WATCH_PID=$!
}
stop_watcher() { kill "${WATCH_PID:-0}" 2>/dev/null || true; }

persist_and_commit() {  # $1 = run name, $2 = commit message
  python scripts/export_portable_checkpoint.py --model-dir "trained_models/$1" \
    --out "results/$1/portable" || true
  python scripts/persist_results.py "$1" || true
  git add "results/$1" 2>/dev/null && git commit -q -m "$2" || true
}

# train_wd NAME TARGET_IT STAGE_DEADLINE_EPOCH CMD...
# Runs CMD (a train driver with --resume) under a stall watchdog: restart
# whenever metrics.csv is silent >720 s (covers sampling pauses and the
# ~8 min cold compile via the launch-time floor), TERM+KILL at deadline.
train_wd() {
  local name=$1 target=$2 dl=$3; shift 3
  while :; do
    reached "trained_models/$name/metrics.csv" "$target" && return 0
    [ "$(date +%s)" -ge "$dl" ] && { log "watchdog: $name deadline"; return 1; }
    log "watchdog: launching $name (target $target, $(( dl - $(date +%s) ))s left)"
    "$@" & local tp=$!
    echo "$tp" > /tmp/r5_trainer.pid
    local launch=$(date +%s)
    while kill -0 "$tp" 2>/dev/null; do
      sleep 60
      local now=$(date +%s)
      if [ "$now" -ge "$dl" ]; then
        log "watchdog: $name deadline — graceful stop"
        kill -TERM "$tp" 2>/dev/null; sleep 90
        kill -9 "$tp" 2>/dev/null
        break
      fi
      local mt=$(stat -c %Y "trained_models/$name/metrics.csv" 2>/dev/null || echo "$launch")
      [ "$mt" -lt "$launch" ] && mt=$launch
      if [ $(( now - mt )) -gt 720 ]; then
        log "watchdog: $name silent $(( now - mt ))s — killing wedged trainer"
        kill -9 "$tp" 2>/dev/null
        break
      fi
    done
    wait "$tp" 2>/dev/null
  done
}

# ---- T1: finish darcy_300k_fp32head (wedged at ~80.5k under the old chain) ----
S3_DL=$(( $(date +%s) + 11700 ))            # ~3.25 h hard cap for the rest of T1
[ "$S3_DL" -gt $(( CHAIN_DEADLINE - 9000 )) ] && S3_DL=$(( CHAIN_DEADLINE - 9000 ))
if ! reached trained_models/darcy_300k_fp32head/metrics.csv 299000; then
  log "T1: darcy 300k fp32-head (resume under watchdog)"
  start_watcher darcy_300k_fp32head
  train_wd darcy_300k_fp32head 299000 "$S3_DL" \
    python train.py --gov-eqs darcy \
    --name darcy_300k_fp32head --iterations 300000 --fp32-head \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
fi
log "T1 done ($(remaining)s to deadline)"

# ---- T2: n=64 evals at the 40k and 300k rungs ----
if reached trained_models/darcy_300k_fp32head/metrics.csv 299000; then
  for st in 40000 300000; do
    [ -f trained_models/darcy_300k_fp32head/model/checkpoint_${st}.msgpack ] && \
      ! grep -rq "\"checkpoint_step\": ${st}" results/darcy_300k_fp32head/evaluation*/eval_settings.json 2>/dev/null && \
      timeout 2400 python sample_eval.py --model-dir trained_models/darcy_300k_fp32head \
        --step $st --no-samples 64 || true
  done
  ( JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 timeout 7200 \
      nice -n 10 python scripts/diagnose_darcy_drift.py \
        --model-dir trained_models/darcy_300k_fp32head \
        --out trained_models/darcy_300k_fp32head/drift_diagnosis.json && \
    python scripts/persist_results.py darcy_300k_fp32head && \
    git add results/darcy_300k_fp32head 2>/dev/null && \
    git commit -q -m "Darcy 300k fp32-head: fp32 CPU drift ladder" ) \
      > /tmp/r5_t2_diag.log 2>&1 &
  persist_and_commit darcy_300k_fp32head \
    "Darcy 300k fp32-head at the reference recipe: n=64 evals at 40k and 300k"
else
  # partial run is still evidence: eval the best rung we have + the 40k rung
  log "T2: 300k not reached — eval latest checkpoint instead"
  last=$(ls trained_models/darcy_300k_fp32head/model/checkpoint_*.msgpack 2>/dev/null \
          | sed 's/.*checkpoint_\([0-9]*\).*/\1/' | sort -n | tail -1)
  for st in 40000 ${last:-}; do
    [ -n "$st" ] && [ -f trained_models/darcy_300k_fp32head/model/checkpoint_${st}.msgpack ] && \
      ! grep -rq "\"checkpoint_step\": ${st}" results/darcy_300k_fp32head/evaluation*/eval_settings.json 2>/dev/null && \
      timeout 2400 python sample_eval.py --model-dir trained_models/darcy_300k_fp32head \
        --step $st --no-samples 64 || true
  done
  persist_and_commit darcy_300k_fp32head \
    "Darcy fp32-head: n=64 evals (run truncated by tunnel stalls)"
fi
log "T2 done ($(remaining)s to deadline)"

# ---- T3: bounded bench recapture (big-tile scenarios measured + cached) ----
if [ "$(remaining)" -gt 12000 ]; then
  log "T3: bench recapture (hard 1550s cap)"
  timeout 1600 python bench.py --attempts 1 --attempt-timeout 1500 --budget 1550 || true
  git add BENCH_CACHE.json 2>/dev/null && \
    git commit -q -m "Measured on-chip bench recapture (FD relayout + big-tile scenarios)" || true
else
  log "T3: skipped (chip budget $(remaining)s)"
fi

# ---- T4: mechanics full 600k budget under watchdog ----
MECH_EVAL_RESERVE=3600
if ! reached trained_models/mech_600k_full/metrics.csv 599000; then
  M_DL=$(( CHAIN_DEADLINE - MECH_EVAL_RESERVE ))
  if [ $(( M_DL - $(date +%s) )) -gt 1800 ]; then
    log "T4: mech 600k full budget (until $(( M_DL - $(date +%s) ))s from now)"
    start_watcher mech_600k_full
    train_wd mech_600k_full 599000 "$M_DL" \
      python train_mechanics.py \
      --name mech_600k_full --iterations 600000 --chunk-steps 20 --fp32-head \
      --sample-freq 50000 --test-eval-freq 2000 --no-samples 4 --resume
    stop_watcher
  else
    log "T4: skipped (no chip budget left)"
  fi
fi
log "T4 done ($(remaining)s to deadline)"

# ---- T5: mech sweep + OOD report ----
if [ -d trained_models/mech_600k_full/model ] && [ "$(remaining)" -gt 1500 ]; then
  log "T5: mechanics eval sweep"
  timeout $(( $(remaining) - 600 )) python sample_eval.py \
    --model-dir trained_models/mech_600k_full --no-samples 4 || true
  timeout 600 python scripts/diagnose_ood_tail.py \
    --model-dir trained_models/mech_600k_full || true
  persist_and_commit mech_600k_full \
    "Mechanics at the full 600k reference budget: n=128/level sweep + OOD report"
fi

git add -A results/ 2>/dev/null
git commit -q -m "Round-5 takeover chain: final evidence persist" || true
log "takeover chain complete ($(remaining)s to spare)"
