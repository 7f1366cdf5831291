#!/bin/bash
# Round-5 master chip chain — the round's two flagship full-budget runs plus
# the supporting evidence, in priority order (VERDICT r4 "Next round"):
#
#   S0  wait for the r4e fp32-head A/B arm to free the chip
#   S1  finish darcy_sample_100k (97.7k -> 100k) + n=64 eval       (ask #5)
#   S2  regenerate mechanics TRAIN split (TPU SIMP; test sets survive)
#   S3  FRESH Darcy 300k with --fp32-head, reference recipe        (ask #1)
#       (constant lr 1e-4, batch 64 — /root/reference/main.py:79-83)
#       + n=64 sampled-residual evals at the 40k and 300k rungs
#   S4  mechanics to the FULL 600k reference budget, --fp32-head   (ask #3)
#       (/root/reference/main.py:102-109), deadline-aware timeout
#   S5  n=128-per-level mech sweep + OOD-tail report
#   S6  optional: CoCoGen xt ablation, only if chip time remains
#
# Every stage is guarded by metrics-reached checks and persists + commits
# its own evidence, so a VM restart loses at most the in-flight stage; the
# chain is safe to relaunch. The mechanics training timeout is computed
# from CHAIN_DEADLINE so the chip is free before the driver's end-of-round
# bench run.
#
# Usage: nohup bash scripts/round5_master.sh > /tmp/r5_master.log 2>&1 &
#        echo $! > /tmp/r5_master.pid
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

# Round end ~= round start (PROGRESS.jsonl r5 first tick 1787229240) + 12h
# = 00:34 UTC. The chain frees the chip ~15 min before that; the driver's
# bench is additionally loss-proof (cache fallback) even on overrun.
CHAIN_DEADLINE=${CHAIN_DEADLINE:-1787271600}
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

# ---- S0: wait for the chip --------------------------------------------------
# r4e (fp32-head A/B arm) holds the chip until its training ends; its CPU
# diagnosis afterwards does not need the chip, so gate on the arm's metrics
# OR the chain pid dying, whichever comes first. If r4e died mid-arm (VM
# restart), finish the arm here — it is the decisive precision intervention
# now that pure-fp32 cannot compile on this stack (docs/DARCY_DRIFT.md).
log "S0: waiting for r4e fp32-head arm"
while :; do
  reached trained_models/darcy_ab_fp32head/metrics.csv 149000 && break
  kill -0 "$(cat /tmp/r4e_chain.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
if ! reached trained_models/darcy_ab_fp32head/metrics.csv 149000 && \
   [ -f trained_models/darcy_ab_fp32head/model/checkpoint_100000.msgpack ]; then
  log "S0: r4e died mid-arm; finishing fp32-head arm inline"
  start_watcher darcy_ab_fp32head
  timeout -s TERM 5400 python train.py --gov-eqs darcy --name darcy_ab_fp32head \
    --iterations 150000 --chunk-steps 20 --fp32-head \
    --sample-freq 10000 --no-samples 8 --resume
  stop_watcher
  ( JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 timeout 3600 \
      python scripts/diagnose_darcy_drift.py \
        --model-dir trained_models/darcy_ab_fp32head \
        --out trained_models/darcy_ab_fp32head/drift_diagnosis.json && \
    python scripts/persist_results.py darcy_ab_fp32head && \
    python scripts/compare_dtype_ab.py && \
    git add -A results/darcy_ab_fp32head results/dtype_ab_verdict.json 2>/dev/null && \
    git commit -q -m "Dtype A/B third arm (fp32 head): ladder + verdict" ) \
      > /tmp/r5_s0_diag.log 2>&1 &
fi
log "S0: chip free"

# ---- S0.5: mechanics per-op trace (VERDICT r4 ask #4) ----------------------
# Short chip job (~5 min) that names the top non-MXU costs in the 19.5 ms
# mechanics step so an optimization can land BEFORE the 600k run in S4.
if [ ! -f results/profile/mech_trace_fp32head.txt ]; then
  log "S0.5: mechanics per-op trace"
  timeout 900 python scripts/profile_mech_trace.py --fp32-head \
    --out results/profile/mech_trace_fp32head.txt || true
  git add results/profile 2>/dev/null && \
    git commit -q -m "Mechanics train-step per-op device trace (fp32-head config)" || true
fi
# Darcy per-op achieved-HBM-bandwidth table (VERDICT r4 ask #6): replaces
# the PERF_WALL backward-chain analogy with a measurement.
if [ ! -f results/profile/darcy_bwd_bw.txt ]; then
  log "S0.5b: darcy backward-chain bandwidth trace"
  timeout 900 python scripts/profile_darcy_bwd_bw.py \
    --out results/profile/darcy_bwd_bw.txt || true
  git add results/profile 2>/dev/null && \
    git commit -q -m "Darcy train-step per-op achieved-HBM-bandwidth table" || true
fi

# ---- S1: finish darcy_sample_100k + n=64 eval ------------------------------
if ! reached trained_models/darcy_sample_100k/metrics.csv 99000; then
  log "S1: finish darcy_sample_100k (97.7k -> 100k)"
  start_watcher darcy_sample_100k
  timeout -s TERM 2400 python train.py --gov-eqs darcy --name darcy_sample_100k \
    --iterations 100000 --x0-estimation sample \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
fi
if reached trained_models/darcy_sample_100k/metrics.csv 99000 && \
   ! grep -rq '"checkpoint_step": 100000' results/darcy_sample_100k/evaluation*/eval_settings.json 2>/dev/null; then
  timeout 2400 python sample_eval.py --model-dir trained_models/darcy_sample_100k \
    --no-samples 64 || true
  persist_and_commit darcy_sample_100k \
    "DDIM sample-estimation trained to the full 100k budget: n=64 eval"
fi
log "S1 done"

# ---- S2: mechanics TRAIN split (test/valid sets survived the boundary) -----
if [ ! -d data/mechanics/train/fields ] || \
   [ "$(ls data/mechanics/train/fields | wc -l)" -lt 3000 ]; then
  log "S2: regenerating mechanics train split (TPU SIMP, ~30 min)"
  timeout 3600 python scripts/generate_mechanics_sets.py --only train
fi
log "S2 done"

# ---- S3: FRESH Darcy 300k, reference recipe + fp32 head --------------------
# The drift fix at full budget on the reference's own training semantics:
# constant lr 1e-4, batch 64, 300k iters (main.py:79-83). Done criterion
# (VERDICT r4 #1): the 300k checkpoint's n=64 sampled residual <= its own
# 40k rung.
if ! reached trained_models/darcy_300k_fp32head/metrics.csv 299000 && \
   ! reached results/darcy_300k_fp32head/metrics.csv 299000; then
  log "S3: darcy 300k fp32-head (~3 h)"
  if [ -d results/darcy_300k_fp32head/resume ] && [ ! -d trained_models/darcy_300k_fp32head ]; then
    mkdir -p trained_models/darcy_300k_fp32head
    cp -r results/darcy_300k_fp32head/resume/* trained_models/darcy_300k_fp32head/
    cp results/darcy_300k_fp32head/metrics.csv trained_models/darcy_300k_fp32head/ 2>/dev/null
  fi
  start_watcher darcy_300k_fp32head
  timeout -s TERM 13500 python train.py --gov-eqs darcy --name darcy_300k_fp32head \
    --iterations 300000 --fp32-head --chunk-steps 20 \
    --sample-freq 20000 --no-samples 8 --resume
  stop_watcher
fi
if reached trained_models/darcy_300k_fp32head/metrics.csv 299000; then
  for st in 40000 300000; do
    [ -f trained_models/darcy_300k_fp32head/model/checkpoint_${st}.msgpack ] && \
      ! grep -rq "\"checkpoint_step\": ${st}" results/darcy_300k_fp32head/evaluation*/eval_settings.json 2>/dev/null && \
      timeout 2400 python sample_eval.py --model-dir trained_models/darcy_300k_fp32head \
        --step $st --no-samples 64 || true
  done
  # fp32 CPU ladder for the drift doc (background; chip moves on)
  ( JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 timeout 7200 \
      python scripts/diagnose_darcy_drift.py \
        --model-dir trained_models/darcy_300k_fp32head \
        --out trained_models/darcy_300k_fp32head/drift_diagnosis.json && \
    python scripts/persist_results.py darcy_300k_fp32head && \
    git add results/darcy_300k_fp32head 2>/dev/null && \
    git commit -q -m "Darcy 300k fp32-head: fp32 CPU drift ladder" ) \
      > /tmp/r5_s3_diag.log 2>&1 &
  persist_and_commit darcy_300k_fp32head \
    "Darcy 300k fp32-head at the reference recipe: n=64 evals at 40k and 300k"
fi
log "S3 done ($(remaining)s to deadline)"

# ---- S3.5: measured bench recapture ----------------------------------------
# By now the per-step, chunked, and residual programs are warm in the
# persistent compile cache (S0.5b + S3); one generous attempt both captures
# the round's measured number (FD-relayout delta, VERDICT r4 weak #5) and
# leaves every bench program cached so the driver's end-of-round BENCH_r05
# attempt compiles in seconds. Gate: only if the mechanics stage (15.3 ks
# train + 4.2 ks eval reserve + compile) still fits afterwards.
if [ "$(remaining)" -gt 22500 ]; then
  log "S3.5: measured bench recapture"
  timeout 2700 python bench.py --attempts 2 --attempt-timeout 1100 --budget 2500 || true
  git add BENCH_CACHE.json 2>/dev/null && \
    git commit -q -m "Measured on-chip bench recapture (post FD-relayout)" || true
else
  log "S3.5: skipped (chip budget: $(remaining)s)"
fi

# ---- S4: mechanics full 600k budget ----------------------------------------
MECH_EVAL_RESERVE=4200
if ! reached trained_models/mech_600k_full/metrics.csv 599000 && \
   ! reached results/mech_600k_full/metrics.csv 599000; then
  T=$(( $(remaining) - MECH_EVAL_RESERVE ))
  if [ "$T" -gt 1800 ]; then
    log "S4: mech 600k full budget (timeout ${T}s)"
    if [ -d results/mech_600k_full/resume ] && [ ! -d trained_models/mech_600k_full ]; then
      mkdir -p trained_models/mech_600k_full
      cp -r results/mech_600k_full/resume/* trained_models/mech_600k_full/
      cp results/mech_600k_full/metrics.csv trained_models/mech_600k_full/ 2>/dev/null
    fi
    start_watcher mech_600k_full
    timeout -s TERM "$T" python train_mechanics.py --name mech_600k_full \
      --iterations 600000 --chunk-steps 20 --fp32-head \
      --sample-freq 50000 --test-eval-freq 2000 --no-samples 4 --resume
    stop_watcher
  else
    log "S4: skipped (no chip budget left)"
  fi
fi

# ---- S5: mech sweep + OOD report (n=128 per level via --no-samples 4) ------
if [ -d trained_models/mech_600k_full/model ] && [ "$(remaining)" -gt 2400 ]; then
  log "S5: mechanics eval sweep"
  timeout $(( $(remaining) - 900 )) python sample_eval.py \
    --model-dir trained_models/mech_600k_full --no-samples 4 || true
  timeout 900 python scripts/diagnose_ood_tail.py \
    --model-dir trained_models/mech_600k_full || true
  persist_and_commit mech_600k_full \
    "Mechanics at the full 600k reference budget: n=128/level sweep + OOD report"
fi
log "S5 done ($(remaining)s to deadline)"

# ---- S6: optional xt-correction ablation -----------------------------------
if [ "$(remaining)" -gt 4500 ] && [ -d trained_models/mech_600k_full/model ] && \
   ! ls results/mech_600k_full/evaluation_corr* >/dev/null 2>&1; then
  log "S6: CoCoGen xt-correction ablation on mech_600k_full"
  timeout 3600 python sample_eval.py --model-dir trained_models/mech_600k_full \
    --no-samples 4 --correction-mode xt --n-correction 3 --m-correction 3 || true
  for d in trained_models/mech_600k_full/evaluation*; do
    grep -q '"correction_mode": "xt"' "$d/eval_settings.json" 2>/dev/null || continue
    dst="results/mech_600k_full/evaluation_corr"
    i=0; while [ -e "$dst" ]; do i=$((i+1)); dst="results/mech_600k_full/evaluation_corr_$i"; done
    mkdir -p "$(dirname "$dst")"; cp -r "$d" "$dst"
    find "$dst" -name "sample_*" -type d -exec rm -rf {} + 2>/dev/null
  done
  rm -rf results/mech_600k/evaluation_corr_deferred
  git add -A results/mech_600k_full results/mech_600k 2>/dev/null
  git commit -q -m "Mechanics 600k-full: CoCoGen xt-correction ablation" || true
fi

git add -A results/ 2>/dev/null
git commit -q -m "Round-5 master chain: final evidence persist" || true
log "master chain complete ($(remaining)s to spare)"
