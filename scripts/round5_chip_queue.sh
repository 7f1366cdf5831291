#!/bin/bash
# Round-5 chip agenda, in priority order (see VERDICT.md round-3/4 asks).
# Run from the repo root at round start:
#   nohup bash scripts/round5_chip_queue.sh > /tmp/r5queue.log 2>&1 &
#   echo $! > /tmp/r5queue.pid
#
# Each stage regenerates missing data, trains/evaluates on the chip,
# persists evidence into git-tracked results/ and commits — so a crash at
# any point loses at most the in-flight stage. Stages are skipped when
# their results directory already exists (safe to re-run).
#
# Ops invariants (docs/OPERATIONS.md): 1-core box -> pin BLAS threads for
# host jobs; trained_models/ and data/ are wiped at round boundaries ->
# never let a README claim rest on them; chip is tunneled -> first compile
# of a big program can block ~8 min with low CPU (not a hang).
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
HOSTENV="OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1"

# A stage is done only when its persisted metrics reached the target
# iteration — the insurance watcher writes summary.json for PARTIAL runs
# every 15 min, so summary existence alone would skip a half-trained model
# after a mid-stage crash. A committed partial run is continued via the
# resume hook below, not skipped.
stage_done() {  # $1 = run name, $2 = target iteration
  [ -f "results/$1/summary.json" ] && \
    awk -F, -v t="$2" 'NR>1 && $1+0 >= t {f=1} END {exit !f}' \
      "results/$1/metrics.csv" 2>/dev/null
}
# continue a committed partial run when trained_models/ was wiped. Only a
# full-state resume/ export qualifies (params+EMA+optimizer); the portable
# f16 EMA-only checkpoint is for evaluation, never for resuming training.
restore_resume() {  # $1 = run name
  if [ ! -d "trained_models/$1" ] && [ -d "results/$1/resume/model" ]; then
    mkdir -p "trained_models/$1"
    cp -r "results/$1/resume"/* "trained_models/$1/"
    [ -f "results/$1/metrics.csv" ] && \
      cp "results/$1/metrics.csv" "trained_models/$1/metrics.csv"
  fi
}
persist_and_commit() {  # $1 = run name, $2 = commit message
  python scripts/export_portable_checkpoint.py --model-dir "trained_models/$1" \
    --out "results/$1/portable" || true
  python scripts/persist_results.py "$1"
  git add "results/$1" && git commit -q -m "$2"
}

# ---- stage 0: data ---------------------------------------------------------
if [ ! -f data/darcy/train/K_data.csv ]; then
  log "stage 0a: regenerating Darcy data (10k train / 256 valid, ~13 min)"
  env $HOSTENV python scripts/generate_darcy_data.py --n-samples 10000 --out ./data/darcy/train
  env $HOSTENV python scripts/generate_darcy_data.py --n-samples 256 --out ./data/darcy/valid
fi
if [ ! -d data/mechanics/test/test_level_2/fields ]; then
  log "stage 0b: regenerating mechanics sets (TPU SIMP, ~35 min)"
  timeout 3600 python scripts/generate_mechanics_sets.py
fi

# ---- stage 1: Darcy cosine 300k A/B (drift fix) ----------------------------
# VERDICT r3 #2: done = a 300k checkpoint whose sampled residual <= the 40k
# value (~2.8e-2), or ablation data. Constant-lr root cause: docs/DARCY_DRIFT.md.
# "Done" requires the run to have actually REACHED 300k — a round-4 partial
# run persists its evidence (and a full resume checkpoint under
# results/darcy_300k_cosine/resume/) without finishing.
cosine_reached() {
  [ -f results/darcy_300k_cosine/metrics.csv ] && \
    awk -F, 'NR>1 && $1+0 >= 300000 {found=1} END {exit !found}' \
      results/darcy_300k_cosine/metrics.csv
}
if ! cosine_reached; then
  log "stage 1: darcy cosine 300k (~2.4 h)"
  # continue a committed partial run if one exists (full state incl. optimizer)
  if [ -d results/darcy_300k_cosine/resume ] && [ ! -d trained_models/darcy_300k_cosine ]; then
    mkdir -p trained_models/darcy_300k_cosine
    cp -r results/darcy_300k_cosine/resume/* trained_models/darcy_300k_cosine/
  fi
  timeout 12600 python train.py --gov-eqs darcy --name darcy_300k_cosine \
    --iterations 300000 --lr-schedule cosine --chunk-steps 20 \
    --sample-freq 20000 --no-samples 8 --resume
  # n>=64 headline evals (VERDICT r3 #3) at the drift-critical steps
  for st in 40000 100000 300000; do
    [ -f trained_models/darcy_300k_cosine/model/checkpoint_${st}.msgpack ] && \
      timeout 900 python sample_eval.py --model-dir trained_models/darcy_300k_cosine \
        --step $st --no-samples 64
  done
  persist_and_commit darcy_300k_cosine \
    "Darcy cosine-lr 300k A/B: n=64 sampled-residual evals at 40k/100k/300k"
fi

# ---- stage 1b: dtype A/B third arm (fp32 head), if round 4 didn't finish it -
# docs/DARCY_DRIFT.md: the interventional bf16/fp32/fp32-head arms resumed
# from the cosine it-100k checkpoint. round4d/e chains run these; rerun here
# only if their evidence is missing.
if [ ! -f results/darcy_ab_fp32head/summary.json ] && \
   [ -f trained_models/darcy_300k_cosine/model/checkpoint_100000.msgpack ]; then
  log "stage 1b: fp32-head A/B arm (~30 min)"
  bash scripts/round4e_chain.sh
fi

# ---- stage 1c: THE FIX AT FULL BUDGET — Darcy 300k with --fp32-head --------
# The round-4 evidence chain (drift real under two lr schedules; bf16
# residual-gradient decorrelation; fp32 head restores gradient fidelity at
# bf16 speed) predicts this run's 300k endpoint holds the ~3e-2 residual.
# This is VERDICT r3 #2's "done" criterion: a 300k checkpoint whose sampled
# residual <= the 40k value.
head300k_reached() {
  [ -f results/darcy_300k_fp32head/metrics.csv ] && \
    awk -F, 'NR>1 && $1+0 >= 300000 {found=1} END {exit !found}' \
      results/darcy_300k_fp32head/metrics.csv
}
if ! head300k_reached; then
  log "stage 1c: darcy 300k with fp32 head (~2.5 h)"
  restore_resume darcy_300k_fp32head
  timeout 12600 python train.py --gov-eqs darcy --name darcy_300k_fp32head \
    --iterations 300000 --lr-schedule cosine --fp32-head --chunk-steps 20 \
    --sample-freq 20000 --no-samples 8 --resume
  for st in 40000 100000 200000 300000; do
    [ -f trained_models/darcy_300k_fp32head/model/checkpoint_${st}.msgpack ] && \
      timeout 900 python sample_eval.py --model-dir trained_models/darcy_300k_fp32head \
        --step $st --no-samples 64
  done
  JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 timeout 5400 python scripts/diagnose_darcy_drift.py \
    --model-dir trained_models/darcy_300k_fp32head \
    --out trained_models/darcy_300k_fp32head/drift_diagnosis.json || true
  persist_and_commit darcy_300k_fp32head \
    "Darcy 300k with fp32 head: full-budget drift-fix demonstration, n=64 evals"
fi

# ---- stage 2: DDIM sample-estimation at depth (VERDICT r3 #8) --------------
if ! stage_done darcy_sample_100k 100000; then
  restore_resume darcy_sample_100k
  log "stage 2: DDIM sample-estimation 100k (~50 min)"
  timeout 5400 python train.py --gov-eqs darcy --name darcy_sample_100k \
    --iterations 100000 --x0-estimation sample \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  timeout 900 python sample_eval.py --model-dir trained_models/darcy_sample_100k --no-samples 64
  persist_and_commit darcy_sample_100k \
    "DDIM sample-estimation at 100k: n=64 eval evidence"
fi

# ---- stage 3: guided retrain at depth (VERDICT r3 #4 follow-through) -------
if ! stage_done darcy_guided_100k 100000; then
  restore_resume darcy_guided_100k
  log "stage 3: residual-grad-guidance 100k (~50 min)"
  timeout 5400 python train.py --gov-eqs darcy --name darcy_guided_100k \
    --iterations 100000 --residual-grad-guidance \
    --chunk-steps 20 --sample-freq 20000 --no-samples 8 --resume
  # operating-point eval (scale 1.0, docs/GUIDANCE_DIAGNOSIS.md) + reference default
  timeout 900 python sample_eval.py --model-dir trained_models/darcy_guided_100k \
    --no-samples 64 --guidance-scale 1.0
  timeout 900 python sample_eval.py --model-dir trained_models/darcy_guided_100k \
    --no-samples 64 --guidance-scale 3.0
  persist_and_commit darcy_guided_100k \
    "Guided 100k: n=64 evals at scale 1.0 (operating point) and 3.0 (reference default)"
fi

# ---- stage 4: mechanics inference-time ablations on the committed 600k ----
# Uses the PORTABLE checkpoint under results/ (survives the boundary);
# cheap chip work: correction + dynamic-threshold levers against the OOD tail.
# done-guard greps RECURSIVELY under results/mech_600k: the ablation's
# eval dir lands under portable/evaluation* until the move below relocates
# it, so a path-anchored glob would never see it and the ~1h ablation would
# re-run on every queue invocation (round-4 advisor finding). The guard also
# requires a metric CSV next to the settings file so a crashed eval (which
# now leaves only eval_settings.json.pending) never satisfies it.
mech_xt_done() {
  local f
  for f in $(grep -rl '"correction_mode": "xt"' results/mech_600k 2>/dev/null \
               --include=eval_settings.json); do
    ls "$(dirname "$f")"/*/metrics_*.csv >/dev/null 2>&1 && return 0
    ls "$(dirname "$f")"/*.csv >/dev/null 2>&1 && return 0
  done
  return 1
}
if [ -d results/mech_600k/portable ] && ! mech_xt_done; then
  log "stage 4: mechanics OOD-tail inference ablations"
  timeout 3600 python sample_eval.py --model-dir results/mech_600k/portable \
    --no-samples 8 --correction-mode xt --n-correction 3 --m-correction 3
  timeout 900 python scripts/diagnose_ood_tail.py --model-dir results/mech_600k/portable || true
  # relocate the eval out of portable/ and prune per-sample field dumps
  # before committing (persist_results.py's filtering, as round4b did)
  for d in results/mech_600k/portable/evaluation*; do
    [ -d "$d" ] || continue
    i=0; dst="results/mech_600k/evaluation_corr"
    while [ -e "$dst" ]; do i=$((i+1)); dst="results/mech_600k/evaluation_corr_$i"; done
    mv "$d" "$dst"
    find "$dst" -name "sample_*" -type d -exec rm -rf {} + 2>/dev/null
  done
  git add results/mech_600k && git commit -q -m "Mechanics 600k: CoCoGen-correction ablation on the OOD sweep"
fi

# ---- stage 4b: mechanics at the FULL 600k reference budget ------------------
# Round-4 evidence reaches it-200k (results/mech_600k, portable at it-100k);
# no full resume state survived the boundary, so this is a fresh run (~4 h,
# /root/reference/main.py:102-109 budget). --fp32-head applies the Darcy
# drift fix (same stencil amplification of bf16 output noise in the FEM
# residual). Full-state checkpoints are ~2 GB — NOT committable; the watcher
# persists metrics only, and the portable f16 EMA export lands at the end.
if ! stage_done mech_600k_full 600000; then
  log "stage 4b: mechanics 600k full budget (~4 h)"
  ( while sleep 900; do
      [ -d trained_models/mech_600k_full ] || continue
      python scripts/persist_results.py mech_600k_full >/dev/null 2>&1 || true
      git add results/mech_600k_full >/dev/null 2>&1 && \
        git commit -q -m "Persist mech_600k_full evidence" || true
    done ) & MW_PID=$!
  timeout -s TERM 18000 python train_mechanics.py --name mech_600k_full \
    --iterations 600000 --chunk-steps 20 --fp32-head --resume
  kill "$MW_PID" 2>/dev/null || true
  timeout 5400 python sample_eval.py --model-dir trained_models/mech_600k_full --no-samples 4
  timeout 900 python scripts/diagnose_ood_tail.py --model-dir trained_models/mech_600k_full || true
  persist_and_commit mech_600k_full \
    "Mechanics trained to the full 600k reference budget: 2-level sweep + OOD report"
fi

# ---- stage 5: bench recapture ----------------------------------------------
log "stage 5: bench"
python bench.py || true
python scripts/persist_results.py --all || true
git add results/ && git commit -q -m "Round-5 queue: final evidence persist" || true
log "queue complete"
