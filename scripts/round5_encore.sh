#!/bin/bash
# Round-5 encore — opportunistic chip work after the takeover chain exits.
# Launch alongside the takeover chain; it sleeps until that chain's pid
# dies, then spends whatever chip time remains (before CHAIN_DEADLINE) on:
#   E1  CoCoGen xt-correction ablation on mech_600k_full (the ablation
#       deferred since round 4 — replaces the marker with real output)
#   E2  big-tile attention compile validation at the mechanics shapes
#       (H=256 -> tile 2048), the one blocker for flipping the default cap
#
# Usage: nohup bash scripts/round5_encore.sh > /tmp/r5_encore.log 2>&1 &
#        echo $! > /tmp/r5_encore.pid
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%H:%M:%S) $*"; }
export PIDM_COMPILE_CACHE=/root/.pidm_xla_cache
export JAX_COMPILATION_CACHE_DIR=/root/.pidm_xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

CHAIN_DEADLINE=${CHAIN_DEADLINE:-1787271600}
remaining() { echo $(( CHAIN_DEADLINE - $(date +%s) )); }
TAKEOVER_PID=$(cat /tmp/r5_takeover.pid 2>/dev/null || echo 0)

log "waiting for takeover chain (pid $TAKEOVER_PID) to finish"
while kill -0 "$TAKEOVER_PID" 2>/dev/null; do sleep 60; done
log "chip free ($(remaining)s to deadline)"

# ---- E1: xt-correction ablation (round-4 deferred item) --------------------
if [ "$(remaining)" -gt 2700 ] && [ -d trained_models/mech_600k_full/model ] && \
   ! grep -rq '"correction_mode": "xt"' results/mech_600k_full 2>/dev/null; then
  log "E1: CoCoGen xt-correction ablation on mech_600k_full"
  timeout $(( $(remaining) - 1500 )) python sample_eval.py \
    --model-dir trained_models/mech_600k_full \
    --no-samples 4 --correction-mode xt --n-correction 3 --m-correction 3 || true
  python scripts/persist_results.py mech_600k_full || true
  rm -rf results/mech_600k/evaluation_corr_deferred
  git add -A results/mech_600k_full results/mech_600k 2>/dev/null
  git commit -q -m "Mechanics 600k-full: CoCoGen xt-correction ablation (deferred item closed)" || true
fi

# ---- E2: big-tile compile validation at mechanics shapes -------------------
if [ "$(remaining)" -gt 1500 ] && [ ! -f results/profile/mech_bigtile_probe.txt ]; then
  log "E2: mechanics big-tile attention compile probe"
  timeout 1200 python - <<'EOF' > results/profile/mech_bigtile_probe.txt 2>&1 || true
"""Compile + time the mechanics train step with PIDM_ATTN_TILE_CAP=4096
(H=256 levels tile at 2048 under the VMEM guard) — the hardware
validation that gates making the big-tile cap the global default."""
import time
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.ops import pallas_attention as pa

for cap in (None, 4096):
    pa.set_attention_tile_cap(cap)
    from bench import measure_mechanics
    r = measure_mechanics(steps=15, warmup=3)
    print(f"tile_cap={cap or 'default(512)'}: {r['mech_train_step_ms']} ms/step "
          f"({r['mech_train_samples_per_sec_per_chip']} samples/s/chip)", flush=True)
EOF
  git add results/profile/mech_bigtile_probe.txt 2>/dev/null && \
    git commit -q -m "Mechanics big-tile attention probe: tile-2048 compile + step time on chip" || true
fi

git add -A results/ 2>/dev/null
git commit -q -m "Round-5 encore: final persist" || true
log "encore complete ($(remaining)s to spare)"
