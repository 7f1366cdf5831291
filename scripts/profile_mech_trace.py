"""Per-op device trace of the MECHANICS train step (VERDICT r4 ask #4).

The mechanics flagship (UNet dim=128, batch 6, FEM residual loss;
`/root/reference/main.py:102-109`, `residuals_mechanics_K.py:166-274`)
measures 19.5 ms/step at 24.5% MFU against a 94.9% padding ceiling
(docs/PERF_WALL.md) — a ~3.9x gap that, unlike Darcy's, is NOT structurally
capped. This script attributes that gap: it traces 10 steps of the real
train step on the TPU, aggregates device-op durations, and rolls them up by
category (conv / fusion / copy / pallas / other) so the top non-MXU costs
are named instead of argued by analogy.

Writes the table to stdout AND --out (default results/profile/mech_trace.txt)
for committing as evidence.

Usage: python scripts/profile_mech_trace.py [--fp32-head] [--batch 6]
"""

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()
import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual
from physicsinformeddiffusionmodels_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from train_mechanics import build_mech_model, build_mechanics_loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--fp32-head", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="results/profile/mech_trace.txt")
    args = ap.parse_args()

    cfg = RunConfig(gov_eqs="mechanics", fp32_head=args.fp32_head)
    B, P = args.batch, cfg.pixels_per_dim
    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=P)
    model = build_mech_model(cfg)
    loss_fn = build_mechanics_loss_fn(model, sched, mech, cfg)

    batch = jax.random.normal(jax.random.key(0), (B, P + 1, P + 1, 10))
    params = model.init(
        jax.random.key(1), jnp.zeros((1, P, P, 10)), jnp.zeros((1,), jnp.int32)
    )
    tx = make_optimizer(cfg.lr)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx)

    key = jax.random.key(2)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux.loss)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux.loss)
    wall_ms = (time.perf_counter() - t0) / args.reps * 1e3

    logdir = "/tmp/jaxtrace_mech"
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            key, k = jax.random.split(key)
            state, aux = step(state, batch, k)
        jax.block_until_ready(aux.loss)

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in events:
        agg[e.get("name", "")] += e.get("dur", 0)
        cnt[e.get("name", "")] += 1

    lines = [
        f"mech train step: wall {wall_ms:.2f} ms/iter  batch={B}  "
        f"fp32_head={args.fp32_head}  device={jax.devices()[0].device_kind}",
        "",
        "top ops (ms/iter, device time):",
    ]
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        lines.append(f"{dur/args.reps/1e3:9.3f} ms  x{cnt[name]:4d}  {name[:120]}")

    cats = defaultdict(float)
    for name, dur in agg.items():
        if name.startswith("$") or "PjitFunction" in name or name.startswith("jit_") \
                or "Arguments" in name:
            continue
        if "LinearAttentionBlock" in name or "pallas" in name.lower():
            cat = "pallas"
        elif name.startswith("copy") or name.startswith("bitcast"):
            cat = "copy"
        elif "convolution" in name:
            cat = "conv"
        elif "fusion" in name:
            cat = "fusion"
        elif "all-reduce" in name or "reduce-scatter" in name:
            cat = "collective"
        else:
            cat = "other"
        cats[cat] += dur
    lines.append("")
    lines.append("category rollup (ms/iter):")
    total = 0.0
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {cat:12s} {dur/args.reps/1e3:8.3f}")
        total += dur
    lines.append(f"  {'SUM':12s} {total/args.reps/1e3:8.3f}")

    text = "\n".join(lines) + "\n"
    print(text)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
