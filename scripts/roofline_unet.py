"""Analytic MXU roofline for the flagship Darcy train step.

Answers VERDICT r3 weak #5's alternative: *a committed measurement of why
the MFU wall is real*. The measured wall (BENCH_r03: 9.2% of v5e bf16 peak)
is dominated by an architectural property of the reference model, not by a
missing kernel: the reference UNet (`/root/reference/unet_model.py`, dim=32,
dim_mults 1/2/4/8) spends most of its conv FLOPs at 32 and 64 output
channels, while the TPU MXU contracts onto 128 lanes — a conv with
C_out=32 can use at most 32/128 = 25% of the systolic array regardless of
scheduling. This script makes that argument quantitative:

  1. builds the exact benched train step (bench.build_darcy: UNet fwd,
     FD Darcy residual, data+residual loss, backward, Adam+EMA),
  2. lowers it to StableHLO (shape inventory is backend-independent),
  3. inventories every convolution / dot_general with its M/K/N mapping
     onto the MXU,
  4. computes each op's lane/sublane padding ceiling
     util <= min(K,128)/128 * min(N,128)/128
     and the FLOP-weighted ceiling over the whole step.

The FLOP-weighted ceiling is the MFU the step could reach if every matmul
ran at the MXU's padded-issue rate with zero memory/elementwise time; the
gap between it and the measured MFU is the (bandwidth + fusion) share.

Usage:  JAX_PLATFORMS=cpu python scripts/roofline_unet.py [--batch 64]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

MXU_LANES = 128  # systolic array width (output-feature lanes)
MXU_DEPTH = 128  # contraction depth per pass
V5E_BF16_PEAK = 197e12


def _shape(t: str) -> list[int]:
    """'tensor<64x66x66x32xbf16>' -> [64, 66, 66, 32]."""
    m = re.match(r"tensor<([0-9x]+)x[a-z0-9]+>", t)
    if not m:
        return []
    return [int(d) for d in m.group(1).split("x") if d]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def conv_mkn(kernel_spec: str, kshape: list[int], oshape: list[int],
             groups: int) -> tuple[int, int, int]:
    """Map a convolution onto the MXU matmul M×K×N.

    kernel_spec like '[0, 1, i, o]' (StableHLO dim order of the rhs);
    K = spatial_taps * C_in/groups (contraction), N = C_out/groups (lanes),
    M = all output elements / C_out (rows).
    """
    dims = [d.strip() for d in kernel_spec.strip("[]").split(",")]
    size_i = size_o = 1
    spatial = 1
    for name, size in zip(dims, kshape):
        if name == "i":
            size_i = size
        elif name == "o":
            size_o = size
        else:
            spatial *= size
    k = spatial * size_i
    n = size_o  # per group; groups tile the lane dim independently
    m = _prod(oshape) // max(size_o * groups, 1)
    return m, k, n


def parse_stablehlo(text: str):
    """Yield (kind, M, K, N, flops) for every conv / dot_general."""
    ops = []
    # stablehlo.convolution ... dim_numbers = [b,0,1,f]x[0,1,i,o]->[b,0,1,f],
    #   ... : (tensor<...>, tensor<...>) -> tensor<...>
    conv_re = re.compile(
        r"stablehlo\.convolution.*?dim_numbers\s*=\s*\[[^\]]*\]x(\[[^\]]*\])->"
        r".*?(?:feature_group_count\s*=\s*(\d+))?[^:]*:\s*"
        r"\((tensor<[^>]+>),\s*(tensor<[^>]+>)\)\s*->\s*(tensor<[^>]+>)"
    )
    for m in conv_re.finditer(text):
        kspec, groups, _lhs, rhs, out = m.groups()
        g = int(groups or 1)
        kshape, oshape = _shape(rhs), _shape(out)
        if not kshape or not oshape:
            continue
        mm, kk, nn = conv_mkn(kspec, kshape, oshape, g)
        flops = 2 * mm * kk * nn * g
        ops.append(("conv", mm, kk, nn, flops))

    # stablehlo.dot_general compact form:
    #   dot_general %a, %b, [batching_dims = [..] x [..],]
    #   contracting_dims = [..] x [..] ... : (tensor<>, tensor<>) -> tensor<>
    dot_re = re.compile(
        r"stablehlo\.dot_general\s+%\S+,\s+%\S+,"
        r"(?:\s*batching_dims\s*=\s*(\[[^\]]*\])\s*x\s*(\[[^\]]*\]),)?"
        r"\s*contracting_dims\s*=\s*(\[[^\]]*\])\s*x\s*(\[[^\]]*\])"
        r"[^:]*:\s*\((tensor<[^>]+>),\s*(tensor<[^>]+>)\)\s*->\s*(tensor<[^>]+>)"
    )
    def _dims(s):
        s = (s or "").strip("[]").strip()
        return [int(x) for x in s.split(",")] if s else []
    for m in dot_re.finditer(text):
        lb, rb, lc, rc, lhs, rhs, out = m.groups()
        lshape, rshape, oshape = _shape(lhs), _shape(rhs), _shape(out)
        if not lshape or not rshape or not oshape:
            continue
        kk = _prod(lshape[i] for i in _dims(lc))
        batch = _prod(lshape[i] for i in _dims(lb))
        rhs_free = [i for i in range(len(rshape))
                    if i not in _dims(rc) and i not in _dims(rb)]
        nn = _prod(rshape[i] for i in rhs_free)
        mm = _prod(oshape) // max(nn * batch, 1)
        flops = 2 * batch * mm * kk * nn
        ops.append(("dot", mm, kk, nn, flops))
    return ops


def build_step(study: str, batch: int, pixels: int):
    """The exact benched train step (bench.py's builders) + a sample batch."""
    if study == "darcy":
        from bench import build_darcy

        state, train_step, _res, _loss, _tx = build_darcy(
            batch, pixels, jnp.bfloat16
        )
        x = jax.random.normal(jax.random.key(1), (batch, pixels, pixels, 2))
        return state, train_step, x
    # mechanics: the conditional study step (UNet dim=128, FEM residual),
    # mirroring bench.measure_mechanics exactly
    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from train_mechanics import build_mech_model, build_mechanics_loss_fn

    cfg = RunConfig(
        gov_eqs="mechanics", train_batch_size=batch,
        c_residual=1e-3, c_ineq=1e-3, lambda_opt=1e-6,
    )
    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=cfg.pixels_per_dim)
    model = build_mech_model(cfg)
    P = cfg.pixels_per_dim
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, P, P, cfg.model_channels)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(cfg.lr, cfg.grad_clip)
    state = create_train_state(params, tx)
    loss_fn = build_mechanics_loss_fn(model, sched, mech, cfg)
    x = jax.random.normal(jax.random.key(1), (batch, P + 1, P + 1, 10))
    return state, make_train_step(loss_fn, tx), x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", default="darcy", choices=["darcy", "mechanics"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--pixels", type=int, default=64)
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 64 if args.study == "darcy" else 6

    state, train_step, x = build_step(args.study, args.batch, args.pixels)
    key = jax.random.key(2)
    lowered = train_step.lower(state, x, key)
    text = lowered.as_text()

    ops = parse_stablehlo(text)
    if not ops:
        print("no conv/dot ops parsed — lowering dialect changed?", file=sys.stderr)
        sys.exit(1)

    # Bucket by (kind, K, N) — the padding signature — and report.
    buckets: dict = defaultdict(lambda: [0, 0])  # -> [count, flops]
    for kind, mm, kk, nn, flops in ops:
        buckets[(kind, kk, nn)][0] += 1
        buckets[(kind, kk, nn)][1] += flops

    total_flops = sum(f for _, _, _, _, f in ops)
    weighted_inv = 0.0
    rows = []
    for (kind, kk, nn), (count, flops) in sorted(
        buckets.items(), key=lambda it: -it[1][1]
    ):
        ceil = min(kk, MXU_DEPTH) / MXU_DEPTH * min(nn, MXU_LANES) / MXU_LANES
        weighted_inv += flops / ceil
        rows.append((kind, kk, nn, count, flops, ceil))

    print(f"{'kind':5} {'K':>6} {'N':>6} {'#ops':>5} {'GFLOP':>9} "
          f"{'%step':>6} {'MXU ceil':>8}")
    for kind, kk, nn, count, flops, ceil in rows:
        print(f"{kind:5} {kk:>6} {nn:>6} {count:>5} {flops/1e9:>9.2f} "
              f"{100*flops/total_flops:>5.1f}% {100*ceil:>7.1f}%")

    weighted_ceiling = total_flops / weighted_inv
    ideal_ms = weighted_inv / V5E_BF16_PEAK * 1e3
    print(f"\nmatmul/conv FLOPs per step: {total_flops/1e9:.2f} GFLOP")
    print(f"FLOP-weighted MXU padding ceiling: {100*weighted_ceiling:.1f}% of peak")
    print(f"=> pure-MXU lower bound for the step: {ideal_ms:.2f} ms "
          f"(v5e bf16 {V5E_BF16_PEAK/1e12:.0f} TFLOP/s)")
    print("Everything above that bound is bandwidth/elementwise/fusion time;")
    print("compare with the measured step in BENCH_r0*.json.")


if __name__ == "__main__":
    main()
