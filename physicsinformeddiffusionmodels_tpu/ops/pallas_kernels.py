"""Pallas TPU kernels for the hot elementwise/normalization path.

``group_norm_film_silu`` fuses the reference's per-ResnetBlock sequence
conv -> GroupNorm -> FiLM scale-shift -> SiLU (`/root/reference/src/
unet_model.py:223-241`) minus the conv into ONE bandwidth-optimal pass:
the input is read once from HBM, per-group statistics are computed on-chip,
and the normalized/affine/SiLU result is written once. Under XLA this is a
reduce kernel plus a separate elementwise kernel (two reads of x); the
fused kernel halves HBM traffic for the op, which is what matters — the op
is bandwidth-bound, not FLOP-bound.

A custom VJP keeps training fast: the backward pass is a second Pallas
kernel that recomputes the normalization from the saved input (one extra
read instead of saving the activations) and emits dx plus the parameter
cotangents' per-batch partial sums.

Used on TPU; on CPU/GPU the module falls back to plain jnp (identical
numerics, verified by tests/test_pallas.py in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_impl(x, gamma, beta, scale, shift, groups: int, eps: float):
    """Plain-XLA implementation (also the CPU/GPU fallback)."""
    b = x.shape[0]
    c = x.shape[-1]
    xg = x.reshape(b, -1, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    y = xn * gamma + beta
    y = y * (scale[:, None, :] + 1.0) + shift[:, None, :] if scale is not None else y
    return y * jax.nn.sigmoid(y)



def _group_sum(v, groups: int, cg: int, c: int):
    """Per-channel group sums: v [k, C] -> [k, C] where each entry holds the
    sum of v over the channels in its group. A [C, C] block-diagonal 0/1
    matmul — Mosaic-friendly (no lane-dim reshapes) and trivially MXU work.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cg
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cg
    mask = (row == col).astype(v.dtype)
    return jnp.dot(v, mask, preferred_element_type=jnp.float32)


def _choose_bk_tile(b: int, n: int, c: int, itemsize: int = 4) -> tuple[int, int]:
    """Pick (rows-per-grid-step, token-tile).

    Bk amortizes per-grid-step overhead (a (B,) grid at batch 64 spends
    more time in block turnaround than in math). Bk is kept a multiple of 8
    where possible: dynamic sublane slices at non-8-multiple offsets trip a
    Mosaic relayout bug. The token tile bounds the ~12 live fp32
    temporaries; pallas_call raises the scoped-VMEM limit accordingly.
    """
    # bk > 8 trips a super-linear Mosaic stack blow-up (measured 103MB at
    # bk=16 vs <16MB at bk=8 for the same per-row work), so 8 is the cap.
    # bk must also be a multiple of 8 or the whole batch so the (Bk, C)
    # FiLM blocks satisfy the sublane tiling rule; study batches are
    # 64/16 (darcy) and 6/4 (mechanics), giving 8 / 8 / 6 / 4.
    bk = 8 if b % 8 == 0 else b
    tile = next((t for t in (512, 256, 128) if n % t == 0), n)
    while bk * tile * c * 4 * 12 > 6 * 2**20 and tile > 128 and tile % 2 == 0:
        tile //= 2
    return bk, tile


def _fwd_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
                s1_ref, s2_ref,
                *, groups: int, eps: float, n: int, c: int, bk: int, tile: int):
    """One grid step = ``bk`` batch rows: x block is [Bk, N, C].

    Token-tiled internally so live fp32 temporaries are bounded (a full-N
    working set blows the 16MB scoped VMEM limit at fp32 level-1 shapes);
    the x block itself is VMEM-resident, so tile re-reads cost nothing in
    HBM traffic.
    """
    cg = c // groups
    n_tiles = n // tile

    # accumulate in VMEM scratch (loop-carried vectors trip a Mosaic
    # relayout bug for replicated-offset layouts)
    s1_ref[:] = jnp.zeros((bk, c), jnp.float32)
    s2_ref[:] = jnp.zeros((bk, c), jnp.float32)

    def stats_body(j, _):
        xt = x_ref[:, pl.ds(j * tile, tile), :].astype(jnp.float32)
        s1_ref[:] += jnp.sum(xt, axis=1)
        s2_ref[:] += jnp.sum(xt * xt, axis=1)
        return 0

    jax.lax.fori_loop(0, n_tiles, stats_body, 0)
    denom = float(n * cg)
    mean_c = _group_sum(s1_ref[:], groups, cg, c) / denom   # [Bk, C]
    var_c = _group_sum(s2_ref[:], groups, cg, c) / denom - mean_c * mean_c
    inv_c = jax.lax.rsqrt(var_c + eps)
    # Fold GN affine + FiLM into a single per-channel multiply-add: y = x*a + b.
    gamma = gamma_ref[:].astype(jnp.float32)         # [1, C]
    sc1 = scale_ref[:] + 1.0                         # [Bk, C] (fp32 block)
    a = (inv_c * gamma * sc1)[:, None, :]
    bb = ((beta_ref[:].astype(jnp.float32) - mean_c * inv_c * gamma) * sc1
          + shift_ref[:])[:, None, :]

    def out_body(j, _):
        sl = pl.ds(j * tile, tile)
        xt = x_ref[:, sl, :].astype(jnp.float32)
        y = xt * a + bb
        o_ref[:, sl, :] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, out_body, 0)


def _specs(b, n, c, bk):
    """in_specs for (x, gamma, beta, scale, shift) with grid (B // Bk,).

    FiLM scale/shift are fp32 (Bk, C) blocks — valid because the chooser
    keeps Bk a multiple of 8 or equal to B, satisfying the TPU sublane
    block-tiling rule.
    """
    blk = lambda i: (i, 0, 0)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    return [
        pl.BlockSpec((bk, n, c), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, c), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, c), row, memory_space=pltpu.VMEM),
    ]


def _fwd_call(x, gamma, beta, scale, shift, groups, eps, interpret):
    b, n, c = x.shape
    bk, tile = _choose_bk_tile(b, n, c, x.dtype.itemsize)
    kern = functools.partial(
        _fwd_kernel, groups=groups, eps=eps, n=n, c=c, bk=bk, tile=tile
    )
    return pl.pallas_call(
        kern,
        grid=(b // bk,),
        in_specs=_specs(b, n, c, bk),
        out_specs=pl.BlockSpec((bk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(
        x,
        gamma.reshape(1, c),
        beta.reshape(1, c),
        # fp32 so the kernels' dynamic per-row loads are tile-aligned for
        # any batch index (bf16 packs 2 rows per 32-bit sublane)
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gn_film_silu_pallas(x, gamma, beta, scale, shift, groups, eps, interpret):
    return _fwd_call(x, gamma, beta, scale, shift, groups, eps, interpret)


def _gn_fwd(x, gamma, beta, scale, shift, groups, eps, interpret):
    y = _fwd_call(x, gamma, beta, scale, shift, groups, eps, interpret)
    return y, (x, gamma, beta, scale, shift)


def _gn_bwd(groups, eps, interpret, res, dy):
    """Backward in plain XLA.

    A Pallas backward was tried and measured SLOWER than XLA's fusion of
    the same math (1.08ms vs ~0.4ms per level-1 block on v5e): the
    three-pass token-tiled recompute is VPU/loop-overhead-bound, while XLA
    emits two well-pipelined fusions. The forward stays a fused Pallas
    kernel (single HBM pass); the backward recomputes the normalization
    statistics from the saved input.
    """
    x, gamma, beta, scale, shift = res
    b, n, c = x.shape
    xf = x.astype(jnp.float32)
    groups_ = groups
    xg = xf.reshape(b, n, groups_, c // groups_)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = ((xg - mean) * inv).reshape(b, n, c)

    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    sc1 = scale.astype(jnp.float32)[:, None, :] + 1.0
    sh = shift.astype(jnp.float32)[:, None, :]
    pre_film = xhat * gamma32 + beta32
    z = pre_film * sc1 + sh
    sig = jax.nn.sigmoid(z)
    dz = dy.astype(jnp.float32) * (sig * (1.0 + z * (1.0 - sig)))

    dshift = jnp.sum(dz, axis=1)
    dscale = jnp.sum(dz * pre_film, axis=1)
    dyn = dz * sc1
    dgamma = jnp.sum(dyn * xhat, axis=(0, 1))
    dbeta = jnp.sum(dyn, axis=(0, 1))

    dxhat = dyn * gamma32
    dg = dxhat.reshape(b, n, groups_, c // groups_)
    xg_hat = xhat.reshape(b, n, groups_, c // groups_)
    t1 = jnp.sum(dg, axis=(1, 3), keepdims=True)
    t2 = jnp.sum(dg * xg_hat, axis=(1, 3), keepdims=True)
    denom = n * (c // groups_)
    dxg = inv * (dg - (t1 + xg_hat * t2) / denom)
    dx = dxg.reshape(b, n, c).astype(x.dtype)
    return (
        dx,
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


_gn_film_silu_pallas.defvjp(_gn_fwd, _gn_bwd)


def group_norm_film_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    groups: int = 8,
    eps: float = 1e-5,
    force_pallas: Optional[bool] = None,
) -> jax.Array:
    """Fused GroupNorm -> FiLM (x*(scale+1)+shift) -> SiLU.

    x: [B, ..., C] (any spatial shape); gamma/beta: [C]; scale/shift: [B, C]
    or None.

    Default is the plain-XLA path everywhere (``force_pallas=True`` opts
    into the Pallas kernel). Measured on v5e at the Darcy level-0 shape
    ([64, 4096, 32]): XLA fuses this op chain into its conv pipeline in the
    conv emitter's preferred (batch-in-lanes) layout at +58 us per block,
    while the Pallas kernel's fixed {2,1,0} layout forces relayout copies
    on every kernel boundary — a full ResnetBlock measures 433 us (XLA GN)
    vs 1695 us (Pallas GN) in scan context (scripts/profile_conv2.py).
    The kernel remains for narrow standalone uses where no conv neighbors
    dictate layout.
    """
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    use_pallas = bool(force_pallas) and jax.default_backend() == "tpu"
    no_film = scale is None
    if no_film:
        scale = jnp.zeros((b, c), x.dtype)
        shift = jnp.zeros((b, c), x.dtype)
    else:
        scale = scale.reshape(b, c).astype(x.dtype)
        shift = shift.reshape(b, c).astype(x.dtype)
    if not use_pallas:
        y = _reference_impl(
            x.reshape(b, -1, c), gamma, beta,
            None if no_film else scale, None if no_film else shift,
            groups, eps,
        )
        return y.reshape(orig_shape)
    xf = x.reshape(b, -1, c)
    y = _gn_film_silu_pallas(
        xf, gamma.astype(x.dtype), beta.astype(x.dtype), scale, shift,
        groups, eps, False,
    )
    return y.reshape(orig_shape)
