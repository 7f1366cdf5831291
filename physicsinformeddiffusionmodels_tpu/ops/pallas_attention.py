"""Fused spatial linear attention as a Pallas TPU kernel.

The reference's ``SpatialLinearAttention`` (`/root/reference/src/
unet_model.py:269-299`) — q channel-softmaxed, k token-softmaxed,
``context = k^T v``, ``out = context q`` — is FLOP-light but, evaluated as
plain XLA ops, materializes the [B, N, 3·heads·dim_head] qkv tensor and its
softmax'd descendants in HBM (≈5.5 GB of traffic per call at the Darcy
64x64 level-1 shape; measured with XLA cost analysis). This kernel computes
the whole block — qkv projection, both softmaxes, the two contractions, and
the output projection — per batch row in VMEM. HBM traffic drops to
x (read) + out (write) + weights: ~50x less.

Layout: the kernel works channel-major ([C, N] per batch row) so the head
axis lives on sublanes (sublane reshapes/slices are Mosaic-friendly; lane-
axis reshapes are not) and token tiles are lane slices. Token-softmax (k)
normalization is streamed flash-attention style over token tiles: running
max m, normalizer Z, and the rescaled context accumulate in fori_loop
carries.

Backward is a second Pallas kernel implementing the analytic VJP (all
matmuls + softmax VJPs); the only cross-token reduction it needs,
``sum_n(dK' * K')``, collapses to ``rowsum(dctx * ctx)`` because
``ctx = K'^T v``, so no extra streaming pass is required.

Math (per batch b, head h, token n, head-channels d/e):
    q, k, v = x W_q, x W_k, x W_v                        [N, dh] each
    P  = softmax_d(q);  q~ = P * dh^{-1/2}
    K' = softmax_n(k)   (per d, over tokens)
    v~ = v / N
    ctx[d, e] = sum_n K'[n, d] v~[n, e]
    y[n, e]   = sum_d q~[n, d] ctx[d, e]
    o = concat_h(y) W_out + b_out
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Token-tile cap. The kernels loop over [*, tile] slices of the token axis;
# larger tiles mean fewer, bigger matmuls (better MXU pipelining at the
# K=C-starved Darcy shapes) at the price of larger VMEM-live intermediates.
# Default 4096 (whole-row at the 64x64 levels): measured +4.1% on the
# Darcy train step and perf-neutral at the mechanics shapes, both
# compile-validated on a v5e (BENCH_CACHE 2026-08-20,
# results/profile/mech_bigtile_probe.txt). Set PIDM_ATTN_TILE_CAP=512 to
# restore the older tiling. The VMEM guard in _choose_tile bounds the
# per-tile f32 intermediates regardless.
_DEFAULT_TILE_CAP = 4096
_TILE_CAP = int(os.environ.get("PIDM_ATTN_TILE_CAP", str(_DEFAULT_TILE_CAP)))
_TILE_VMEM_BUDGET = 32 * 2**20  # bytes of phase-live f32 intermediates


def set_attention_tile_cap(cap: Optional[int]) -> None:
    """Set the token-tile cap (None restores the default). Takes effect on
    the next trace/compile — rebuild jitted callers after changing it."""
    global _TILE_CAP
    _TILE_CAP = _DEFAULT_TILE_CAP if cap is None else int(cap)


def get_attention_tile_cap() -> int:
    return _TILE_CAP


def _choose_tile(n: int, h: int = 256, c: int = 32) -> int:
    # worst-case phase-live f32 bytes/token across both kernels' bodies:
    # qkv [3H,T] + softmax/cotangent temporaries [~4H,T] + x/dy tiles [~4C,T]
    per_token = (7 * h + 4 * c) * 4
    for t in (4096, 2048, 1024, 512, 256, 128):
        if t <= _TILE_CAP and n % t == 0 and per_token * t <= _TILE_VMEM_BUDGET:
            return t
    return n


# --------------------------------------------------------------------------
# reference (XLA) implementation — CPU/GPU fallback and test oracle
# --------------------------------------------------------------------------


def linear_attention_reference(x, w_qkv, w_out, heads: int, dim_head: int):
    """x: [B, N, C]; w_qkv: [C, 3*H]; w_out: [H, C] with H = heads*dim_head."""
    b, n, c = x.shape
    h = heads * dim_head
    qkv = x @ w_qkv  # [B, N, 3H]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, dim_head)
    k = k.reshape(b, n, heads, dim_head)
    v = v.reshape(b, n, heads, dim_head)
    q = jax.nn.softmax(q, axis=-1) * dim_head**-0.5
    k = jax.nn.softmax(k, axis=1)
    v = v / n
    ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, q)
    return out.reshape(b, n, h) @ w_out



def _mm(a, b, md):
    """MXU matmul in dtype ``md`` (the caller's compute dtype — bf16 runs at
    4x the fp32 MXU rate on v5e) with fp32 accumulation."""
    return jnp.dot(a.astype(md), b.astype(md), preferred_element_type=jnp.float32)


def _dg(a, b, dims, md):
    return jax.lax.dot_general(
        a.astype(md), b.astype(md), dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(xt_ref, wqkv_ref, wout_ref, o_ref,
                *, heads: int, dh: int, n: int, c: int, tile: int):
    """One grid step = one batch row. xt: [1, C, N] channel-major."""
    H = heads * dh
    md = xt_ref.dtype  # matmul dtype follows the caller's compute dtype
    w = wqkv_ref[:]  # [3H, C]
    n_tiles = n // tile
    scale = dh**-0.5

    def kv_tile(i):
        sl = pl.ds(i * tile, tile)
        xtile = xt_ref[0, :, sl]                      # [C, T]
        kT = _mm(w[H:2 * H], xtile, md)
        vT = _mm(w[2 * H:], xtile, md)
        return kT.reshape(heads, dh, tile), vT.reshape(heads, dh, tile)

    # Phase A: streamed token-softmax of k + context accumulation.
    def body_a(i, carry):
        m, z, ctx = carry
        kT, vT = kv_tile(i)
        m_new = jnp.maximum(m, jnp.max(kT, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        ek = jnp.exp(kT - m_new)
        z = z * alpha + jnp.sum(ek, axis=2, keepdims=True)
        ctx = ctx * alpha + _dg(ek, vT, (((2,), (2,)), ((0,), (0,))), md)
        return m_new, z, ctx

    m0 = jnp.full((heads, dh, 1), -jnp.inf, jnp.float32)
    z0 = jnp.zeros((heads, dh, 1), jnp.float32)
    ctx0 = jnp.zeros((heads, dh, dh), jnp.float32)
    m, z, ctx = jax.lax.fori_loop(0, n_tiles, body_a, (m0, z0, ctx0))
    # fold the k normalizer and the v/N scaling into ctx
    ctx = ctx / (z * float(n))                        # [h, d, e]

    wo = wout_ref[:]                                  # [C, H] (transposed W_out)

    # Phase B: q softmax per token + output projection, tile by tile.
    def body_b(i, _):
        sl = pl.ds(i * tile, tile)
        xtile = xt_ref[0, :, sl]
        qT = _mm(w[:H], xtile, md)
        qT = qT.reshape(heads, dh, tile)
        qmx = jnp.max(qT, axis=1, keepdims=True)      # softmax over d (axis 1)
        eq = jnp.exp(qT - qmx)
        p = eq / jnp.sum(eq, axis=1, keepdims=True) * scale
        yT = _dg(ctx, p, (((1,), (1,)), ((0,), (0,))), md)  # [h, e, T]
        oT = _mm(wo, yT.reshape(H, tile), md)
        o_ref[0, :, sl] = oT.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body_b, 0)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(xt_ref, wqkv_ref, wout_ref, dyt_ref,
                dxt_ref, dwqkv_ref, dwout_ref, kt_ref, vt_ref,
                *, heads: int, dh: int, n: int, c: int, tile: int):
    """Analytic VJP. dyt: [1, C, N] cotangent of the kernel output.

    Phase A stashes the k/v projections (f32 scratch) so Phase C reuses
    them instead of re-projecting (as in ``_lab_bwd_kernel``). dW outputs
    are [3H, C] / [C, H] accumulators revisited by every grid step (TPU
    grids run sequentially): initialized at b == 0, accumulated after.
    """
    H = heads * dh
    b_idx = pl.program_id(0)
    md = xt_ref.dtype
    w = wqkv_ref[:]
    wo = wout_ref[:]                                  # [C, H]
    n_tiles = n // tile
    scale = dh**-0.5

    def kv_tile(i):
        sl = pl.ds(i * tile, tile)
        xtile = xt_ref[0, :, sl]
        kT = _mm(w[H:2 * H], xtile, md)
        vT = _mm(w[2 * H:], xtile, md)
        return xtile, kT.reshape(heads, dh, tile), vT.reshape(heads, dh, tile)

    # ---- Phase A: recompute m, z, ctx (as in forward); stash k/v ----
    def body_a(i, carry):
        m, z, ctx = carry
        _, kT, vT = kv_tile(i)
        sl = pl.ds(i * tile, tile)
        kt_ref[:, sl] = kT.reshape(H, tile)
        vt_ref[:, sl] = vT.reshape(H, tile)
        m_new = jnp.maximum(m, jnp.max(kT, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        ek = jnp.exp(kT - m_new)
        z = z * alpha + jnp.sum(ek, axis=2, keepdims=True)
        ctx = ctx * alpha + _dg(ek, vT, (((2,), (2,)), ((0,), (0,))), md)
        return m_new, z, ctx

    m0 = jnp.full((heads, dh, 1), -jnp.inf, jnp.float32)
    z0 = jnp.zeros((heads, dh, 1), jnp.float32)
    ctx0 = jnp.zeros((heads, dh, dh), jnp.float32)
    m, z, ctx_raw = jax.lax.fori_loop(0, n_tiles, body_a, (m0, z0, ctx0))
    zn = z * float(n)
    ctx = ctx_raw / zn                                # normalized context

    # ---- Phase B: q tiles -> dctx, dA (q-path), dW_q, dW_out, partial dx ----
    def body_b(i, carry):
        dctx, dwq, dwout = carry
        sl = pl.ds(i * tile, tile)
        xtile = xt_ref[0, :, sl]
        dytile = dyt_ref[0, :, sl]                    # [C, T]
        qT = _mm(w[:H], xtile, md)
        qT = qT.reshape(heads, dh, tile)
        qmx = jnp.max(qT, axis=1, keepdims=True)
        eq = jnp.exp(qT - qmx)
        P = eq / jnp.sum(eq, axis=1, keepdims=True)   # [h, d, T]
        qt = P * scale
        # y = ctx^T q~ : [h, e, T]
        yT = _dg(ctx, qt, (((1,), (1,)), ((0,), (0,))), md)
        # dW_out += y dyt^T : [C, H] uses (dyt [C,T]) @ (y [H,T])^T
        dwout = dwout + _mm(dytile, yT.reshape(H, tile).T, md)
        # dy (pre out-projection): [H, T] = wo^T dyt
        dyh = _mm(wo.T, dytile, md)
        dyh = dyh.reshape(heads, dh, tile)            # [h, e, T]
        # dq~ = ctx dy : [h, d, T]
        dqt = _dg(ctx, dyh, (((2,), (1,)), ((0,), (0,))), md)
        # dctx += q~ dy^T over tokens: [h, d, e]
        dctx = dctx + _dg(qt, dyh, (((2,), (2,)), ((0,), (0,))), md)
        # softmax (over d) VJP: dA = P ⊙ (s·dq~ - sum_d(s·dq~ ⊙ P))
        g = dqt * scale
        dA = P * (g - jnp.sum(g * P, axis=1, keepdims=True))  # [h, d, T]
        dA2 = dA.reshape(H, tile)
        # dx partial (q path): W_q^T dA -> [C, T]
        dxt_ref[0, :, sl] = _mm(w[:H].T, dA2, md).astype(dxt_ref.dtype)
        # dW_q += dA x^T : [H, C]
        dwq = dwq + _mm(dA2, xtile.T, md)
        return dctx, dwq, dwout

    dctx0 = jnp.zeros((heads, dh, dh), jnp.float32)
    dwq0 = jnp.zeros((H, c), jnp.float32)
    dwout0 = jnp.zeros((c, H), jnp.float32)
    dctx, dwq, dwout = jax.lax.fori_loop(0, n_tiles, body_b, (dctx0, dwq0, dwout0))

    # Chain through the ctx normalization: ctx = ctx_raw / zn.
    # d(ctx_raw) = dctx / zn;  dzn[d] = -sum_e dctx*ctx_raw / zn^2 = -rowsum(dctx ⊙ ctx)/zn...
    # We work directly with the normalized quantities:
    #   K'n = exp(k - m) / zn  (token softmax / N), ctx = K'n^T v
    #   dK'n = v dctx^T; dk = K'n ⊙ (dK'n - rowsum_n(dK'n ⊙ K'n)/K'n-normalization)
    # For the scaled softmax s(k)=exp(k-m)/zn with zn = N·sum exp:
    #   ds/dk VJP: dk = K'n ⊙ dK'n - K'n · sum_n(dK'n ⊙ K'n) · N/N = K'n ⊙ (dK'n - sum_n(dK'n ⊙ K'n·N)/N·N)...
    # Cleanest correct form: K' = exp(k-m)/z (true softmax), v~ = v/N,
    # ctx = K'^T v~. Then sum_n(dK' ⊙ K') = rowsum(dctx ⊙ ctx) and
    # dk = K' ⊙ (dK' - rowsum(dctx ⊙ ctx)), with dK' = v~ dctx^T.
    row = jnp.sum(dctx * ctx, axis=2, keepdims=True)  # [h, d, 1]

    # ---- Phase C: k/v paths ----
    def body_c(i, carry):
        dwk, dwv = carry
        sl = pl.ds(i * tile, tile)
        xtile = xt_ref[0, :, sl]
        kT = kt_ref[:, sl].reshape(heads, dh, tile)
        vT = vt_ref[:, sl].reshape(heads, dh, tile)
        Kp = jnp.exp(kT - m) / z                      # true softmax [h, d, T]
        vn = vT / float(n)
        # dK' = v~ dctx^T : [h, d, T] = dctx [h,d,e] @ vn [h,e,T]
        dKp = _dg(dctx, vn, (((2,), (1,)), ((0,), (0,))), md)
        dk = Kp * (dKp - row)                         # [h, d, T]
        # dv~ = K' dctx : [h, e, T]; dv = dv~ / N
        dvn = _dg(dctx, Kp, (((1,), (1,)), ((0,), (0,))), md)
        dv = dvn / float(n)
        dk2 = dk.reshape(H, tile)
        dv2 = dv.reshape(H, tile)
        # dx += W_k^T dk + W_v^T dv
        dxt_ref[0, :, sl] = (
            dxt_ref[0, :, sl].astype(jnp.float32)
            + _mm(w[H:2 * H].T, dk2, md)
            + _mm(w[2 * H:].T, dv2, md)
        ).astype(dxt_ref.dtype)
        dwk = dwk + _mm(dk2, xtile.T, md)
        dwv = dwv + _mm(dv2, xtile.T, md)
        return dwk, dwv

    dwk0 = jnp.zeros((H, c), jnp.float32)
    dwv0 = jnp.zeros((H, c), jnp.float32)
    dwk, dwv = jax.lax.fori_loop(0, n_tiles, body_c, (dwk0, dwv0))

    dwqkv_b = jnp.concatenate([dwq, dwk, dwv], axis=0)  # [3H, C]

    @pl.when(b_idx == 0)
    def _():
        dwqkv_ref[:] = dwqkv_b.astype(dwqkv_ref.dtype)
        dwout_ref[:] = dwout.astype(dwout_ref.dtype)

    @pl.when(b_idx > 0)
    def _():
        dwqkv_ref[:] = (dwqkv_ref[:] + dwqkv_b).astype(dwqkv_ref.dtype)
        dwout_ref[:] = (dwout_ref[:] + dwout).astype(dwout_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


def _fwd_call(xt, w_qkvT, w_outT, heads, dh, interpret):
    b, c, n = xt.shape
    H = heads * dh
    tile = _choose_tile(n, H, c)
    kern = functools.partial(
        _fwd_kernel, heads=heads, dh=dh, n=n, c=c, tile=tile
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n), xt.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(xt, w_qkvT, w_outT)


def _bwd_call(xt, w_qkvT, w_outT, dyt, heads, dh, interpret):
    b, c, n = xt.shape
    H = heads * dh
    tile = _choose_tile(n, H, c)
    kern = functools.partial(
        _bwd_kernel, heads=heads, dh=dh, n=n, c=c, tile=tile
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, n), xt.dtype),
            jax.ShapeDtypeStruct((3 * H, c), jnp.float32),
            jax.ShapeDtypeStruct((c, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, n), jnp.float32),
            pltpu.VMEM((H, n), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(xt, w_qkvT, w_outT, dyt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _linear_attention_pallas(xt, w_qkvT, w_outT, heads, dh, interpret):
    return _fwd_call(xt, w_qkvT, w_outT, heads, dh, interpret)


def _la_fwd(xt, w_qkvT, w_outT, heads, dh, interpret):
    y = _fwd_call(xt, w_qkvT, w_outT, heads, dh, interpret)
    return y, (xt, w_qkvT, w_outT)


def _la_bwd(heads, dh, interpret, res, dyt):
    xt, w_qkvT, w_outT = res
    dxt, dwqkvT, dwoutT = _bwd_call(xt, w_qkvT, w_outT, dyt, heads, dh, interpret)
    return dxt, dwqkvT.astype(w_qkvT.dtype), dwoutT.astype(w_outT.dtype)


_linear_attention_pallas.defvjp(_la_fwd, _la_bwd)


def linear_attention(
    x: jax.Array,
    w_qkv: jax.Array,
    w_out: jax.Array,
    heads: int = 8,
    dim_head: int = 32,
    force_pallas: Optional[bool] = None,
) -> jax.Array:
    """Fused linear attention. x: [B, N, C]; w_qkv: [C, 3H]; w_out: [H, C].

    Returns [B, N, C] (no output bias — add it outside). Pallas on TPU,
    reference XLA implementation elsewhere.
    """
    use_pallas = (
        force_pallas if force_pallas is not None else jax.default_backend() == "tpu"
    )
    if not use_pallas:
        return linear_attention_reference(x, w_qkv, w_out, heads, dim_head)
    xt = jnp.swapaxes(x, -1, -2)  # [B, C, N]
    yt = _linear_attention_pallas(
        xt,
        jnp.swapaxes(w_qkv, 0, 1),  # [3H, C]
        jnp.swapaxes(w_out, 0, 1),  # [C, H]
        heads,
        dim_head,
        False,
    )
    return jnp.swapaxes(yt, -1, -2)



# --------------------------------------------------------------------------
# fused pre-norm linear-attention residual block
# --------------------------------------------------------------------------
#
# out = x + b_out + LA(LN_gamma(x)) in ONE kernel. I/O is channel-major
# [B, C, N] like the plain kernel above: natural-layout [B, N, C] blocks
# with C < 128 pad every (8, 128) VMEM tile to 128 lanes, so their HBM->VMEM
# DMAs run at C/128 of peak (measured: a natural-layout variant of this
# kernel was NET SLOWER than the unfused path at the Darcy level-0 shape).
# The two boundary transposes stay as XLA copies; what fuses in is
# everything else that used to surround the kernel:
#   - the pre-LN (channel stats = sublane reductions, layout-native),
#   - the output bias and the residual add,
#   - and the output projection, pre-contracted with the per-head context:
#       M_h = ctx_h W_out,h            ([dh, C], once per row)
#       out_tile = M^T P               (K = heads*dh, full MXU contraction)
#     replacing the two K=dh-starved matmuls (ctx q~, then W_out^T y) of
#     the unfused form with one full-K matmul.
# Everything is channel-major end to end — the kernel contains no
# transposes at all.


def _ln_tile_cm(xt_cm, gammaT, eps):
    """[C, T] channel-major tile -> (normalized*gamma [C, T], mu, rstd [1, T])."""
    xf = xt_cm.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xln = (xf - mu) * rstd * gammaT
    return xln, mu, rstd


def _lab_fwd_kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, bout_ref, o_ref,
                    xln_ref, p_ref,
                    *, heads: int, dh: int, n: int, c: int, tile: int,
                    eps: float):
    """One grid step = one batch row. x: [1, C, N] channel-major."""
    H = heads * dh
    md = x_ref.dtype
    w = wqkv_ref[:]                                   # [3H, C]
    gammaT = gamma_ref[:].astype(jnp.float32)         # [C, 1]
    n_tiles = n // tile
    scale = dh**-0.5

    # Phase A: LN + one qkv projection per tile; q-softmax stored to
    # scratch; streamed token-softmax of k with context accumulation.
    def body_a(i, carry):
        m, z, ctx = carry
        sl = pl.ds(i * tile, tile)
        xln, _, _ = _ln_tile_cm(x_ref[0, :, sl], gammaT, eps)
        xln = xln.astype(md)
        xln_ref[:, sl] = xln
        qkv = _mm(w, xln, md)                         # [3H, T] f32
        qT = qkv[:H].reshape(heads, dh, tile)
        kT = qkv[H:2 * H].reshape(heads, dh, tile)
        vT = qkv[2 * H:].reshape(heads, dh, tile)
        # q softmax over dh (axis 1), stored unscaled
        qmx = jnp.max(qT, axis=1, keepdims=True)
        eq = jnp.exp(qT - qmx)
        P = eq / jnp.sum(eq, axis=1, keepdims=True)
        p_ref[:, sl] = P.reshape(H, tile).astype(md)
        # streamed k softmax + ctx
        m_new = jnp.maximum(m, jnp.max(kT, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        ek = jnp.exp(kT - m_new)
        z = z * alpha + jnp.sum(ek, axis=2, keepdims=True)
        ctx = ctx * alpha + _dg(ek, vT, (((2,), (2,)), ((0,), (0,))), md)
        return m_new, z, ctx

    m0 = jnp.full((heads, dh, 1), -jnp.inf, jnp.float32)
    z0 = jnp.zeros((heads, dh, 1), jnp.float32)
    ctx0 = jnp.zeros((heads, dh, dh), jnp.float32)
    m, z, ctx = jax.lax.fori_loop(0, n_tiles, body_a, (m0, z0, ctx0))
    ctx = ctx / (z * float(n))                        # [h, d, e]

    # fold W_out (and the q scale) into the context:
    # MT[C, H(d)] = concat_h(W_out,h^T ctx_h^T) * scale
    wo_h = wout_ref[:].reshape(heads, dh, c)          # [h, e, C]
    M = _dg(ctx, wo_h, (((2,), (1,)), ((0,), (0,))), md)  # [h, d, C]
    MT = jnp.swapaxes((M * scale).reshape(H, c), 0, 1).astype(md)  # [C, H]
    bout = bout_ref[:].astype(jnp.float32)            # [C, 1]

    # Phase B: out tile = MT P + b_out + x  (channel-major throughout)
    def body_b(i, _):
        sl = pl.ds(i * tile, tile)
        o = _mm(MT, p_ref[:, sl], md)                 # [C, T] f32
        o_ref[0, :, sl] = (
            o + bout + x_ref[0, :, sl].astype(jnp.float32)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body_b, 0)


def _lab_bwd_kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, dy_ref,
                    dx_ref, dgamma_ref, dwqkv_ref, dwout_ref, dbout_ref,
                    xln_ref, p_ref, dxln_ref, kt_ref, vt_ref,
                    *, heads: int, dh: int, n: int, c: int, tile: int,
                    eps: float):
    """Analytic VJP of the fused block. dy: [1, C, N] channel-major.

    Phase A stashes the k/v projections (f32 scratch) so Phase C reuses
    them instead of re-projecting — two fewer [H,C]x[C,T] matmuls per
    tile. Weight/param cotangents are accumulated across the sequential
    grid (initialized at row 0)."""
    H = heads * dh
    b_idx = pl.program_id(0)
    md = x_ref.dtype
    w = wqkv_ref[:]
    gammaT = gamma_ref[:].astype(jnp.float32)
    n_tiles = n // tile
    scale = dh**-0.5

    # ---- Phase A: recompute xln, P, and the streamed ctx ----
    def body_a(i, carry):
        m, z, ctx = carry
        sl = pl.ds(i * tile, tile)
        xln, _, _ = _ln_tile_cm(x_ref[0, :, sl], gammaT, eps)
        xln = xln.astype(md)
        xln_ref[:, sl] = xln
        qkv = _mm(w, xln, md)
        qT = qkv[:H].reshape(heads, dh, tile)
        kT = qkv[H:2 * H].reshape(heads, dh, tile)
        vT = qkv[2 * H:].reshape(heads, dh, tile)
        kt_ref[:, sl] = kT.reshape(H, tile)
        vt_ref[:, sl] = vT.reshape(H, tile)
        qmx = jnp.max(qT, axis=1, keepdims=True)
        eq = jnp.exp(qT - qmx)
        P = eq / jnp.sum(eq, axis=1, keepdims=True)
        p_ref[:, sl] = P.reshape(H, tile).astype(md)
        m_new = jnp.maximum(m, jnp.max(kT, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        ek = jnp.exp(kT - m_new)
        z = z * alpha + jnp.sum(ek, axis=2, keepdims=True)
        ctx = ctx * alpha + _dg(ek, vT, (((2,), (2,)), ((0,), (0,))), md)
        return m_new, z, ctx

    m0 = jnp.full((heads, dh, 1), -jnp.inf, jnp.float32)
    z0 = jnp.zeros((heads, dh, 1), jnp.float32)
    ctx0 = jnp.zeros((heads, dh, dh), jnp.float32)
    m, z, ctx_raw = jax.lax.fori_loop(0, n_tiles, body_a, (m0, z0, ctx0))
    zn = z * float(n)
    ctx = ctx_raw / zn                                # normalized [h, d, e]
    wo_h = wout_ref[:].reshape(heads, dh, c)          # [h, e, C]
    M2 = (_dg(ctx, wo_h, (((2,), (1,)), ((0,), (0,))), md) * scale
          ).reshape(H, c).astype(md)                  # [H(d), C] incl. scale

    # ---- Phase B: dy tiles -> dM, dP -> dxln (q path), dW_q, db_out ----
    def body_b(i, carry):
        dM, dwq, dbout = carry
        sl = pl.ds(i * tile, tile)
        dy_cm = dy_ref[0, :, sl]                      # [C, T]
        dbout = dbout + jnp.sum(
            dy_cm.astype(jnp.float32), axis=1, keepdims=True)
        Pt = p_ref[:, sl]                             # [H, T]
        # dM += P dy^T : [H, T] x [C, T] over T
        dM = dM + _dg(Pt, dy_cm, (((1,), (1,)), ((), ())), md)
        # dP = M2 dy (M2 carries the q scale, so this is the cotangent of
        # the UNSCALED softmax P)
        dPs = _mm(M2, dy_cm, md).reshape(heads, dh, tile)
        P = Pt.astype(jnp.float32).reshape(heads, dh, tile)
        dA = P * (dPs - jnp.sum(dPs * P, axis=1, keepdims=True))
        dA2 = dA.reshape(H, tile)
        dxln_ref[:, sl] = _mm(w[:H].T, dA2, md)
        # dW_q += dA xln^T : over T
        dwq = dwq + _dg(dA2, xln_ref[:, sl], (((1,), (1,)), ((), ())), md)
        return dM, dwq, dbout

    dM0 = jnp.zeros((H, c), jnp.float32)
    dwq0 = jnp.zeros((H, c), jnp.float32)
    dbout0 = jnp.zeros((c, 1), jnp.float32)
    dM, dwq, dbout = jax.lax.fori_loop(0, n_tiles, body_b, (dM0, dwq0, dbout0))

    # chain dM -> dctx, dW_out.  M = scale * ctx_h W_out,h
    dM_h = (dM * scale).reshape(heads, dh, c)         # [h, d, C]
    # dctx_h = dM_h W_out,h^T : [h, d, e]
    dctx = _dg(dM_h.astype(md), wo_h.astype(md), (((2,), (2,)), ((0,), (0,))), md)
    # dW_out,h = ctx_h^T dM_h : [h, e, C]
    dwo = _dg(ctx.astype(md), dM_h.astype(md), (((1,), (1,)), ((0,), (0,))), md)
    dwo2 = dwo.reshape(H, c)
    row = jnp.sum(dctx * ctx, axis=2, keepdims=True)  # [h, d, 1]

    # ---- Phase C: k/v paths -> dxln += W_k^T dk + W_v^T dv ----
    def body_c(i, carry):
        dwk, dwv = carry
        sl = pl.ds(i * tile, tile)
        xln = xln_ref[:, sl]
        kT = kt_ref[:, sl].reshape(heads, dh, tile)
        vT = vt_ref[:, sl].reshape(heads, dh, tile)
        Kp = jnp.exp(kT - m) / z                      # softmax [h, d, T]
        vn = vT / float(n)
        dKp = _dg(dctx, vn.astype(md), (((2,), (1,)), ((0,), (0,))), md)
        dk = Kp * (dKp - row)
        dvn = _dg(dctx, Kp.astype(md), (((1,), (1,)), ((0,), (0,))), md)
        dv = dvn / float(n)
        dk2 = dk.reshape(H, tile)
        dv2 = dv.reshape(H, tile)
        dxln_ref[:, sl] = (
            dxln_ref[:, sl]
            + _mm(w[H:2 * H].T, dk2.astype(md), md)
            + _mm(w[2 * H:].T, dv2.astype(md), md)
        )
        dwk = dwk + _dg(dk2.astype(md), xln, (((1,), (1,)), ((), ())), md)
        dwv = dwv + _dg(dv2.astype(md), xln, (((1,), (1,)), ((), ())), md)
        return dwk, dwv

    dwk0 = jnp.zeros((H, c), jnp.float32)
    dwv0 = jnp.zeros((H, c), jnp.float32)
    dwk, dwv = jax.lax.fori_loop(0, n_tiles, body_c, (dwk0, dwv0))

    # ---- Phase D: LN VJP + residual path -> dx; dgamma ----
    def body_d(i, dgamma):
        sl = pl.ds(i * tile, tile)
        xf = x_ref[0, :, sl].astype(jnp.float32)
        mu = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(xf * xf, axis=0, keepdims=True) - mu * mu
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mu) * rstd                       # [C, T]
        du = dxln_ref[:, sl]                          # [C, T] f32
        dgamma = dgamma + jnp.sum(du * xhat, axis=1, keepdims=True)
        dxhat = du * gammaT
        s1 = jnp.mean(dxhat, axis=0, keepdims=True)
        s2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
        dx_ln = rstd * (dxhat - s1 - xhat * s2)       # [C, T]
        dx_ref[0, :, sl] = (
            dx_ln + dy_ref[0, :, sl].astype(jnp.float32)
        ).astype(dx_ref.dtype)
        return dgamma

    dgamma = jax.lax.fori_loop(0, n_tiles, body_d,
                               jnp.zeros((c, 1), jnp.float32))

    dwqkv_b = jnp.concatenate([dwq, dwk, dwv], axis=0)  # [3H, C]

    @pl.when(b_idx == 0)
    def _():
        dwqkv_ref[:] = dwqkv_b.astype(dwqkv_ref.dtype)
        dwout_ref[:] = dwo2.astype(dwout_ref.dtype)
        dgamma_ref[:] = dgamma.astype(dgamma_ref.dtype)
        dbout_ref[:] = dbout.astype(dbout_ref.dtype)

    @pl.when(b_idx > 0)
    def _():
        dwqkv_ref[:] = dwqkv_ref[:] + dwqkv_b.astype(dwqkv_ref.dtype)
        dwout_ref[:] = dwout_ref[:] + dwo2.astype(dwout_ref.dtype)
        dgamma_ref[:] = dgamma_ref[:] + dgamma.astype(dgamma_ref.dtype)
        dbout_ref[:] = dbout_ref[:] + dbout.astype(dbout_ref.dtype)


def _lab_fwd_call(xt, gammaT, w_qkvT, w_outT, bout, heads, dh, eps, interpret):
    b, c, n = xt.shape
    H = heads * dh
    tile = _choose_tile(n, H, c)
    kern = functools.partial(
        _lab_fwd_kernel, heads=heads, dh=dh, n=n, c=c, tile=tile, eps=eps
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, n), xt.dtype),
            pltpu.VMEM((H, n), xt.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(xt, gammaT, w_qkvT, w_outT, bout)


def _lab_bwd_call(xt, gammaT, w_qkvT, w_outT, dyt, heads, dh, eps, interpret):
    b, c, n = xt.shape
    H = heads * dh
    tile = _choose_tile(n, H, c)
    kern = functools.partial(
        _lab_bwd_kernel, heads=heads, dh=dh, n=n, c=c, tile=tile, eps=eps
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, n), xt.dtype),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((3 * H, c), jnp.float32),
            jax.ShapeDtypeStruct((H, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, n), xt.dtype),
            pltpu.VMEM((H, n), xt.dtype),
            pltpu.VMEM((c, n), jnp.float32),
            pltpu.VMEM((H, n), jnp.float32),
            pltpu.VMEM((H, n), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(xt, gammaT, w_qkvT, w_outT, dyt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _linear_attention_block_pallas(xt, gammaT, w_qkvT, w_outT, bout,
                                   heads, dh, eps, interpret):
    return _lab_fwd_call(xt, gammaT, w_qkvT, w_outT, bout, heads, dh, eps,
                         interpret)


def _lab_fwd(xt, gammaT, w_qkvT, w_outT, bout, heads, dh, eps, interpret):
    y = _lab_fwd_call(xt, gammaT, w_qkvT, w_outT, bout, heads, dh, eps,
                      interpret)
    # bout ([C,1], tiny) rides along solely to carry its dtype for the
    # cotangent cast — it may differ from w_outT's (e.g. fp32 bias with
    # bf16 weights)
    return y, (xt, gammaT, w_qkvT, w_outT, bout)


def _lab_bwd(heads, dh, eps, interpret, res, dyt):
    xt, gammaT, w_qkvT, w_outT, bout = res
    dxt, dgammaT, dwqkvT, dwoutT, dbout = _lab_bwd_call(
        xt, gammaT, w_qkvT, w_outT, dyt, heads, dh, eps, interpret
    )
    return (dxt, dgammaT.astype(gammaT.dtype), dwqkvT.astype(w_qkvT.dtype),
            dwoutT.astype(w_outT.dtype), dbout.astype(bout.dtype))


_linear_attention_block_pallas.defvjp(_lab_fwd, _lab_bwd)


def linear_attention_block_reference(x, gamma, w_qkv, w_out, b_out,
                                     heads: int, dim_head: int,
                                     eps: float = 1e-5):
    """XLA oracle: x + b_out + LA(LN_gamma(x)). x: [B, N, C]."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ln = ((xf - mu) / jnp.sqrt(var + eps) * gamma).astype(x.dtype)
    o = linear_attention_reference(ln, w_qkv, w_out, heads, dim_head)
    return (o.astype(jnp.float32) + b_out + xf).astype(x.dtype)


def linear_attention_block(
    x: jax.Array,
    gamma: jax.Array,
    w_qkv: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    heads: int = 8,
    dim_head: int = 32,
    eps: float = 1e-5,
    force_pallas: Optional[bool] = None,
    channel_major: bool = False,
) -> jax.Array:
    """Fused residual block ``x + b_out + LA(LN_gamma(x))``.

    x: [B, N, C] (or [B, C, N] with ``channel_major=True`` — the kernel's
    native layout, no boundary transposes); gamma: [C] LN scale; w_qkv:
    [C, 3H]; w_out: [H, C]; b_out: [C]. Pallas on TPU, XLA reference
    elsewhere.
    """
    use_pallas = (
        force_pallas if force_pallas is not None else jax.default_backend() == "tpu"
    )
    if not use_pallas:
        if channel_major:
            y = linear_attention_block_reference(
                jnp.swapaxes(x, -1, -2), gamma, w_qkv, w_out, b_out,
                heads, dim_head, eps
            )
            return jnp.swapaxes(y, -1, -2)
        return linear_attention_block_reference(
            x, gamma, w_qkv, w_out, b_out, heads, dim_head, eps
        )
    c = x.shape[1] if channel_major else x.shape[-1]
    xt = x if channel_major else jnp.swapaxes(x, -1, -2)  # [B, C, N]
    yt = _linear_attention_block_pallas(
        xt,
        gamma.reshape(c, 1),
        jnp.swapaxes(w_qkv, 0, 1),   # [3H, C]
        w_out,                       # [H, C], head-major rows
        b_out.reshape(c, 1),
        heads, dim_head, eps, False,
    )
    return yt if channel_major else jnp.swapaxes(yt, -1, -2)
