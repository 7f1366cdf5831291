"""Fused channel-major conv3x3 -> GroupNorm -> FiLM -> SiLU Pallas kernel.

The reference ResnetBlock's per-Block op chain (`/root/reference/src/
unet_model.py:223-241`) is bandwidth-bound at the Darcy shapes and, worse,
XLA compiles the narrow-channel (C=32) 3x3 convs with a batch-in-lanes
emitter whose layout disagrees with every neighboring custom kernel
(measured: 0.2-0.65 ms relayout copies per boundary). This kernel computes
the WHOLE Block in one channel-major pass per batch row:

    z = conv3x3(x) + bias          (zero-padded, SAME)
    y = GN(z) * gamma + beta       (group statistics over all pixels)
    y = y * (scale + 1) + shift    (per-(row, channel) FiLM, optional)
    o = y * sigmoid(y)             (SiLU)

Layout [C, N] per row with N = P*P pixels row-major on lanes: full lane
utilization at any C (natural [N, C] blocks with C < 128 pad every VMEM
tile to 128 lanes and DMA at C/128 of peak). The 3x3 conv is an im2col
matmul with K = 9*C_in: the nine tap slices are SUBLANE-concatenated from
a zero-padded VMEM copy of the row, so the contraction is a single
full-depth MXU matmul instead of nine K=C_in-starved ones. Horizontal
(column-edge) taps are masked by lane index; vertical edges land in the
zero halo.

The backward is a second kernel: replay conv -> stats, chain
SiLU'/FiLM'/GN' (two group reductions), then dW as nine K=T matmuls and
dx by scatter-accumulating W_tap^T dz into a padded dx buffer. Parameter
cotangents accumulate across the sequential grid.

Used on TPU inside the channel-major UNet level stages; plain-XLA
reference everywhere else (identical numerics, tested in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _choose_tile(n: int, p: int) -> int:
    """Token tile: multiple of the image width P so column masks are
    tile-invariant."""
    for t in (512, 256, 128):
        if n % t == 0 and t % p == 0:
            return t
    return p if p >= n else n


def _mmf(a, b, md):
    return jnp.dot(a.astype(md), b.astype(md), preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# XLA reference (CPU/GPU fallback and test oracle)
# --------------------------------------------------------------------------


def conv_gn_film_silu_reference(x_cm, w, b, gamma, beta, scale, shift,
                                p: int, groups: int, eps: float = 1e-5):
    """x_cm: [B, Ci, N]; w: [3, 3, Ci, Co] (HWIO); scale/shift: [B, Co]|None."""
    bsz, ci, n = x_cm.shape
    co = w.shape[-1]
    x = jnp.swapaxes(x_cm, 1, 2).reshape(bsz, p, p, ci)
    z = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + b
    zg = z.reshape(bsz, n, groups, co // groups)
    mean = zg.mean(axis=(1, 3), keepdims=True)
    var = ((zg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    zn = ((zg - mean) / jnp.sqrt(var + eps)).reshape(bsz, n, co)
    y = zn * gamma + beta
    if scale is not None:
        y = y * (scale[:, None, :].astype(jnp.float32) + 1.0) + shift[:, None, :].astype(jnp.float32)
    o = y * jax.nn.sigmoid(y)
    return jnp.swapaxes(o.reshape(bsz, n, co), 1, 2).astype(x_cm.dtype)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


# Halo width for the padded row buffer. Mosaic requires dynamic lane-slice
# offsets provably 128-aligned, so tap shifts (±1, ±P, ±P±1) cannot be DMA
# offsets: instead each tile loads ONE aligned [Ci, T+2*PADW] window and the
# nine shifted views are STATIC value-slices within it (in-register lane
# rotations). PADW = 128 keeps every ref-level offset a multiple of 128.
_PADW = 128


def _col_masks(tile: int, p: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) % p
    return (lane != 0), (lane != p - 1)  # valid-lane masks for dc=-1 / dc=+1


def _fill_xcat(xpad_ref, xcat_ref, i, tile, p, ci, mask_l, mask_r):
    """Masked im2col for tile i: write the nine shifted tap views into the
    [9Ci, T] scratch. The shifted views are static value-slices of one
    aligned window; storing them canonicalizes the rotated layouts (Mosaic
    cannot concatenate values with different lane offsets)."""
    xwin = xpad_ref[:, pl.ds(i * tile, tile + 2 * _PADW)]  # aligned load
    for t_idx, (dr, dc) in enumerate(_TAPS):
        s = dr * p + dc
        xs = xwin[:, _PADW + s:_PADW + s + tile]      # static slice [Ci, T]
        if dc == -1:
            xs = jnp.where(mask_l, xs, jnp.zeros_like(xs))
        elif dc == 1:
            xs = jnp.where(mask_r, xs, jnp.zeros_like(xs))
        xcat_ref[t_idx * ci:(t_idx + 1) * ci, :] = xs


def _conv_tiles(xpad_ref, xcat_ref, w_ref, bias_ref, i, tile, p, pad, ci, md,
                mask_l, mask_r):
    """One output tile of the 3x3 conv: [Co, T] f32 (K = 9*Ci matmul)."""
    _fill_xcat(xpad_ref, xcat_ref, i, tile, p, ci, mask_l, mask_r)
    return _mmf(w_ref[:], xcat_ref[:], md) + bias_ref[:].astype(jnp.float32)


def _fwd_kernel(x_ref, w_ref, bias_ref, gamma_ref, beta_ref, sc_ref, sh_ref,
                o_ref, xpad_ref, z_ref, xcat_ref,
                *, p: int, groups: int, eps: float, n: int, ci: int, co: int,
                tile: int):
    """One grid step = one batch row. x: [1, Ci, N] channel-major."""
    md = x_ref.dtype
    pad = _PADW
    n_tiles = n // tile
    cg = co // groups
    mask_l, mask_r = _col_masks(tile, p)

    # zero-padded copy of the row (vertical taps read the zero halo)
    xpad_ref[:, :] = jnp.zeros_like(xpad_ref)
    xpad_ref[:, pl.ds(pad, n)] = x_ref[0]

    # Phase 1: conv per tile -> z scratch + per-channel moment accumulation
    def body1(i, carry):
        s1, s2 = carry
        z = _conv_tiles(xpad_ref, xcat_ref, w_ref, bias_ref, i, tile, p, pad,
                        ci, md, mask_l, mask_r)
        z_ref[:, pl.ds(i * tile, tile)] = z
        return s1 + jnp.sum(z, axis=1, keepdims=True), \
            s2 + jnp.sum(z * z, axis=1, keepdims=True)

    s10 = jnp.zeros((co, 1), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_tiles, body1, (s10, s10))

    # group statistics: sum the per-channel moments within each group via a
    # [Co, Co] block-diagonal matmul (sublane-safe)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (co, co), 0) // cg
    colg = jax.lax.broadcasted_iota(jnp.int32, (co, co), 1) // cg
    gmask = (rowg == colg).astype(jnp.float32)
    denom = float(n * cg)
    mean = _mmf(gmask, s1, jnp.float32) / denom       # [Co, 1] per-channel
    ex2 = _mmf(gmask, s2, jnp.float32) / denom
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)

    gamma = gamma_ref[:].astype(jnp.float32)          # [Co, 1]
    beta = beta_ref[:].astype(jnp.float32)
    sc1 = sc_ref[0].astype(jnp.float32) + 1.0         # [Co, 1]
    sh = sh_ref[0].astype(jnp.float32)
    a = inv * gamma * sc1
    bb = (beta - mean * inv * gamma) * sc1 + sh

    # Phase 2: normalize + FiLM + SiLU
    def body2(i, _):
        sl = pl.ds(i * tile, tile)
        y = z_ref[:, sl] * a + bb
        o_ref[0, :, sl] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body2, 0)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(x_ref, w_ref, bias_ref, gamma_ref, beta_ref, sc_ref, sh_ref,
                wdx_ref, dy_ref,
                dx_ref, dw_ref, dbias_ref, dgamma_ref, dbeta_ref,
                dsc_ref, dsh_ref,
                xpad_ref, z_ref, dxh_ref, xcat_ref,
                dzp_l_ref, dzp_0_ref, dzp_r_ref, dzcat_ref,
                *, p: int, groups: int, eps: float, n: int, ci: int, co: int,
                tile: int):
    """Analytic VJP. dy: [1, Co, N]; wdx: [Ci, 9Co] flipped weights (built in
    the wrapper). dw/dbias/dgamma/dbeta accumulate across the grid;
    dscale/dshift are per-row outputs."""
    md = x_ref.dtype
    b_idx = pl.program_id(0)
    pad = _PADW
    n_tiles = n // tile
    cg = co // groups
    mask_l, mask_r = _col_masks(tile, p)

    xpad_ref[:, :] = jnp.zeros_like(xpad_ref)
    xpad_ref[:, pl.ds(pad, n)] = x_ref[0]

    # ---- Phase A: replay conv -> z, moments ----
    def body_a(i, carry):
        s1, s2 = carry
        z = _conv_tiles(xpad_ref, xcat_ref, w_ref, bias_ref, i, tile, p, pad,
                        ci, md, mask_l, mask_r)
        z_ref[:, pl.ds(i * tile, tile)] = z
        return s1 + jnp.sum(z, axis=1, keepdims=True), \
            s2 + jnp.sum(z * z, axis=1, keepdims=True)

    s10 = jnp.zeros((co, 1), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_tiles, body_a, (s10, s10))
    rowg = jax.lax.broadcasted_iota(jnp.int32, (co, co), 0) // cg
    colg = jax.lax.broadcasted_iota(jnp.int32, (co, co), 1) // cg
    gmask = (rowg == colg).astype(jnp.float32)
    denom = float(n * cg)
    mean = _mmf(gmask, s1, jnp.float32) / denom
    ex2 = _mmf(gmask, s2, jnp.float32) / denom
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)

    gamma = gamma_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)
    sc1 = sc_ref[0].astype(jnp.float32) + 1.0
    sh = sh_ref[0].astype(jnp.float32)

    # ---- Phase B: SiLU' / FiLM' -> dxhat (stored); per-channel sums ----
    def body_b(i, carry):
        dsh_s, dsc_s, dbeta_s, dgamma_s, t1, t2 = carry
        sl = pl.ds(i * tile, tile)
        z = z_ref[:, sl]
        xhat = (z - mean) * inv
        u = xhat * gamma + beta
        y = u * sc1 + sh
        sig = jax.nn.sigmoid(y)
        dy_pre = dy_ref[0, :, sl].astype(jnp.float32) * (
            sig * (1.0 + y * (1.0 - sig)))
        dsh_s = dsh_s + jnp.sum(dy_pre, axis=1, keepdims=True)
        dsc_s = dsc_s + jnp.sum(dy_pre * u, axis=1, keepdims=True)
        du = dy_pre * sc1
        dbeta_s = dbeta_s + jnp.sum(du, axis=1, keepdims=True)
        dgamma_s = dgamma_s + jnp.sum(du * xhat, axis=1, keepdims=True)
        dxhat = du * gamma
        dxh_ref[:, sl] = dxhat
        t1 = t1 + jnp.sum(dxhat, axis=1, keepdims=True)
        t2 = t2 + jnp.sum(dxhat * xhat, axis=1, keepdims=True)
        return dsh_s, dsc_s, dbeta_s, dgamma_s, t1, t2

    z0 = jnp.zeros((co, 1), jnp.float32)
    dsh_s, dsc_s, dbeta_s, dgamma_s, t1, t2 = jax.lax.fori_loop(
        0, n_tiles, body_b, (z0, z0, z0, z0, z0, z0))
    m1 = _mmf(gmask, t1, jnp.float32) / denom         # mean over (N, group)
    m2 = _mmf(gmask, t2, jnp.float32) / denom

    # ---- Phase C1: dz per tile -> masked padded dz buffers, dW, dbias ----
    # The dc-edge masks on dz factor the transposed conv into a FORWARD-form
    # conv: dx[m] = sum_tap W_tap^T (dz*mask_dc)[m - s_tap], so dx is one
    # K=9Co matmul per tile against flipped weights over three zero-padded
    # masked-dz buffers — no unaligned scatter anywhere. The same masked
    # im2col (already in xcat scratch from Phase A... rebuilt per tile here)
    # collapses dW to ONE K=T matmul per tile: dW += dz xcat^T.
    dzp_l_ref[:, :] = jnp.zeros_like(dzp_l_ref)
    dzp_0_ref[:, :] = jnp.zeros_like(dzp_0_ref)
    dzp_r_ref[:, :] = jnp.zeros_like(dzp_r_ref)

    def body_c1(i, carry):
        dw, dbias = carry
        sl = pl.ds(i * tile, tile)
        z = z_ref[:, sl]
        xhat = (z - mean) * inv
        dz = inv * (dxh_ref[:, sl] - m1 - xhat * m2)  # [Co, T] f32
        dbias = dbias + jnp.sum(dz, axis=1, keepdims=True)
        dzm = dz.astype(md)
        psl = pl.ds(pad + i * tile, tile)
        dzp_0_ref[:, psl] = dzm
        dzp_l_ref[:, psl] = jnp.where(mask_l, dzm, jnp.zeros_like(dzm))
        dzp_r_ref[:, psl] = jnp.where(mask_r, dzm, jnp.zeros_like(dzm))
        _fill_xcat(xpad_ref, xcat_ref, i, tile, p, ci, mask_l, mask_r)
        # dW += dz xcat^T : [Co, 9Ci], K = T
        dw = dw + jax.lax.dot_general(
            dzm, xcat_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dw, dbias

    dw0 = jnp.zeros((co, 9 * ci), jnp.float32)
    db0 = jnp.zeros((co, 1), jnp.float32)
    dw_b, dbias_b = jax.lax.fori_loop(0, n_tiles, body_c1, (dw0, db0))

    # ---- Phase C2: dx tile = wdx @ dzcat (forward-form transposed conv) ----
    bufs = {-1: dzp_l_ref, 0: dzp_0_ref, 1: dzp_r_ref}

    def body_c2(i, _):
        wins = {dc: bufs[dc][:, pl.ds(i * tile, tile + 2 * _PADW)]
                for dc in (-1, 0, 1)}
        for t_idx, (dr, dc) in enumerate(_TAPS):
            s = dr * p + dc
            dzcat_ref[t_idx * co:(t_idx + 1) * co, :] = \
                wins[dc][:, _PADW - s:_PADW - s + tile]
        dx_ref[0, :, pl.ds(i * tile, tile)] = _mmf(
            wdx_ref[:], dzcat_ref[:], md).astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body_c2, 0)

    dsc_ref[0] = dsc_s.astype(dsc_ref.dtype)
    dsh_ref[0] = dsh_s.astype(dsh_ref.dtype)

    @pl.when(b_idx == 0)
    def _():
        dw_ref[:] = dw_b.astype(dw_ref.dtype)
        dbias_ref[:] = dbias_b.astype(dbias_ref.dtype)
        dgamma_ref[:] = dgamma_s.astype(dgamma_ref.dtype)
        dbeta_ref[:] = dbeta_s.astype(dbeta_ref.dtype)

    @pl.when(b_idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_b.astype(dw_ref.dtype)
        dbias_ref[:] = dbias_ref[:] + dbias_b.astype(dbias_ref.dtype)
        dgamma_ref[:] = dgamma_ref[:] + dgamma_s.astype(dgamma_ref.dtype)
        dbeta_ref[:] = dbeta_ref[:] + dbeta_s.astype(dbeta_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP + public API
# --------------------------------------------------------------------------


def _flatten_w(w, ci, co):
    """[3, 3, Ci, Co] HWIO -> [Co, 9Ci] with tap-major columns matching
    _TAPS order."""
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(co, 9 * ci)


def _fwd_call(x_cm, wflat, bias, gamma, beta, sc, sh, p, groups, eps,
              interpret):
    b, ci, n = x_cm.shape
    co = wflat.shape[0]
    tile = _choose_tile(n, p)
    pad = _PADW
    kern = functools.partial(
        _fwd_kernel, p=p, groups=groups, eps=eps, n=n, ci=ci, co=co, tile=tile
    )
    col = lambda i: (0, 0)
    rowcol = lambda i: (0, i)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ci, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 9 * ci), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, co, n), x_cm.dtype),
        scratch_shapes=[
            pltpu.VMEM((ci, n + 2 * pad), x_cm.dtype),
            pltpu.VMEM((co, n), jnp.float32),
            pltpu.VMEM((9 * ci, tile), x_cm.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(x_cm, wflat, bias, gamma, beta, sc, sh)


def _bwd_call(x_cm, wflat, wdx, bias, gamma, beta, sc, sh, dy, p, groups, eps,
              interpret):
    b, ci, n = x_cm.shape
    co = wflat.shape[0]
    tile = _choose_tile(n, p)
    pad = _PADW
    kern = functools.partial(
        _bwd_kernel, p=p, groups=groups, eps=eps, n=n, ci=ci, co=co, tile=tile
    )
    col = lambda i: (0, 0)
    rowcol = lambda i: (0, i)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ci, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 9 * ci), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, 9 * co), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ci, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 9 * ci), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ci, n), x_cm.dtype),
            jax.ShapeDtypeStruct((co, 9 * ci), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, co, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, co, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ci, n + 2 * pad), x_cm.dtype),     # xpad
            pltpu.VMEM((co, n), jnp.float32),              # z
            pltpu.VMEM((co, n), jnp.float32),              # dxhat
            pltpu.VMEM((9 * ci, tile), x_cm.dtype),        # xcat
            pltpu.VMEM((co, n + 2 * pad), x_cm.dtype),     # dzpad (dc=-1)
            pltpu.VMEM((co, n + 2 * pad), x_cm.dtype),     # dzpad (dc=0)
            pltpu.VMEM((co, n + 2 * pad), x_cm.dtype),     # dzpad (dc=+1)
            pltpu.VMEM((9 * co, tile), x_cm.dtype),        # dzcat
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(x_cm, wflat, bias, gamma, beta, sc, sh, wdx, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _conv_block_pallas(x_cm, wflat, bias, gamma, beta, sc, sh,
                       p, groups, eps, interpret):
    return _fwd_call(x_cm, wflat, bias, gamma, beta, sc, sh, p, groups, eps,
                     interpret)


def _cb_fwd(x_cm, wflat, bias, gamma, beta, sc, sh, p, groups, eps, interpret):
    y = _fwd_call(x_cm, wflat, bias, gamma, beta, sc, sh, p, groups, eps,
                  interpret)
    return y, (x_cm, wflat, bias, gamma, beta, sc, sh)


def _cb_bwd(p, groups, eps, interpret, res, dy):
    x_cm, wflat, bias, gamma, beta, sc, sh = res
    co = wflat.shape[0]
    ci = wflat.shape[1] // 9
    # flipped weights for the forward-form transposed conv:
    # wdx[ci, t*Co + co] = wflat[co, t*Ci + ci]
    wdx = jnp.transpose(wflat.reshape(co, 9, ci), (2, 1, 0)).reshape(ci, 9 * co)
    dx, dw, dbias, dgamma, dbeta, dsc, dsh = _bwd_call(
        x_cm, wflat, wdx, bias, gamma, beta, sc, sh, dy, p, groups, eps,
        interpret
    )
    return (dx, dw.astype(wflat.dtype), dbias.astype(bias.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
            dsc.astype(sc.dtype), dsh.astype(sh.dtype))


_conv_block_pallas.defvjp(_cb_fwd, _cb_bwd)


def conv_gn_film_silu_cm(
    x_cm: jax.Array,
    w: jax.Array,
    b: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    scale: Optional[jax.Array],
    shift: Optional[jax.Array],
    p: int,
    groups: int = 8,
    eps: float = 1e-5,
    force_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused Block: conv3x3(SAME) -> GN -> FiLM -> SiLU, channel-major.

    x_cm: [B, Ci, N] with N = p*p row-major pixels; w: [3, 3, Ci, Co] HWIO;
    b/gamma/beta: [Co]; scale/shift: [B, Co] or None. Returns [B, Co, N].
    """
    bsz, ci, n = x_cm.shape
    co = w.shape[-1]
    if p + 1 > _PADW:
        # the nine tap views are static slices at offset _PADW+s (s up to
        # p+1) inside one aligned window — wider images run off the halo
        raise ValueError(
            f"conv_gn_film_silu_cm supports p <= {_PADW - 1} (got p={p}); "
            "use the XLA reference path for larger images"
        )
    use_pallas = (
        force_pallas if force_pallas is not None
        else jax.default_backend() == "tpu"
    )
    if not use_pallas and not interpret:
        return conv_gn_film_silu_reference(
            x_cm, w, b, gamma, beta, scale, shift, p, groups, eps
        )
    no_film = scale is None
    sc = (jnp.zeros((bsz, co), jnp.float32) if no_film
          else scale.reshape(bsz, co).astype(jnp.float32))
    sh = (jnp.zeros((bsz, co), jnp.float32) if no_film
          else shift.reshape(bsz, co).astype(jnp.float32))
    return _conv_block_pallas(
        x_cm,
        _flatten_w(w, ci, co).astype(x_cm.dtype),
        b.reshape(co, 1),
        gamma.reshape(co, 1),
        beta.reshape(co, 1),
        sc[..., None],                                # [B, Co, 1]
        sh[..., None],
        p, groups, eps, interpret,
    )
