"""Sequence-sharded linear attention over a device mesh.

Net-new capability (absent from the reference, which is single-device and
caps resolution at 64x64 — SURVEY.md §2.5/§5): the flattened pixel axis is
sharded across mesh devices so attention scales past single-chip memory.

Linear attention is exactly sequence-parallel: its only cross-token
couplings are the token-softmax statistics of k and the context matrix

    m  = max_n k[n]                (pmax over shards)
    Z  = sum_n exp(k[n] - m)       (psum)
    ctx = sum_n exp(k[n]-m)/Z . v[n]/N   (psum of shard partials)

after which each device finishes its own tokens locally (q softmax is
per-token). Three tiny [heads, dh]-shaped collectives ride ICI per call —
no token data ever moves between devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8: first-class API (experimental alias is deprecated)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _pmax_stat(x, axis):
    """Cross-device max softmax statistic. ``pmax`` has no differentiation
    rule in JAX, but the max-shift inside a softmax is exactly
    gradient-neutral (it cancels in exp(k-m)/sum exp(k-m)), so a zero
    tangent is the mathematically correct derivative here — this is what
    makes the sequence-parallel path trainable."""
    return jax.lax.pmax(x, axis)


@_pmax_stat.defjvp
def _pmax_stat_jvp(axis, primals, tangents):
    (x,) = primals
    out = jax.lax.pmax(x, axis)
    return out, jnp.zeros_like(out)


def sequence_sharded_linear_attention(
    x: jax.Array,
    w_qkv: jax.Array,
    w_out: jax.Array,
    mesh: Mesh,
    axis: str,
    heads: int = 8,
    dim_head: int = 32,
    batch_axis: str | None = None,
) -> jax.Array:
    """x: [B, N, C] with N sharded over mesh axis ``axis`` (and optionally B
    over ``batch_axis``); w_qkv: [C, 3H]; w_out: [H, C]. Returns [B, N, C],
    same sharding.

    Matches ops.pallas_attention.linear_attention_reference exactly
    (tested on a virtual 8-device mesh)."""
    h = heads * dim_head
    n_total = x.shape[1]

    def shard_fn(xs, wq, wo):
        # xs: [B, N/s, C] local tokens
        b, n_loc, c = xs.shape
        qkv = xs @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k = k.reshape(b, n_loc, heads, dim_head)
        v = v.reshape(b, n_loc, heads, dim_head)

        m_loc = jnp.max(k, axis=1)                      # [B, heads, dh]
        m = _pmax_stat(m_loc, axis)
        ek = jnp.exp(k - m[:, None])                    # [B, n_loc, heads, dh]
        z = jax.lax.psum(jnp.sum(ek, axis=1), axis)     # [B, heads, dh]
        ctx_part = jnp.einsum("bnhd,bnhe->bhde", ek, v / n_total)
        ctx = jax.lax.psum(ctx_part, axis) / z[..., None]

        q = q.reshape(b, n_loc, heads, dim_head)
        q = jax.nn.softmax(q, axis=-1) * dim_head**-0.5
        out = jnp.einsum("bhde,bnhd->bnhe", ctx, q)
        return out.reshape(b, n_loc, h) @ wo

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )
    return fn(x, w_qkv, w_out)


def sequence_sharded_linear_attention_block(
    x: jax.Array,
    gamma: jax.Array,
    w_qkv: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    mesh: Mesh,
    axis: str,
    heads: int = 8,
    dim_head: int = 32,
    eps: float = 1e-5,
    batch_axis: str | None = None,
    gather_output: bool = False,
) -> jax.Array:
    """Sequence-sharded pre-norm residual block ``x + b_out + LA(LN_gamma(x))``
    — the distributed twin of ``ops.pallas_attention.linear_attention_block``
    (same math as ``linear_attention_block_reference``), used by the UNet's
    opt-in sequence-parallel path for resolutions past single-chip memory.

    LN, bias and the residual add are per-token (fully local); only the three
    [B, heads, dh] softmax/context statistics cross devices (pmax + 2 psum).

    With ``gather_output=True`` the result is all-gathered over ``axis``
    inside the shard_map so the returned tokens are genuinely replicated over
    that mesh axis (out_spec ``P(batch_axis, None, None)``). The UNet uses
    this: its conv/pad stages are not spatially partitioned, and letting
    GSPMD propagate a token sharding into the manually-padded strided
    Downsample conv computes WRONG values (verified wrong-by-16 on the
    8-device CPU mesh). The caller must ALSO pin the input tokens to a
    batch-only sharding right before this call (the UNet does) — otherwise
    the token-sharded in_spec back-propagates the same spatial sharding into
    the upstream conv chain and the miscompute returns.
    """
    h = heads * dim_head
    n_total = x.shape[1]

    def shard_fn(xs, g, wq, wo, bo):
        b, n_loc, c = xs.shape
        xf = xs.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        ln = ((xf - mu) / jnp.sqrt(var + eps) * g).astype(xs.dtype)

        qkv = ln @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k = k.reshape(b, n_loc, heads, dim_head)
        v = v.reshape(b, n_loc, heads, dim_head)

        m = _pmax_stat(jnp.max(k, axis=1), axis)
        ek = jnp.exp(k - m[:, None])
        z = jax.lax.psum(jnp.sum(ek, axis=1), axis)
        ctx_part = jnp.einsum("bnhd,bnhe->bhde", ek, v / n_total)
        ctx = jax.lax.psum(ctx_part, axis) / z[..., None]

        q = q.reshape(b, n_loc, heads, dim_head)
        q = jax.nn.softmax(q, axis=-1) * dim_head**-0.5
        out = jnp.einsum("bhde,bnhd->bnhe", ctx, q).reshape(b, n_loc, h) @ wo
        y = (out.astype(jnp.float32) + bo + xf).astype(xs.dtype)
        if gather_output:
            y = jax.lax.all_gather(y, axis, axis=1, tiled=True)
        return y

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(), P(), P(), P()),
        out_specs=P(batch_axis, None if gather_output else axis, None),
        # with gather_output the tokens ARE replicated over ``axis`` (tiled
        # all_gather) but the varying-manual-axes checker can't infer it
        check_vma=not gather_output,
    )
    return fn(x, gamma, w_qkv, w_out, b_out)
