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
from jax.experimental.shard_map import shard_map


def sequence_sharded_linear_attention(
    x: jax.Array,
    w_qkv: jax.Array,
    w_out: jax.Array,
    mesh: Mesh,
    axis: str,
    heads: int = 8,
    dim_head: int = 32,
) -> jax.Array:
    """x: [B, N, C] with N sharded over mesh axis ``axis``;
    w_qkv: [C, 3H]; w_out: [H, C]. Returns [B, N, C], same sharding.

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
        m = jax.lax.pmax(m_loc, axis)
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
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    return fn(x, w_qkv, w_out)
