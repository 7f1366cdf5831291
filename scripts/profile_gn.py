"""Microbenchmark group_norm_film_silu variants at the Darcy level-0 shape."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import (
    group_norm_film_silu, _gn_film_silu_pallas,
)

B, N, C, G = 64, 4096, 32, 8


def timeit(label, f, *a):
    for _ in range(3):
        out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gb = (2 * B * N * C * 2) / 1e9
    print(f"{label:32s} {dt*1e6:8.1f} us  ({gb/dt:6.0f} GB/s effective)")
    return dt


x = jax.random.normal(jax.random.key(0), (B, N, C), jnp.bfloat16)
gamma = jnp.ones((C,), jnp.bfloat16)
beta = jnp.zeros((C,), jnp.bfloat16)
scale = jax.random.normal(jax.random.key(1), (B, C), jnp.bfloat16) * 0.1
shift = jax.random.normal(jax.random.key(2), (B, C), jnp.bfloat16) * 0.1

f_pallas = jax.jit(lambda x: group_norm_film_silu(x, gamma, beta, scale, shift, groups=G))
timeit("pallas current", f_pallas, x)

# XLA for comparison
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import _reference_impl
f_xla = jax.jit(lambda x: _reference_impl(x, gamma, beta, scale, shift, G, 1e-5))
timeit("plain XLA", f_xla, x)

# lane-packed variant: view [B, N, C] as [B, N*C/128, 128] outside the kernel
# and do stats via a 128x128 block-structure mask matmul.
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 128 // C  # tokens per lane-row


def _fwd_kernel_packed(x_ref, a_ref, b_ref, o_ref, *, n128, c, bk, tile, groups, eps):
    # x_ref: [bk, n128, 128]; channel of lane l is l % c; a/b per (row, lane).
    cg = c // groups
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    mask = ((lane % c) // cg == (lane2 % c) // cg).astype(jnp.float32)
    n_tiles = n128 // tile

    def stats_body(j, carry):
        s1, s2 = carry
        xt = x_ref[:, pl.ds(j * tile, tile), :].astype(jnp.float32)
        return s1 + jnp.sum(xt, axis=1), s2 + jnp.sum(xt * xt, axis=1)

    s1, s2 = jax.lax.fori_loop(
        0, n_tiles, stats_body,
        (jnp.zeros((bk, 128), jnp.float32), jnp.zeros((bk, 128), jnp.float32)),
    )
    denom = float(n128 * 128 // groups)
    mean = jnp.dot(s1, mask, preferred_element_type=jnp.float32) / denom
    ex2 = jnp.dot(s2, mask, preferred_element_type=jnp.float32) / denom
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)
    a = a_ref[:].astype(jnp.float32) * inv
    b = b_ref[:].astype(jnp.float32) - mean * a

    def out_body(j, _):
        sl = pl.ds(j * tile, tile)
        xt = x_ref[:, sl, :].astype(jnp.float32)
        y = xt * a[:, None, :] + b[:, None, :]
        o_ref[:, sl, :] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, out_body, 0)


def gn_packed(x, gamma, beta, scale, shift, groups=G, eps=1e-5, bk=8, tile=256):
    b, n, c = x.shape
    xp = x.reshape(b, n * c // 128, 128)
    n128 = xp.shape[1]
    # per-(row, lane) affine folded outside: a = gamma*(scale+1), b = beta*(scale+1)+shift
    pack = 128 // c
    af = (gamma[None, :] * (scale.astype(jnp.float32) + 1.0))
    bf = (beta[None, :] * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32))
    af = jnp.tile(af, (1, pack))
    bf = jnp.tile(bf, (1, pack))
    kern = functools.partial(
        _fwd_kernel_packed, n128=n128, c=c, bk=bk, tile=tile, groups=groups, eps=eps
    )
    out = pl.pallas_call(
        kern,
        grid=(b // bk,),
        in_specs=[
            pl.BlockSpec((bk, n128, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, n128, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n128, 128), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xp, af, bf)
    return out.reshape(b, n, c)


f_packed = jax.jit(lambda x: gn_packed(x, gamma, beta, scale, shift))
# correctness
ref = f_xla(x)
got = f_packed(x)
err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
print("packed max err vs XLA:", float(err))
timeit("pallas lane-packed", f_packed, x)

# variant: bk=16/32 with packed layout (VMEM no longer padded 4x)
for bk in (16, 32, 64):
    fb = jax.jit(functools.partial(gn_packed, gamma=gamma, beta=beta, scale=scale,
                                   shift=shift, bk=bk))
    timeit(f"pallas lane-packed bk={bk}", fb, x)
