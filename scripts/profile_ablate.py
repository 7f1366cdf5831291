"""Ablate UNet components to locate the forward-pass time on TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.models.unet import UNet

B, P = 64, 64
x = jax.random.normal(jax.random.key(1), (B, P, P, 2))
t = jnp.zeros((B,), jnp.int32)


def bench(label, **kw):
    model = UNet(dim=32, channels=2, dtype=jnp.bfloat16, **kw)
    params = model.init(jax.random.key(0), x[:1], t[:1])
    f = jax.jit(lambda p, xx: model.apply(p, xx, t))
    lowered = f.lower(params, x)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    for _ in range(3):
        out = f(params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:36s} {dt*1e3:7.2f} ms   {flops/1e9:7.1f} GF "
          f"({flops/dt/1e12:5.1f} TF/s)  {bytes_/1e9:6.2f} GB ({bytes_/dt/1e9:6.0f} GB/s)")
    return dt


bench("full")
bench("no frame attention", frame_attention=False)
bench("no linear attention", use_sparse_linear_attn=False)
bench("no cond path", cond_path=False)
bench("no frame, no linear, no cond", frame_attention=False,
      use_sparse_linear_attn=False, cond_path=False)
bench("init kernel 3", init_kernel_size=3)
