"""Capture a jax.profiler device trace of the UNet forward (and optionally
the train step) and aggregate per-op device times from the trace protobuf."""
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

from physicsinformeddiffusionmodels_tpu.models.unet import UNet

B, P = 64, 64
x = jax.random.normal(jax.random.key(1), (B, P, P, 2))
t = jnp.zeros((B,), jnp.int32)
model = UNet(dim=32, channels=2, dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), x[:1], t[:1])
f = jax.jit(lambda p, xx: model.apply(p, xx, t))
for _ in range(3):
    out = f(params, x)
jax.block_until_ready(out)

logdir = "/tmp/jaxtrace"
with jax.profiler.trace(logdir):
    for _ in range(10):
        out = f(params, x)
    jax.block_until_ready(out)

# find the trace file
paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
print("trace files:", paths[-1] if paths else None)
if not paths:
    sys.exit("no trace captured")
with gzip.open(paths[-1], "rt") as fh:
    trace = json.load(fh)

# aggregate duration by op name on TensorCore pids
events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    name = e.get("name", "")
    dur = e.get("dur", 0)  # microseconds
    args = e.get("args") or {}
    # keep XLA op events (they have 'run_id' or long hlo names)
    agg[name] += dur
    cnt[name] += 1

total = sum(agg.values())
print(f"total event time: {total/1e3:.1f} ms over {len(events)} events")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
    print(f"{dur/10/1e3:9.3f} ms/iter  x{cnt[name]:4d}  {name[:110]}")

# category rollup (device ops only — skip host-side python/profiler frames)
cats = defaultdict(float)
for name, dur in agg.items():
    if name.startswith("$") or "PjitFunction" in name or name.startswith("jit_"):
        continue
    if "LinearAttentionBlock" in name or "SpatialLinearAttention" in name:
        cat = "pallas-attn"
    elif "Block_" in name and "fusion" not in name:
        cat = "pallas-gn"
    elif name.startswith("copy"):
        cat = "copy"
    elif "convolution" in name or name.startswith("fusion"):
        cat = "conv/fusion"
    else:
        cat = "other"
    cats[cat] += dur
print("\ncategory rollup (ms/iter):")
for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"  {cat:14s} {dur/10/1e3:8.3f}")
