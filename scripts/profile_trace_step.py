"""Device trace of the full Darcy train step (fwd+bwd+physics+adam),
aggregated per op and per category."""
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build

state, train_step, _ = build(64, 64, jnp.bfloat16)
key = jax.random.key(0)
x = jax.random.normal(jax.random.key(1), (64, 64, 64, 2))
for _ in range(3):
    key, k = jax.random.split(key)
    state, aux = train_step(state, x, k)
jax.block_until_ready(aux.loss)

logdir = "/tmp/jaxtrace_step"
with jax.profiler.trace(logdir):
    for _ in range(10):
        key, k = jax.random.split(key)
        state, aux = train_step(state, x, k)
    jax.block_until_ready(aux.loss)

paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
with gzip.open(paths[-1], "rt") as fh:
    trace = json.load(fh)
events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    agg[e.get("name", "")] += e.get("dur", 0)
    cnt[e.get("name", "")] += 1

for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:55]:
    print(f"{dur/10/1e3:9.3f} ms/iter  x{cnt[name]:4d}  {name[:110]}")

cats = defaultdict(float)
for name, dur in agg.items():
    if name.startswith("$") or "PjitFunction" in name or name.startswith("jit_") \
            or "ParseArguments" in name or "Arguments" in name:
        continue
    if "LinearAttentionBlock" in name:
        cat = "pallas-attn"
    elif name.startswith("copy"):
        cat = "copy"
    elif "convolution" in name:
        cat = "conv"
    elif name.startswith("fusion") or "fusion" in name:
        cat = "fusion"
    else:
        cat = "other"
    cats[cat] += dur
print("\ncategory rollup (ms/iter):")
for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"  {cat:14s} {dur/10/1e3:8.3f}")
