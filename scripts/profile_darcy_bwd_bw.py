"""Per-op ACHIEVED HBM bandwidth of the Darcy train step (VERDICT r4 ask #6).

docs/PERF_WALL.md attributes ~10 ms of the 27.6 ms Darcy step to conv
backward fusion chains and argues they are bandwidth-bound *by analogy* to
a forward-path experiment. This script replaces the analogy with a
measurement:

1. trace N steps of the exact benched train step on the TPU, aggregating
   device time per HLO instruction name;
2. parse the SAME compiled executable's optimized HLO (``compiled.as_text``)
   to compute each instruction's HBM byte traffic (output + operand buffer
   sizes — standard roofline accounting, no cache-reuse credit);
3. report achieved GB/s per op against the v5e HBM peak (819 GB/s).

An op chain running at >=80% of peak is proven bandwidth-bound; one far
below peak with low MXU utilization is scheduling overhead and a real
optimization target.

Usage: python scripts/profile_darcy_bwd_bw.py [--out results/profile/darcy_bwd_bw.txt]
"""

import argparse
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()
import jax
import jax.numpy as jnp

HBM_PEAK_GBS = 819.0  # v5e HBM bandwidth peak

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(pred|[suf]\d+|bf16|f16)\[([\d,]*)\]")
# instruction definition: "  %name = <shape-or-tuple> opcode(operands...)"
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$")


def shape_bytes(text: str) -> int:
    """Total bytes of every array shape literal in `text` (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo(hlo: str):
    """name -> (output_bytes, [operand names]) for every instruction."""
    out = {}
    for line in hlo.splitlines():
        m = _DEF_RE.match(line)
        if not m or "=" not in line:
            continue
        name, rhs = m.group(1), m.group(2)
        # shape part: up to the opcode token; just measure every shape
        # literal BEFORE the first '(' (the output), operands inside parens
        paren = rhs.find("(")
        if paren < 0:
            continue
        out_bytes = shape_bytes(rhs[:paren])
        # operands: %names inside the first balanced paren group
        depth, j = 0, paren
        for j in range(paren, len(rhs)):
            if rhs[j] == "(":
                depth += 1
            elif rhs[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        operands = re.findall(r"%([\w.\-]+)", rhs[paren:j + 1])
        out[name] = (out_bytes, operands)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=64)
    ap.add_argument("--min-us", type=float, default=50.0,
                    help="report ops above this device time per iter")
    ap.add_argument("--out", default="results/profile/darcy_bwd_bw.txt")
    ap.add_argument("--dump-dir", default="/tmp/darcy_bw_dump",
                    help="raw HLO text + per-op durations land here so the "
                    "byte attribution can be iterated WITHOUT the chip")
    ap.add_argument("--analyze-only", action="store_true",
                    help="skip the chip; re-analyze the dump-dir artifacts")
    ap.add_argument("--study", default="darcy", choices=["darcy", "mechanics"])
    ap.add_argument("--fp32-head", action="store_true",
                    help="mechanics study: profile the fp32-head config")
    args = ap.parse_args()

    dump = Path(args.dump_dir)
    if args.analyze_only:
        hlo_text = (dump / "hlo.txt").read_text()
        meta = json.loads((dump / "durations.json").read_text())
        agg, wall_ms = meta["agg_us"], meta["wall_ms"]
        args.reps = meta["reps"]
        insts = parse_hlo(hlo_text)
        device_kind = meta.get("device_kind", "?")
    else:
        if args.study == "mechanics":
            from physicsinformeddiffusionmodels_tpu.config import RunConfig
            from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
            from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
                MechanicsResidual,
            )
            from physicsinformeddiffusionmodels_tpu.training import (
                create_train_state,
                make_optimizer,
                make_train_step,
            )
            from train_mechanics import build_mech_model, build_mechanics_loss_fn

            cfg = RunConfig(gov_eqs="mechanics", fp32_head=args.fp32_head)
            B, P = 6, cfg.pixels_per_dim
            model = build_mech_model(cfg)
            loss_fn = build_mechanics_loss_fn(
                model, create_schedule(cfg.diff_steps),
                MechanicsResidual(pixels_per_dim=P), cfg,
            )
            params = model.init(
                jax.random.key(1), jnp.zeros((1, P, P, 10)),
                jnp.zeros((1,), jnp.int32),
            )
            tx = make_optimizer(cfg.lr)
            state = create_train_state(params, tx)
            train_step = make_train_step(loss_fn, tx)
            key = jax.random.key(0)
            x = jax.random.normal(jax.random.key(1), (B, P + 1, P + 1, 10))
        else:
            from bench import build_darcy

            state, train_step, *_ = build_darcy(
                args.batch, args.pixels, jnp.bfloat16
            )
            key = jax.random.key(0)
            x = jax.random.normal(
                jax.random.key(1), (args.batch, args.pixels, args.pixels, 2)
            )

        # compile explicitly so the HLO text matches the traced executable
        compiled = jax.jit(train_step).lower(state, x, key).compile()
        hlo_text = compiled.as_text()
        insts = parse_hlo(hlo_text)

        step = compiled
        for _ in range(3):
            key, k = jax.random.split(key)
            state, aux = step(state, x, k)
        jax.block_until_ready(aux.loss)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            key, k = jax.random.split(key)
            state, aux = step(state, x, k)
        jax.block_until_ready(aux.loss)
        wall_ms = (time.perf_counter() - t0) / args.reps * 1e3

        logdir = "/tmp/jaxtrace_darcy_bw"
        with jax.profiler.trace(logdir):
            for _ in range(args.reps):
                key, k = jax.random.split(key)
                state, aux = step(state, x, k)
            jax.block_until_ready(aux.loss)

        paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
        with gzip.open(paths[-1], "rt") as fh:
            trace = json.load(fh)
        agg, cnt = defaultdict(float), defaultdict(int)
        for e in trace.get("traceEvents", []):
            if e.get("ph") == "X":
                agg[e.get("name", "")] += e.get("dur", 0)
                cnt[e.get("name", "")] += 1
        device_kind = jax.devices()[0].device_kind
        dump.mkdir(parents=True, exist_ok=True)
        (dump / "hlo.txt").write_text(hlo_text)
        (dump / "durations.json").write_text(json.dumps({
            "agg_us": dict(agg), "wall_ms": wall_ms, "reps": args.reps,
            "device_kind": device_kind,
        }))

    rows = []
    matched_ms = matched_bytes = 0.0
    for name, dur_us_total in agg.items():
        # host/meta events (python frames, executors, pjit wrappers) — HLO
        # instruction names never contain spaces, '$', '(' or '::'
        if " " in name or "$" in name or "::" in name or "(" in name:
            continue
        us_per_iter = dur_us_total / args.reps
        if us_per_iter < args.min_us:
            continue
        if name not in insts:
            rows.append((us_per_iter, name, None, None))
            continue
        out_b, operands = insts[name]
        op_bytes = out_b + sum(insts[o][0] for o in operands if o in insts)
        gbs = op_bytes / (us_per_iter * 1e-6) / 1e9
        rows.append((us_per_iter, name, op_bytes, gbs))
        matched_ms += us_per_iter / 1e3
        matched_bytes += op_bytes

    rows.sort(reverse=True)
    lines = [
        f"darcy train step: wall {wall_ms:.2f} ms/iter  batch={args.batch}  "
        f"device={device_kind}",
        f"HBM peak {HBM_PEAK_GBS:.0f} GB/s; bytes = output + operands "
        f"(roofline accounting, no cache-reuse credit)",
        "",
        f"{'ms/iter':>8}  {'MB':>8}  {'GB/s':>7}  {'%peak':>6}  op",
    ]
    for us, name, op_bytes, gbs in rows:
        if op_bytes is None:
            lines.append(f"{us/1e3:8.3f}  {'?':>8}  {'?':>7}  {'?':>6}  {name[:100]}")
        else:
            lines.append(
                f"{us/1e3:8.3f}  {op_bytes/1e6:8.2f}  {gbs:7.1f}  "
                f"{100*gbs/HBM_PEAK_GBS:6.1f}  {name[:100]}"
            )
    lines.append("")
    lines.append(
        f"matched ops: {matched_ms:.2f} ms/iter, {matched_bytes/1e6:.1f} MB/iter "
        f"-> aggregate {matched_bytes/1e9/(matched_ms/1e3):.1f} GB/s "
        f"({100*matched_bytes/1e9/(matched_ms/1e3)/HBM_PEAK_GBS:.1f}% of peak)"
    )

    text = "\n".join(lines) + "\n"
    print(text)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
