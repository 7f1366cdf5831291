"""Export a trained run as a small, git-committable eval checkpoint.

trained_models/ is gitignored and wiped at round boundaries, which has
twice destroyed flagship checkpoints (mech_100k after round 2, every Darcy
run after round 3). This tool writes a *portable* run directory —
`config.json` + `model/checkpoint_<step>.msgpack` holding the EMA
parameters only, cast to float16 — that `sample_eval.py --model-dir <out>`
loads directly (eval always runs on EMA weights, matching the reference's
eval-under-EMA convention, `/root/reference/main.py:183`).

float16 halves the size versus float32 (131.7M-param mechanics UNet:
~527 MB -> ~264 MB; 9.2M-param Darcy UNet: ~37 MB -> ~18 MB) while keeping
10 mantissa bits — `sample_eval.py` casts f16 leaves back to f32/bf16 at
load time, and the smoke comparison in tests/test_portable_checkpoint.py
bounds the round-trip error. The export is eval-only: it carries no raw
params and no optimizer state, so it cannot resume training.

Usage:
    python scripts/export_portable_checkpoint.py \
        --model-dir trained_models/mech_600k --out results/mech_600k/portable
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flax import serialization

from physicsinformeddiffusionmodels_tpu.training import latest_checkpoint


def cast_tree_f16(tree):
    def cast(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating):
            return x.astype(np.float16)
        return x

    return serialization.to_state_dict(
        __import__("jax").tree_util.tree_map(cast, tree)
    )


def export(model_dir: Path, out: Path, step: int | None) -> Path:
    ckpt_dir = model_dir / "model"
    path = (
        ckpt_dir / f"checkpoint_{step}.msgpack"
        if step is not None
        else latest_checkpoint(ckpt_dir)
    )
    if path is None or not Path(path).exists():
        sys.exit(f"no checkpoint under {ckpt_dir}")
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    ema = raw.get("ema_params") or raw["params"]
    step_out = int(raw.get("step", 0))
    payload = {
        "step": step_out,
        "params": {},
        "ema_params": cast_tree_f16(ema),
        "opt_state": {},
    }
    (out / "model").mkdir(parents=True, exist_ok=True)
    # a portable dir holds exactly one checkpoint: drop stale exports so
    # re-exporting a longer run doesn't accumulate large binaries
    for stale in (out / "model").glob("checkpoint_*.msgpack"):
        stale.unlink()
    dst = out / "model" / f"checkpoint_{step_out}.msgpack"
    dst.write_bytes(serialization.msgpack_serialize(payload))
    shutil.copy2(model_dir / "config.json", out / "config.json")
    print(
        f"exported {path} (step {step_out}) -> {dst} "
        f"({dst.stat().st_size / 1e6:.1f} MB, float16 EMA-only)"
    )
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    export(Path(args.model_dir), Path(args.out), args.step)


if __name__ == "__main__":
    main()
