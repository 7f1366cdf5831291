"""Convert a reference (torch) run into this framework's checkpoint layout.

Takes the reference's ``checkpoint_<step>.pt`` (+ optionally its
``model.yaml``, `denoising_utils.py:273-287`) and writes a
``trained_models/<name>/`` directory — ``model/checkpoint_<step>.msgpack``
+ ``config.json`` — that every existing tool here (``sample_eval.py``,
``load_checkpoint``, resume) consumes directly. The reference saves EMA
weights into the checkpoint (`main.py:183,313-316` applies EMA before
saving), so the imported tree is stored in BOTH the ``params`` and
``ema_params`` slots.

    python scripts/import_reference_checkpoint.py \
        --checkpoint ref_run/model/checkpoint_300000.pt \
        --model-yaml ref_run/model/model.yaml \
        --gov-eqs darcy --out trained_models/ref_darcy

Note: imported models correspond to ``UNet(frame_attention=False)`` (the
reference never invokes its temporal attention; see
models/reference_port.py) — the written config records that.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.models.reference_port import (
    import_reference_state_dict,
    reference_key_map,
    state_dict_from_torch_file,
)
from physicsinformeddiffusionmodels_tpu.models.unet import UNet
from physicsinformeddiffusionmodels_tpu.training import save_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="reference checkpoint_<step>.pt")
    ap.add_argument("--model-yaml", default=None,
                    help="reference model.yaml saved next to the checkpoint")
    ap.add_argument("--gov-eqs", default=None, choices=["darcy", "mechanics"],
                    help="study (defaults to the yaml's gov_eqs, else darcy)")
    ap.add_argument("--out", required=True, help="output run directory")
    args = ap.parse_args(argv)

    overrides = {"frame_attention": False}
    if args.gov_eqs:
        overrides["gov_eqs"] = args.gov_eqs
    if args.model_yaml:
        cfg = RunConfig.from_model_yaml(args.model_yaml, **overrides)
    else:
        cfg = RunConfig(**overrides)

    m = re.search(r"checkpoint_(\d+)", Path(args.checkpoint).name)
    step = int(m.group(1)) if m else 0

    model = UNet(
        dim=cfg.unet_dim,
        channels=cfg.model_channels,
        out_dim=cfg.output_channels,
        sigmoid_last_channel=cfg.gov_eqs == "mechanics",
        frame_attention=False,
    )
    P = cfg.pixels_per_dim
    template = model.init(
        jax.random.key(0),
        jnp.zeros((1, P, P, cfg.model_channels)),
        jnp.zeros((1,), jnp.int32),
    )

    sd = state_dict_from_torch_file(args.checkpoint)
    params, unused = import_reference_state_dict(
        sd, template, reference_key_map(dim=cfg.unet_dim))
    print(f"imported {len(sd) - len(unused)}/{len(sd)} reference tensors "
          f"({len(unused)} dead-module tensors skipped)")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg.save(out / "config.json")
    # the reference checkpoint holds EMA weights — fill both slots
    path = save_checkpoint(out / "model", step, params=params, ema_params=params)
    (out / "model" / "config.json").write_text(cfg.to_json())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
