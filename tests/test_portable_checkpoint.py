"""Portable (git-committable) f16 EMA-only checkpoint export + reload.

scripts/export_portable_checkpoint.py writes an eval-only run directory
(config.json + model/checkpoint_<step>.msgpack with float16 EMA weights);
sample_eval.load_run must restore it with every float leaf back in float32.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.training import save_checkpoint

from export_portable_checkpoint import export
from sample_eval import load_run


@pytest.fixture
def fake_run(tmp_path):
    params = {
        "dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0},
    }
    ema = {
        "dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4) / 13.0},
    }
    opt = {"count": np.asarray(42, dtype=np.int32)}
    run = tmp_path / "run"
    save_checkpoint(
        run / "model", 1234, params=params, ema_params=ema, opt_state=opt
    )
    RunConfig(gov_eqs="darcy").save(run / "config.json")
    return run, params, ema


def test_export_is_f16_ema_only_and_smaller(fake_run, tmp_path):
    run, _, ema = fake_run
    out = tmp_path / "portable"
    dst = export(run, out, step=None)
    assert dst.name == "checkpoint_1234.msgpack"
    assert (out / "config.json").exists()

    from flax import serialization

    raw = serialization.msgpack_restore(dst.read_bytes())
    assert raw["params"] == {}
    assert raw["opt_state"] == {}
    leaf = raw["ema_params"]["dense"]["kernel"]
    assert leaf.dtype == np.float16
    np.testing.assert_allclose(leaf, ema["dense"]["kernel"], rtol=1e-3)
    full = (run / "model" / "checkpoint_1234.msgpack").stat().st_size
    assert dst.stat().st_size < full


def test_load_run_restores_f16_to_f32(fake_run, tmp_path):
    run, _, ema = fake_run
    out = tmp_path / "portable"
    export(run, out, step=None)
    cfg, raw = load_run(str(out), step=None)
    assert cfg.gov_eqs == "darcy"
    leaf = raw["ema_params"]["dense"]["kernel"]
    assert leaf.dtype == np.float32
    np.testing.assert_allclose(leaf, ema["dense"]["kernel"], rtol=1e-3)
    # eval path picks EMA when present
    assert raw["ema_params"] or raw["params"]


def test_export_falls_back_to_raw_params(tmp_path):
    params = {"w": np.ones((2, 2), dtype=np.float32)}
    run = tmp_path / "run"
    save_checkpoint(run / "model", 7, params=params, ema_params=None)
    RunConfig(gov_eqs="darcy").save(run / "config.json")
    out = tmp_path / "portable"
    export(run, out, step=None)

    from flax import serialization

    raw = serialization.msgpack_restore(
        (out / "model" / "checkpoint_7.msgpack").read_bytes()
    )
    assert raw["ema_params"]["w"].dtype == np.float16
    np.testing.assert_allclose(raw["ema_params"]["w"], params["w"])
