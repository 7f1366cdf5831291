"""Reference-execution parity: the torch ``Unet3D`` forward vs the JAX
``UNet`` with TRANSPLANTED weights (models.reference_port).

Runs the reference's actual `unet_model.py` on torch-cpu (via
tests/reference_shims) with a seeded init, imports its state dict into the
Flax model, and asserts the two denoiser forwards agree to fp32 tolerance
on identical inputs — the strongest form of architecture parity
(`unet_model.py:406-622`).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

_SHIMS = Path(__file__).parent / "reference_shims"
_REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_unet_module():
    if not _REF.exists():
        pytest.skip("reference tree not available")
    sys.path.insert(0, str(_SHIMS))
    sys.path.insert(0, str(_REF))
    try:
        from src import unet_model
    finally:
        sys.path.remove(str(_SHIMS))
        sys.path.remove(str(_REF))
    return unet_model


def _build_pair(ref_unet_module, *, dim, channels, out_dim, sigmoid_last=False,
                pixels=64):
    from physicsinformeddiffusionmodels_tpu.models.reference_port import (
        import_reference_state_dict,
        reference_key_map,
    )
    from physicsinformeddiffusionmodels_tpu.models.unet import UNet

    torch.manual_seed(1234)
    tm = ref_unet_module.Unet3D(
        dim=dim, channels=channels, out_dim=out_dim,
        sigmoid_last_channel=sigmoid_last,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = UNet(
        dim=dim, channels=channels, out_dim=out_dim,
        frame_attention=False, sigmoid_last_channel=sigmoid_last,
        dtype=jnp.float32,
    )
    template = jm.init(
        jax.random.key(0),
        jnp.zeros((1, pixels, pixels, channels), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    key_map = reference_key_map(dim=dim)
    params, unused = import_reference_state_dict(sd, template, key_map)
    # everything left over must be the reference's dead modules
    allowed = (
        "time_rel_pos_bias", "sign_emb_CNN", "init_temporal_attn",
        "mid_temporal_attn", "rotary", ".to_q.", ".to_k.", ".to_v.",
    )
    leftovers = [k for k in unused if not any(a in k for a in allowed)]
    assert leftovers == [], f"unexpectedly unmapped reference params: {leftovers}"
    return tm, jm, params


class TestUNetForwardParity:
    def test_darcy_uncond_forward(self, ref_unet_module):
        tm, jm, params = _build_pair(
            ref_unet_module, dim=32, channels=2, out_dim=2)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 64, 64, 2)).astype(np.float32)
        t = np.array([7, 53], np.int64)

        with torch.no_grad():
            # reference image layout: [B, C, H, W] (`unet_model.py:555-558`)
            y_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)

        y_j = np.asarray(jm.apply(params, jnp.asarray(x), jnp.asarray(t)))

        scale = np.abs(y_t).max()
        assert scale > 1e-3  # non-degenerate output
        np.testing.assert_allclose(y_j, y_t, atol=5e-4 * scale, rtol=0)

    def test_darcy_cond_forward(self, ref_unet_module):
        """Gradient-conditioning path: emb_conv/combine_conv live
        (`unet_model.py:571-587`)."""
        tm, jm, params = _build_pair(
            ref_unet_module, dim=32, channels=2, out_dim=2)

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 64, 64, 2)).astype(np.float32)
        cond = rng.standard_normal((2, 64, 64, 2)).astype(np.float32)
        t = np.array([11, 90], np.int64)

        with torch.no_grad():
            # reference cond layout: [B, P*P, C] (`unet_model.py:576-583`)
            cond_t = torch.from_numpy(cond.reshape(2, -1, 2))
            y_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t), cond=cond_t,
                     null_cond_prob=0.0).numpy().transpose(0, 2, 3, 1)

        y_j = np.asarray(jm.apply(
            params, jnp.asarray(x), jnp.asarray(t), cond=jnp.asarray(cond)))

        scale = np.abs(y_t).max()
        np.testing.assert_allclose(y_j, y_t, atol=5e-4 * scale, rtol=0)

    def test_mechanics_shaped_forward(self, ref_unet_module):
        """Mechanics-architecture config: multi-channel conditional input,
        distinct out_dim, sigmoid on the last output channel
        (`unet_model.py:528,621-622`; widths scaled down for CPU speed —
        the mapping is width-agnostic)."""
        tm, jm, params = _build_pair(
            ref_unet_module, dim=16, channels=10, out_dim=3,
            sigmoid_last=True, pixels=32)

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 32, 32, 10)).astype(np.float32)
        t = np.array([0, 42], np.int64)

        with torch.no_grad():
            y_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)

        y_j = np.asarray(jm.apply(params, jnp.asarray(x), jnp.asarray(t)))

        assert 0.0 <= y_j[..., -1].min() and y_j[..., -1].max() <= 1.0
        scale = np.abs(y_t).max()
        np.testing.assert_allclose(y_j, y_t, atol=5e-4 * scale, rtol=0)


def test_checkpoint_file_roundtrip(ref_unet_module, tmp_path):
    """A reference checkpoint_<step>.pt file (torch.save of {'model': sd},
    `denoising_utils.py:281-287`) loads through state_dict_from_torch_file
    and produces the identical imported tree as the in-memory state dict."""
    from physicsinformeddiffusionmodels_tpu.models.reference_port import (
        import_reference_state_dict,
        reference_key_map,
        state_dict_from_torch_file,
    )
    from physicsinformeddiffusionmodels_tpu.models.unet import UNet

    torch.manual_seed(7)
    tm = ref_unet_module.Unet3D(dim=16, channels=2, out_dim=2)
    path = tmp_path / "checkpoint_100.pt"
    with open(path, "wb") as f:
        torch.save({"model": tm.state_dict()}, f)

    jm = UNet(dim=16, channels=2, out_dim=2, frame_attention=False)
    template = jm.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 2), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    key_map = reference_key_map(dim=16)

    sd_file = state_dict_from_torch_file(path)
    sd_mem = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p_file, _ = import_reference_state_dict(sd_file, template, key_map)
    p_mem, _ = import_reference_state_dict(sd_mem, template, key_map)

    import jax.tree_util as jtu

    for a, b in zip(jtu.tree_leaves(p_file), jtu.tree_leaves(p_mem)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_cli_roundtrip(ref_unet_module, tmp_path):
    """scripts/import_reference_checkpoint.py converts a reference run dir
    (checkpoint_<step>.pt + model.yaml) into a native run that
    load_checkpoint restores — the migration workflow end-to-end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "import_reference_checkpoint",
        Path(__file__).parent.parent / "scripts" / "import_reference_checkpoint.py",
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    torch.manual_seed(9)
    tm = ref_unet_module.Unet3D(dim=32, channels=2, out_dim=2)
    ref_dir = tmp_path / "ref_run" / "model"
    ref_dir.mkdir(parents=True)
    with open(ref_dir / "checkpoint_12345.pt", "wb") as f:
        torch.save({"model": tm.state_dict()}, f)
    (ref_dir / "model.yaml").write_text(
        "c_data: 1.0\nc_residual: 0.001\nc_ineq: 0.0\nlambda_opt: 0.0\n"
        "diff_steps: 100\nx0_estimation: mean\nddim_steps: 10\n"
        "residual_grad_guidance: false\ncorrection_mode: None\n"
        "M_correction: 0\nN_correction: 0\ngov_eqs: darcy\nfd_acc: 2\n"
    )

    out = tmp_path / "imported"
    cli.main([
        "--checkpoint", str(ref_dir / "checkpoint_12345.pt"),
        "--model-yaml", str(ref_dir / "model.yaml"),
        "--out", str(out),
    ])

    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.training import (
        latest_checkpoint,
        load_checkpoint,
    )

    cfg = RunConfig.load(out / "config.json")
    assert cfg.gov_eqs == "darcy" and cfg.frame_attention is False
    ckpt = latest_checkpoint(out / "model")
    assert ckpt is not None and "12345" in ckpt.name
    raw = load_checkpoint(ckpt)
    assert raw["step"] == 12345
    assert raw["ema_params"]  # EMA slot filled (reference saves EMA weights)
    got = np.asarray(
        raw["params"]["params"]["final_conv"]["bias"], dtype=np.float32)
    np.testing.assert_allclose(
        got, tm.final_conv[1].bias.detach().numpy(), rtol=0, atol=0)
