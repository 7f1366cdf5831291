"""UNet denoiser: shapes, capability knobs, equivariances. Small dims/grids
keep the single-CPU compile time down."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.models.unet import UNet, apply_with_guidance

DIM, P = 16, 16


@pytest.fixture(scope="module")
def small():
    model = UNet(dim=DIM, channels=2, resnet_groups=8)
    x = jnp.zeros((2, P, P, 2))
    t = jnp.array([0, 50])
    params = model.init(jax.random.key(0), x, t)
    return model, params


def test_forward_shape_and_finite(small):
    model, params = small
    x = jax.random.normal(jax.random.key(1), (2, P, P, 2))
    y = model.apply(params, x, jnp.array([3, 99]))
    assert y.shape == (2, P, P, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_time_conditioning_changes_output(small):
    model, params = small
    x = jax.random.normal(jax.random.key(1), (1, P, P, 2))
    y0 = model.apply(params, x, jnp.array([0]))
    y99 = model.apply(params, x, jnp.array([99]))
    assert np.abs(np.asarray(y0 - y99)).max() > 1e-4


def test_out_dim_and_sigmoid():
    model = UNet(dim=DIM, channels=4, out_dim=3, sigmoid_last_channel=True)
    x = jax.random.normal(jax.random.key(0), (1, P, P, 4))
    params = model.init(jax.random.key(0), x, jnp.array([1]))
    y = model.apply(params, x, jnp.array([1]))
    assert y.shape == (1, P, P, 3)
    last = np.asarray(y[..., -1])
    assert (last >= 0).all() and (last <= 1).all()


def test_circular_padding_shift_equivariance():
    """With circular padding the (attention-free) network commutes with
    cyclic pixel shifts (`unet_model.py:171-199` motivation: periodic BCs)."""
    model = UNet(
        dim=DIM, channels=2, padding_mode="circular",
        use_sparse_linear_attn=False, frame_attention=False,
    )
    x = jax.random.normal(jax.random.key(2), (1, P, P, 2))
    params = model.init(jax.random.key(0), x, jnp.array([5]))
    y = model.apply(params, x, jnp.array([5]))
    # shift must be divisible by the total downsampling stride (2^3 = 8)
    shift = 8
    x_s = jnp.roll(x, shift, axis=1)
    y_s = model.apply(params, x_s, jnp.array([5]))
    np.testing.assert_allclose(
        np.asarray(jnp.roll(y, shift, axis=1)), np.asarray(y_s), atol=1e-4
    )


def test_zero_padding_not_shift_equivariant():
    model = UNet(
        dim=DIM, channels=2, padding_mode="zeros",
        use_sparse_linear_attn=False, frame_attention=False,
    )
    x = jax.random.normal(jax.random.key(2), (1, P, P, 2))
    params = model.init(jax.random.key(0), x, jnp.array([5]))
    y = model.apply(params, x, jnp.array([5]))
    x_s = jnp.roll(x, 4, axis=1)
    y_s = model.apply(params, x_s, jnp.array([5]))
    assert np.abs(np.asarray(jnp.roll(y, 4, axis=1) - y_s)).max() > 1e-3


def test_classifier_free_guidance(small):
    model, params = small
    x = jax.random.normal(jax.random.key(3), (2, P, P, 2))
    cond = jax.random.normal(jax.random.key(4), (2, P, P, 2))
    t = jnp.array([10, 20])
    guided = apply_with_guidance(model, params, x, t, cond, guidance_scale=3.0)
    null = model.apply(params, x, t, cond=cond, null_cond_prob=1.0)
    full = model.apply(params, x, t, cond=cond, null_cond_prob=0.0)
    np.testing.assert_allclose(
        np.asarray(guided), np.asarray(null + 3.0 * (full - null)), atol=1e-5
    )
    # scale 1 returns the conditional logits directly
    g1 = apply_with_guidance(model, params, x, t, cond, guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(full), atol=1e-6)


def test_unconditioned_matches_condpath_free():
    """cond=None output is independent of the (dead) cond-path params."""
    m1 = UNet(dim=DIM, channels=2, cond_path=True)
    m2 = UNet(dim=DIM, channels=2, cond_path=False)
    x = jax.random.normal(jax.random.key(5), (1, P, P, 2))
    p1 = m1.init(jax.random.key(0), x, jnp.array([1]))
    y1 = m1.apply(p1, x, jnp.array([1]))
    # strip cond-path params and run the cond-free architecture
    inner = {k: v for k, v in p1["params"].items() if not k.startswith(("emb_conv", "combine_conv"))}
    y2 = m2.apply({"params": inner}, x, jnp.array([1]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_self_condition():
    model = UNet(dim=DIM, channels=2, self_condition=True)
    x = jax.random.normal(jax.random.key(6), (1, P, P, 2))
    params = model.init(jax.random.key(0), x, jnp.array([1]))
    y_none = model.apply(params, x, jnp.array([1]))
    y_sc = model.apply(params, x, jnp.array([1]), x_self_cond=x)
    assert y_none.shape == (1, P, P, 2)
    assert np.abs(np.asarray(y_none - y_sc)).max() > 1e-5


def test_video_frames_path():
    model = UNet(dim=DIM, channels=2)
    x = jax.random.normal(jax.random.key(7), (1, 3, P, P, 2))
    params = model.init(jax.random.key(0), x, jnp.array([1]))
    y = model.apply(params, x, jnp.array([1]))
    assert y.shape == (1, 3, P, P, 2)
    # F=1 video input returns a frame axis too
    x1 = x[:, :1]
    p1 = model.init(jax.random.key(0), x1, jnp.array([1]))
    assert model.apply(p1, x1, jnp.array([1])).shape == (1, 1, P, P, 2)


def test_cm_conv_stages_matches_default():
    """The experimental channel-major conv-stage path must be numerically
    equivalent to the default path (same params, same math)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from physicsinformeddiffusionmodels_tpu.models.unet import UNet

    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 2))
    t = jnp.array([3, 50])
    m_def = UNet(dim=32, channels=2)
    m_cm = UNet(dim=32, channels=2, cm_conv_stages=True)
    params = m_def.init(jax.random.key(1), x[:1], t[:1])
    y_def = m_def.apply(params, x, t)
    y_cm = m_cm.apply(params, x, t)
    np.testing.assert_allclose(
        np.asarray(y_cm), np.asarray(y_def), atol=2e-4, rtol=2e-4)


def test_fp32_head_under_bf16():
    """fp32_head: same param tree as the plain bf16 build (checkpoint
    compatible), fp32 output dtype, and numerics within bf16 tolerance of
    the fp32 build — the drift-fix lever (docs/DARCY_DRIFT.md)."""
    x = jax.random.normal(jax.random.key(2), (2, P, P, 2))
    t = jnp.array([3, 50])
    m_bf16 = UNet(dim=DIM, channels=2, dtype=jnp.bfloat16)
    m_head = UNet(dim=DIM, channels=2, dtype=jnp.bfloat16, fp32_head=True)
    m_f32 = UNet(dim=DIM, channels=2)
    params = m_f32.init(jax.random.key(1), x[:1], t[:1])
    p_head = m_head.init(jax.random.key(1), x[:1], t[:1])
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p_head)

    y_head = m_head.apply(params, x, t)
    assert y_head.dtype == jnp.float32
    assert m_bf16.apply(params, x, t).dtype == jnp.bfloat16

    # output granularity: the head output must not be bf16-quantized
    y_f32 = m_f32.apply(params, x, t)
    q = jnp.abs(y_head - y_head.astype(jnp.bfloat16).astype(jnp.float32))
    assert float(q.max()) > 0.0  # carries sub-bf16 structure
    # and it tracks the fp32 forward within bf16 body tolerance
    assert float(jnp.abs(y_head - y_f32).max()) < 0.1
