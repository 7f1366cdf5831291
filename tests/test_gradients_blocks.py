"""Tests for ops.gradients (GradientsHelper parity) and models.blocks
(SignalEmbedding ablation encoder)."""

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.models.blocks import SignalEmbedding
from physicsinformeddiffusionmodels_tpu.ops.fd import StencilGradients
from physicsinformeddiffusionmodels_tpu.ops.gradients import (
    hessian_autodiff,
    hessian_numeric,
    image_jacobian,
    jacobian_autodiff,
    jacobian_numeric,
)


def _quadratic(x):
    # f: R^3 -> R^2 with known jacobian/hessian
    return jnp.stack([x[..., 0] ** 2 + x[..., 1] * x[..., 2], x[..., 2] ** 2])


def test_jacobian_numeric_matches_autodiff():
    x = jnp.array([0.7, -0.3, 1.2])
    jn = jacobian_numeric(_quadratic, x, eps=1e-3)
    ja = jacobian_autodiff(_quadratic, x, mode="fwd")
    np.testing.assert_allclose(np.asarray(jn), np.asarray(ja), atol=1e-3)


def test_hessian_numeric_matches_autodiff_scalar():
    f = lambda x: (x[..., 0] ** 2 * x[..., 1] + x[..., 1] ** 3).sum()
    x = jnp.array([0.5, -1.1, 0.2])
    hn = hessian_numeric(f, x, eps=1e-2)
    ha = hessian_autodiff(f, x)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(ha), atol=1e-1)


def test_batched_jacobian_shapes():
    xs = jnp.ones((4, 3))
    j = jacobian_autodiff(_quadratic, xs, mode="rev", batched=True)
    assert j.shape == (4, 2, 3)
    h = hessian_autodiff(lambda x: (x**2).sum(), xs, batched=True)
    assert h.shape == (4, 3, 3)


def test_image_jacobian_stacks_first_derivatives():
    grads = StencilGradients(h=8, w=8, d0=1.0 / 7, d1=1.0 / 7, fd_acc=2)
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 1, 8, 8)
    jac = image_jacobian(grads, x)
    assert jac.shape == (1, 1, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(jac[:, :, 0]), np.asarray(grads.d_d0(x)), rtol=1e-6)


def test_signal_embedding_cnn_and_gru():
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 32))
    for arch in ("CNN", "GRU"):
        m = SignalEmbedding(arch=arch)
        params = m.init(key, x)
        out = m.apply(params, x)
        assert out.shape[0] == 2 and out.ndim == 2
        assert np.isfinite(np.asarray(out)).all()
