"""Finite-difference operator tests: Fornberg coefficients vs textbook
tables, polynomial exactness, periodic mode, and structural equivalence with
the reference's 9-region boundary-stencil scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _x64():
    """FD exactness checks need float64 end-to-end."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

from physicsinformeddiffusionmodels_tpu.ops.fd import (
    StencilGradients,
    central_stencil,
    derivative_matrix,
    fornberg_weights,
)


def test_central_coefficients_acc2():
    off, w = central_stencil(1, 2)
    np.testing.assert_array_equal(off, [-1, 0, 1])
    np.testing.assert_allclose(w, [-0.5, 0.0, 0.5], atol=1e-12)
    off, w = central_stencil(2, 2)
    np.testing.assert_allclose(w, [1.0, -2.0, 1.0], atol=1e-12)


def test_central_coefficients_acc4():
    off, w = central_stencil(1, 4)
    np.testing.assert_array_equal(off, [-2, -1, 0, 1, 2])
    np.testing.assert_allclose(w, [1 / 12, -2 / 3, 0, 2 / 3, -1 / 12], atol=1e-12)
    _, w = central_stencil(2, 4)
    np.testing.assert_allclose(w, [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], atol=1e-12)


def test_onesided_coefficients_acc2():
    # forward stencils at the boundary (findiff's 'L' stencils, acc=2)
    w = fornberg_weights(0.0, np.arange(3.0), 1)
    np.testing.assert_allclose(w, [-1.5, 2.0, -0.5], atol=1e-12)
    w = fornberg_weights(0.0, np.arange(4.0), 2)
    np.testing.assert_allclose(w, [2.0, -5.0, 4.0, -1.0], atol=1e-12)


def test_matrix_rows_acc2():
    D = np.asarray(derivative_matrix(8, 1.0, 1, acc=2))
    np.testing.assert_allclose(D[0, :3], [-1.5, 2.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(D[3, 2:5], [-0.5, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(D[-1, -3:], [0.5, -2.0, 1.5], atol=1e-6)


@pytest.mark.parametrize("acc", [2, 4])
def test_polynomial_exactness(acc):
    """acc-order FD differentiates degree <= acc (+m-1) polynomials exactly,
    including at boundary rows (float64 host matrices)."""
    from physicsinformeddiffusionmodels_tpu.ops.fd import _derivative_matrix_np

    n, d = 24, 0.173
    x = np.arange(n) * d
    for m in (1, 2):
        D = _derivative_matrix_np(n, m, acc, False) / d**m
        deg = acc + m - 1
        f = x**deg
        true = np.prod(deg - np.arange(m)) * x ** (deg - m)
        np.testing.assert_allclose(D @ f, true, rtol=1e-9, atol=1e-9)


def test_negative_spacing_sign():
    """reverse_d1 flips odd derivatives, not even ones."""
    n, d = 16, 0.1
    x = np.arange(n) * d
    f = np.sin(x)
    D1p = np.asarray(derivative_matrix(n, d, 1, dtype=jnp.float64))
    D1n = np.asarray(derivative_matrix(n, -d, 1, dtype=jnp.float64))
    np.testing.assert_allclose(D1p @ f, -(D1n @ f), atol=1e-12)
    D2p = np.asarray(derivative_matrix(n, d, 2, dtype=jnp.float64))
    D2n = np.asarray(derivative_matrix(n, -d, 2, dtype=jnp.float64))
    np.testing.assert_allclose(D2p @ f, D2n @ f, atol=1e-12)


def test_periodic_derivative():
    n = 64
    d = 2 * np.pi / n
    x = np.arange(n) * d
    f = np.sin(x)
    D = np.asarray(derivative_matrix(n, d, 1, acc=4, periodic=True, dtype=jnp.float64))
    np.testing.assert_allclose(D @ f, np.cos(x), atol=1e-5)


def _reference_style_stencil_apply(f, d, m, axis):
    """Independent re-derivation of the reference's scheme
    (`grad_utils.py:83-142`, acc=2): interior central stencil, boundary rows
    overwritten with one-sided stencils."""
    if axis == 1:
        return _reference_style_stencil_apply(f.T, d, m, 0).T
    out = np.zeros_like(f)
    if m == 1:
        c, lo = np.array([-0.5, 0, 0.5]) / d, np.array([-1.5, 2, -0.5]) / d
    else:
        c, lo = np.array([1.0, -2, 1]) / d**2, np.array([2.0, -5, 4, -1]) / d**2
    for i in range(1, f.shape[0] - 1):
        out[i] = sum(ck * f[i + o] for ck, o in zip(c, (-1, 0, 1)))
    out[0] = sum(ck * f[k] for k, ck in enumerate(lo))
    out[-1] = sum(ck * f[-1 - k] for k, ck in enumerate(lo * (-1 if m == 1 else 1)))
    return out


def test_equivalence_with_reference_scheme():
    """The matrix form reproduces the reference's interior+boundary conv
    scheme exactly at acc=2."""
    rng = np.random.default_rng(0)
    f = rng.normal(size=(16, 16))
    d = 1 / 15.0
    g = StencilGradients(16, 16, d0=d, d1=-d, fd_acc=2, dtype=jnp.float64)
    fb = f[None]
    np.testing.assert_allclose(
        np.asarray(g.d_d0(fb))[0], _reference_style_stencil_apply(f, d, 1, 0), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g.d_d1(fb))[0], _reference_style_stencil_apply(f, -d, 1, 1), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g.d_d00(fb))[0], _reference_style_stencil_apply(f, d, 2, 0), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g.d_d11(fb))[0], _reference_style_stencil_apply(f, -d, 2, 1), atol=1e-9
    )


def test_mixed_derivative():
    """d01 of x*y is 1 everywhere (product of 1D exact operators)."""
    n, d = 12, 0.25
    x = np.arange(n) * d
    F = np.outer(x, x)
    g = StencilGradients(n, n, d0=d, d1=d, fd_acc=2, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(g.d_d01(F[None]))[0], 1.0, atol=1e-6)


def test_first_second_pair_matches_individual_ops():
    """The stacked [2N,N] contraction returns exactly the four individual
    operator applications (same row dot products, fewer relayouts)."""
    g = StencilGradients(9, 7, d0=0.3, d1=-0.5, fd_acc=2, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((4, 9, 7)))
    d0, d1, d00, d11 = g.first_second_pair(f)
    np.testing.assert_allclose(d0, g.d_d0(f), rtol=1e-12)
    np.testing.assert_allclose(d1, g.d_d1(f), rtol=1e-12)
    np.testing.assert_allclose(d00, g.d_d00(f), rtol=1e-12)
    np.testing.assert_allclose(d11, g.d_d11(f), rtol=1e-12)
