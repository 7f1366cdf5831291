"""Darcy-flow PDE residual (pressure p, permeability K on a 64x64 grid).

Pure-function re-design of the reference's ``ResidualsDarcy``
(`/root/reference/src/residuals_darcy.py`): the interior residual is the
finite-difference Darcy equation

    eq0 = div(-K grad p) - f_s
        = (-K p_d00 - K_d0 p_d0) + (-K p_d11 - K_d1 p_d1) - f_s

with Neumann BC residuals (+-dp/dn on the four edges) appended as two extra
channels (`residuals_darcy.py:169-183`), and a static two-patch source field
f_s (+-r=10 in w=0.125 corner patches, `residuals_darcy.py:40-53,95-104`).

The derivative operators are the banded FD matrices from ``ops.fd``; the
whole residual is a handful of [H,H] einsums + elementwise work that XLA
fuses into the surrounding training step. Image layout is NHWC with
channels (p, K).

CoCoGen residual-gradient corrections (arXiv 2312.10527,
`residuals_darcy.py:209-240`) are provided as ``residual_correction``; the
step-size rule needs max_j dr/dp_j, for which we exploit that eq0 is linear
in p for fixed K: the Jacobian's nonzero entries are closed-form
combinations of the stencil rows (``_jacobian_max``), avoiding the
reference's per-sample vmapped jacfwd sweep.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.diffusion.losses import PhysicsTerms
from physicsinformeddiffusionmodels_tpu.ops.fd import StencilGradients, derivative_matrix


def source_field(pixels_per_dim: int, w: float = 0.125, r: float = 10.0) -> np.ndarray:
    """Two-corner-patch source f_s on the *cell-centered* grid
    (`residuals_darcy.py:40-53`; note the reference builds f_s on cell
    centers even when pixels sit on the boundary — for P=64, w=1/8 the
    resulting 8-pixel corner masks coincide with the boundary-grid masks the
    data generator uses)."""
    pixel = 1.0 / pixels_per_dim
    x = np.linspace(pixel / 2, 1.0 - pixel / 2, pixels_per_dim)
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = np.zeros_like(X)
    f[(np.abs(X - 0.5 * w) <= 0.5 * w) & (np.abs(Y - 0.5 * w) <= 0.5 * w)] = r
    f[(np.abs(X - 1 + 0.5 * w) <= 0.5 * w) & (np.abs(Y - 1 + 0.5 * w) <= 0.5 * w)] = -r
    return f


def trapezoidal_weights(pixels_per_dim: int) -> np.ndarray:
    """Trapezoid-rule quadrature weights on the boundary-inclusive grid
    (`residuals_darcy.py:72-92`): corners 1, edges 2, interior 4, scaled by
    (1/P)^2 / 4."""
    w = np.full((pixels_per_dim, pixels_per_dim), 4.0)
    w[0, :] = w[-1, :] = w[:, 0] = w[:, -1] = 2.0
    w[0, 0] = w[0, -1] = w[-1, 0] = w[-1, -1] = 1.0
    return w * (1.0 / pixels_per_dim) ** 2 / 4.0


@dataclasses.dataclass(frozen=True)
class DarcyResidual:
    """Darcy residual evaluator. Construct once; all methods are pure and
    jit-safe (operators and constants are closed-over jnp constants)."""

    pixels_per_dim: int = 64
    fd_acc: int = 2
    pixels_at_boundary: bool = True
    reverse_d1: bool = True
    domain_length: float = 1.0
    periodic: bool = False

    def __post_init__(self):
        P = self.pixels_per_dim
        if self.pixels_at_boundary:
            d0 = self.domain_length / (P - 1)
        else:
            d0 = self.domain_length / P
        d1 = -d0 if self.reverse_d1 else d0
        object.__setattr__(
            self, "grads", StencilGradients(P, P, d0=d0, d1=d1, fd_acc=self.fd_acc, periodic=self.periodic)
        )
        object.__setattr__(self, "d0", d0)
        object.__setattr__(self, "d1", d1)
        object.__setattr__(self, "f_s", jnp.asarray(source_field(P), jnp.float32))
        object.__setattr__(
            self, "quad_weights", jnp.asarray(trapezoidal_weights(P), jnp.float32)
        )

    @property
    def gov_eqs(self) -> str:
        return "darcy"

    def residual(self, x0_pred: jax.Array) -> jax.Array:
        """Residual of an NHWC (p, K) prediction.

        Returns [B, H*W, 3]: channel 0 the interior PDE residual, channels
        1-2 the Neumann BC residuals on the d0/d1 edges (zero in the
        interior), matching the reference layout (`residuals_darcy.py:183`).
        """
        assert x0_pred.ndim == 4 and x0_pred.shape[-1] == 2, (
            f"expected NHWC (p,K) image, got {x0_pred.shape}"
        )
        B, H, W, _ = x0_pred.shape
        # PDE residual in fp32 regardless of the model's compute dtype
        x0_pred = x0_pred.astype(jnp.float32)
        p = x0_pred[..., 0]
        K = x0_pred[..., 1]
        g = self.grads
        # whole derivative set in two stacked contractions: (p, K) ride the
        # batch axis and each axis operator is [2H, H] (first+second rows),
        # so the H-axis relayout happens once instead of three times; the
        # unused K second derivatives are ~1% of the matmul flops, far below
        # the transpose traffic they replace
        pk = jnp.concatenate([p, K], axis=0)
        d0, d1, d00, d11 = g.first_second_pair(pk)
        p_d0, K_d0 = d0[:B], d0[B:]
        p_d1, K_d1 = d1[:B], d1[B:]
        p_d00, p_d11 = d00[:B], d11[:B]

        eq0 = (-K * p_d00 - K_d0 * p_d0) + (-K * p_d11 - K_d1 * p_d1) - self.f_s

        # Neumann BC residual channels (+-dp/dn on the 4 edges;
        # `residuals_darcy.py:169-183`). Sign of the d1 edges flips with
        # reverse_d1 to stay consistent with the plotting orientation.
        bc0 = jnp.zeros((B, H, W), x0_pred.dtype)
        bc0 = bc0.at[:, 0, :].set(-p_d0[:, 0, :])
        bc0 = bc0.at[:, -1, :].set(p_d0[:, -1, :])
        bc1 = jnp.zeros((B, H, W), x0_pred.dtype)
        if self.reverse_d1:
            bc1 = bc1.at[:, :, 0].set(p_d1[:, :, 0])
            bc1 = bc1.at[:, :, -1].set(-p_d1[:, :, -1])
        else:
            bc1 = bc1.at[:, :, 0].set(-p_d1[:, :, 0])
            bc1 = bc1.at[:, :, -1].set(p_d1[:, :, -1])

        res = jnp.stack([eq0, bc0, bc1], axis=-1)
        return res.reshape(B, H * W, 3)

    def __call__(self, x0_pred: jax.Array) -> PhysicsTerms:
        return PhysicsTerms(residual=self.residual(x0_pred))

    def zero_mean_pressure(self, x0_pred: jax.Array) -> jax.Array:
        """Subtract the (stop-gradient) trapezoid-rule integral of p so the
        integral gauge condition holds by construction
        (`residuals_darcy.py:157-167`; gradient flows only through the
        uncorrected p). Does not change the residual."""
        p = x0_pred[..., 0]
        if self.pixels_at_boundary:
            corr = jnp.sum(self.quad_weights * jax.lax.stop_gradient(p), axis=(1, 2))
        else:
            corr = jax.lax.stop_gradient(p).mean(axis=(1, 2))
        p = p - corr[:, None, None]
        return jnp.stack([p, x0_pred[..., 1]], axis=-1)

    # ---------------------------------------------------------------- CoCoGen

    def _jacobian_max(self, K: jax.Array) -> jax.Array:
        """max_{i,j} of the residual Jacobian d r / d p per sample.

        eq0 is linear in p for fixed K; with M = kron structure the nonzero
        Jacobian entries for pixel (i,j) are

          same-column block (row i' varies):
            -K[i,j] D00[i,i'] - K_d0[i,j] D0[i,i']  (+ diagonal overlap term)
          same-row block (col j' varies):
            -K[i,j] D11[j,j'] - K_d1[i,j] D1[j,j']

        plus the constant BC-channel entries +-D0 / +-D1 on the edges.
        Matches the reference's jacfwd-based max (`residuals_darcy.py:220-233`)
        without materializing [HW*3, HW] per sample.
        """
        g = self.grads
        K_d0, K_d1 = g.d_d0(K), g.d_d1(K)
        D0, D00 = g.D0_1, g.D0_2
        D1, D11 = g.D1_1, g.D1_2

        # same-column entries: [B, i, j, i']  (j' == j)
        colvals = (
            -K[..., None] * D00[None, :, None, :]
            - K_d0[..., None] * D0[None, :, None, :]
        )
        # diagonal overlap: add the (i'==i, j'==j) part of the d1 block
        diag_extra = -K * jnp.diag(D11)[None, None, :] - K_d1 * jnp.diag(D1)[None, None, :]
        eye = jnp.eye(D0.shape[0])[None, :, None, :]
        colvals = colvals + diag_extra[..., None] * eye
        # same-row entries: [B, i, j, j']  (i' == i; exclude diagonal, counted above)
        rowvals = (
            -K[..., None] * D11[None, None, :, :]
            - K_d1[..., None] * D1[None, None, :, :]
        )
        diag_mask = jnp.eye(D1.shape[0], dtype=bool)[None, None, :, :]
        rowvals = jnp.where(diag_mask, -jnp.inf, rowvals)

        m = jnp.maximum(
            colvals.max(axis=(1, 2, 3)), rowvals.max(axis=(1, 2, 3))
        )
        # BC channels contribute constant entries ±D0/±D1 rows
        bc_max = jnp.maximum(jnp.abs(D0).max(), jnp.abs(D1).max())
        return jnp.maximum(m, bc_max)

    def residual_correction(self, x: jax.Array, n_steps: int = 1):
        """One (or more) CoCoGen correction steps on an NHWC (p, K) state
        (`residuals_darcy.py:209-240`): p <- p - eps * d(sum r^2)/dp with
        eps = 1e-6 / clamp(max dr/dp, 1e12). Returns (x_corrected, residual
        after correction)."""

        def sum_sq(xx):
            r = self.residual(xx)
            return jnp.sum(r**2)

        for _ in range(n_steps):
            dr = jax.grad(sum_sq)(x)[..., 0]  # gradient w.r.t. p only
            max_dr_dp = jnp.clip(self._jacobian_max(x[..., 1]), max=1e12)
            eps = 1e-6 / max_dr_dp
            p = x[..., 0] - eps[:, None, None] * jax.lax.stop_gradient(dr)
            x = jnp.stack([p, x[..., 1]], axis=-1)
        return x, self.residual(x)

    def residual_gradient(self, x: jax.Array) -> jax.Array:
        """d mean|r| / d x — the conditioning signal for residual-gradient
        classifier-free guidance (`residuals_darcy.py:116-126`)."""

        def mean_abs(xx):
            return jnp.abs(self.residual(xx)).mean()

        return jax.grad(mean_abs)(x)
