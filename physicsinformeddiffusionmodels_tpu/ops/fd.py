"""Finite-difference derivative operators as banded matrices.

TPU-first re-design of the reference's FD machinery (`/root/reference/src/
grad_utils.py:27-175`, which converts findiff stencil tables into 9
region-wise conv2d kernels): here a derivative along one image axis is a
single [N, N] banded matrix applied as a matmul — interior rows carry the
central stencil, boundary rows carry (semi-)one-sided stencils of the same
accuracy, exactly the row structure findiff's ``.matrix()`` assembles in the
reference data generator (`darcy_data_generation.py:135-147`).

Why matrices instead of convs: a [B,H,W] field times a [H,H] operator is one
``einsum`` that XLA tiles straight onto the MXU and fuses with neighbouring
elementwise work; there is no boundary-band overwrite pass, no gather, and
the operation is trivially differentiable and shardable (the batch dimension
stays untouched). Coefficients are generated at trace time with the Fornberg
(1988) recurrence — no findiff dependency.

Conventions match the reference: ``fd_acc`` is the accuracy order (acc=2 by
default, `model.yaml:13`), spacing may be negative (``reverse_d1`` flips the
d1 sign for plot-orientation consistency, `residuals_darcy.py:31-33`), and
periodic mode wraps the central stencil circulantly
(`grad_utils.py:76-81`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fornberg_weights(x0: float, xs: np.ndarray, m: int) -> np.ndarray:
    """Finite-difference weights for the m-th derivative at ``x0`` on
    arbitrary nodes ``xs`` (Fornberg 1988, Math. Comp. 51:699-706).

    Returns weights w such that f^(m)(x0) ~= sum_k w[k] f(xs[k]).
    """
    xs = np.asarray(xs, dtype=np.float64)
    n = len(xs)
    if n < m + 1:
        raise ValueError(f"need at least {m + 1} points for derivative order {m}")
    c = np.zeros((n, m + 1))
    c1 = 1.0
    c4 = xs[0] - x0
    c[0, 0] = 1.0
    for i in range(1, n):
        mn = min(i, m)
        c2 = 1.0
        c5 = c4
        c4 = xs[i] - x0
        for j in range(i):
            c3 = xs[i] - xs[j]
            c2 *= c3
            if j == i - 1:
                for k in range(mn, 0, -1):
                    c[i, k] = c1 * (k * c[i - 1, k - 1] - c5 * c[i - 1, k]) / c2
                c[i, 0] = -c1 * c5 * c[i - 1, 0] / c2
            for k in range(mn, 0, -1):
                c[j, k] = (c4 * c[j, k] - k * c[j, k - 1]) / c3
            c[j, 0] = c4 * c[j, 0] / c3
        c1 = c2
    return c[:, m]


def central_stencil(m: int, acc: int) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, weights) of the central stencil for derivative m, accuracy
    acc, on a unit grid. Window size matches findiff:
    2*floor((m+1)/2) - 1 + acc points."""
    num_points = 2 * ((m + 1) // 2) - 1 + acc
    p = num_points // 2
    offsets = np.arange(-p, p + 1)
    return offsets, fornberg_weights(0.0, offsets.astype(np.float64), m)


def onesided_points(m: int, acc: int) -> int:
    """Number of points in the (semi-)one-sided boundary stencils
    (findiff convention: m + acc)."""
    return m + acc


@functools.lru_cache(maxsize=None)
def _derivative_matrix_np(
    n: int, m: int, acc: int, periodic: bool
) -> np.ndarray:
    """Unit-spacing derivative matrix [n, n] (host, float64, cached)."""
    D = np.zeros((n, n))
    offsets, w = central_stencil(m, acc)
    p = (len(offsets) - 1) // 2

    if periodic:
        for i in range(n):
            for o, wk in zip(offsets, w):
                D[i, (i + o) % n] += wk
        return D

    nb = onesided_points(m, acc)
    for i in range(n):
        if p <= i <= n - 1 - p:
            D[i, i + offsets] = w
        elif i < p:
            # semi-one-sided: evaluate at node i over the first nb nodes
            pts = np.arange(nb, dtype=np.float64)
            D[i, :nb] = fornberg_weights(float(i), pts, m)
        else:
            pts = np.arange(n - nb, n, dtype=np.float64)
            D[i, n - nb :] = fornberg_weights(float(i), pts, m)
    return D


def derivative_matrix(
    n: int,
    spacing: float,
    deriv: int,
    acc: int = 2,
    periodic: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """[n, n] derivative operator for a uniform grid with ``spacing``
    (possibly negative — sign enters as spacing**(-deriv))."""
    D = _derivative_matrix_np(n, deriv, acc, periodic)
    return jnp.asarray(D / spacing**deriv, dtype=dtype)


class StencilGradients:
    """Bundle of the five image-derivative operators the physics layers use
    (d_d0, d_d1, d_d00, d_d11, d_d01 — the reference builds the same set at
    `grad_utils.py:154-159`).

    Fields are [B, H, W] (or any [..., H, W]); operators apply as einsums:
      d/d0   : D0 f          (contraction over H)
      d/d1   : f D1^T        (contraction over W)
      d/d0d1 : D0 f D1^T
    """

    def __init__(
        self,
        h: int,
        w: int | None = None,
        d0: float = 1.0,
        d1: float = 1.0,
        fd_acc: int = 2,
        periodic: bool = False,
        dtype=jnp.float32,
    ):
        w = h if w is None else w
        self.D0_1 = derivative_matrix(h, d0, 1, fd_acc, periodic, dtype)
        self.D0_2 = derivative_matrix(h, d0, 2, fd_acc, periodic, dtype)
        self.D1_1 = derivative_matrix(w, d1, 1, fd_acc, periodic, dtype)
        self.D1_2 = derivative_matrix(w, d1, 2, fd_acc, periodic, dtype)
        # stacked [2N, N] operators: rows 0:N the first derivative, N:2N the
        # second — one contraction yields both orders (see first_second_pair)
        self.Dc0 = jnp.concatenate([self.D0_1, self.D0_2], axis=0)
        self.Dc1 = jnp.concatenate([self.D1_1, self.D1_2], axis=0)

    @staticmethod
    def _apply_axis0(D, f):
        return jnp.einsum("ij,...jw->...iw", D, f)

    @staticmethod
    def _apply_axis1(D, f):
        return jnp.einsum("ij,...hj->...hi", D, f)

    def d_d0(self, f):
        return self._apply_axis0(self.D0_1, f)

    def d_d1(self, f):
        return self._apply_axis1(self.D1_1, f)

    def d_d00(self, f):
        return self._apply_axis0(self.D0_2, f)

    def d_d11(self, f):
        return self._apply_axis1(self.D1_2, f)

    def d_d01(self, f):
        return self._apply_axis1(self.D1_1, self._apply_axis0(self.D0_1, f))

    def first_second_pair(self, f):
        """All four (d1, d2) x (axis0, axis1) derivatives of ``f`` in two
        MXU contractions instead of four.

        The [2N, N] stacked operators turn each axis into a single matmul
        whose output halves are the first and second derivative, so the
        H-axis relayout (the expensive transpose on TPU — the W-axis
        contraction is already minor-dim) happens once per axis instead of
        once per operator. Returns (d_d0, d_d1, d_d00, d_d11).
        """
        n0 = self.D0_1.shape[0]
        n1 = self.D1_1.shape[0]
        a0 = jnp.einsum("ij,...jw->...iw", self.Dc0, f)
        a1 = jnp.einsum("ij,...hj->...hi", self.Dc1, f)
        return (
            a0[..., :n0, :],
            a1[..., :n1],
            a0[..., n0:, :],
            a1[..., n1:],
        )

    def __call__(self, f, mode: str):
        if mode == "all":
            return (self.d_d0(f), self.d_d1(f), self.d_d00(f), self.d_d11(f), self.d_d01(f))
        return getattr(self, mode)(f)
