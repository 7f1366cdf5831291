"""Analytic toy constraints (unit hypersphere study, Appendix F.1).

Pure-function equivalents of the user-pluggable residual / inequality /
optimization modules in the reference toy driver
(`/root/reference/main_toy.py:51-82`), plus the toy data sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.diffusion.losses import PhysicsTerms


def hypersphere_residual(x: jax.Array) -> jax.Array:
    """sum(x^2) - 1 per sample (`main_toy.py:51-56`)."""
    return jnp.sum(x**2, axis=1) - 1.0


def density_inequality(x: jax.Array, threshold: float = 1.0, mode: str = "leq") -> jax.Array:
    """relu(sum|x| - threshold) (or mirrored) per sample (`main_toy.py:58-71`)."""
    density = jnp.sum(jnp.abs(x), axis=1)
    shift = density - threshold
    return jax.nn.relu(shift if mode == "leq" else -shift)


def first_coordinate_objective(x: jax.Array) -> jax.Array:
    """x[:, 0] — minimised via the exponential log-likelihood term
    (`main_toy.py:73-78`)."""
    return x[:, 0]


def toy_physics(x0_pred: jax.Array, threshold: float = 1.0) -> PhysicsTerms:
    """Bundle all three toy terms for ``pidm_loss``."""
    return PhysicsTerms(
        residual=hypersphere_residual(x0_pred),
        inequality=density_inequality(x0_pred, threshold),
        optimizer=first_coordinate_objective(x0_pred),
    )


def sample_hypersphere(rng: np.random.Generator, size: int, dim: int = 2) -> np.ndarray:
    """Uniform points on the unit hypersphere surface
    (`denoising_utils.py:106-111`)."""
    x = rng.normal(0.0, 1.0, (size, dim))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def sample_zeros(rng: np.random.Generator, size: int, dim: int = 2) -> np.ndarray:
    """All-zero point cloud (`denoising_utils.py:94-95`)."""
    return np.zeros((size, dim))


def sample_gaussian(rng: np.random.Generator, size: int, dim: int = 2) -> np.ndarray:
    """Standard-normal point cloud (`denoising_utils.py:97-98`)."""
    return rng.standard_normal((size, dim))


def sample_circle(rng: np.random.Generator, size: int) -> np.ndarray:
    """Uniform angles on the 2D unit circle (`denoising_utils.py:100-104`)."""
    theta = rng.uniform(0.0, 2.0 * np.pi, size)
    return np.stack([np.cos(theta), np.sin(theta)], axis=1)


def sample_two_points(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random picks from {(-0.5,-0.5), (0.5,0.5)} (`denoising_utils.py:113-117`)."""
    pts = np.array([[-0.5, -0.5], [0.5, 0.5]])
    return pts[rng.integers(0, 2, size)]


def sample_four_points(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random picks from the 4 corners of [-1,1]^2 (`denoising_utils.py:119-123`)."""
    pts = np.array([[-1.0, -1.0], [-1.0, 1.0], [1.0, -1.0], [1.0, 1.0]])
    return pts[rng.integers(0, 4, size)]


# --------------------------------------------------------------------------
# Constraint registry: serializable replacement for the reference's
# dill-pickled user constraint modules (`denoising_toy_utils.py:527-592`).
# A saved toy run stores a SPEC (registry name + kwargs) in its checkpoint;
# loading rebuilds the exact physics_fn without executing pickled code.
# Users plug in custom constraints by registering a factory under a name.
# --------------------------------------------------------------------------

TOY_CONSTRAINTS: dict = {}


def register_toy_constraint(name: str):
    """Register a constraint factory: ``factory(**kwargs) -> physics_fn``
    where ``physics_fn(x0_pred) -> PhysicsTerms``."""

    def deco(factory):
        TOY_CONSTRAINTS[name] = factory
        return factory

    return deco


@register_toy_constraint("hypersphere")
def _hypersphere_factory(threshold: float = 1.0):
    def physics_fn(x0_pred: jax.Array) -> PhysicsTerms:
        return toy_physics(x0_pred, threshold)

    return physics_fn


def build_toy_constraint(spec: dict | None):
    """Rebuild a physics_fn from a checkpoint spec ``{"name":..., "kwargs":...}``.

    ``None``/missing spec falls back to the built-in hypersphere constraints
    (the reference's defaults, `main_toy.py:51-82`)."""
    if spec is None:
        spec = {"name": "hypersphere", "kwargs": {}}
    name = spec["name"]
    if name not in TOY_CONSTRAINTS:
        raise KeyError(
            f"unknown toy constraint '{name}'; register it with "
            f"register_toy_constraint before loading (known: "
            f"{sorted(TOY_CONSTRAINTS)})"
        )
    return TOY_CONSTRAINTS[name](**spec.get("kwargs", {}))


TOY_DISTRIBUTIONS = {
    "zeros": sample_zeros,
    "gaussian": sample_gaussian,
    "circle": sample_circle,
    "hypersphere": sample_hypersphere,
    "two_points": sample_two_points,
    "four_points": sample_four_points,
}
