"""Layout converters between image and flattened-token forms.

The framework's native image layout is **NHWC** ([B, H, W, C] — the TPU conv
layout); the reference uses NCHW and a flattened [B, x*y, C] interface form
(`/root/reference/src/grad_utils.py:9-25`). These helpers convert between
all three so external CSV/npy data in the reference's conventions loads
unchanged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.moveaxis(x, 1, -1)


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.moveaxis(x, -1, 1)


def image_to_b_xy_c(x: jax.Array) -> jax.Array:
    """[B, H, W, C...] -> [B, H*W, C...] (flatten the two pixel axes)."""
    b, h, w = x.shape[:3]
    return x.reshape(b, h * w, *x.shape[3:])


def b_xy_c_to_image(x: jax.Array, h: int | None = None, w: int | None = None) -> jax.Array:
    """[B, H*W, C...] -> [B, H, W, C...]."""
    if h is None:
        h = w = int(math.isqrt(x.shape[1]))
        if h * w != x.shape[1]:
            raise ValueError(f"token count {x.shape[1]} is not a perfect square")
    elif w is None:
        w = x.shape[1] // h
    return x.reshape(x.shape[0], h, w, *x.shape[2:])


def resize_nearest(x: jax.Array, target: int) -> jax.Array:
    """Nearest resize of the two pixel axes of an NHWC image."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, target, target, c), method="nearest")


def resize_bilinear(x: jax.Array, target: int) -> jax.Array:
    """Bilinear non-antialiased resize of an NHWC image — matches
    torchvision ``Resize(antialias=False)`` (default bilinear, half-pixel
    centers) used for the 64<->65 mechanics regridding
    (`residuals_mechanics_K.py:10-21,203`)."""
    b, h, w, c = x.shape
    # antialias=False is REQUIRED: jax defaults to True, which stretches the
    # kernel on downsampling (65 -> 64) and diverges from torchvision's
    # antialias=False weights
    return jax.image.resize(
        x, (b, target, target, c), method="bilinear", antialias=False
    )
