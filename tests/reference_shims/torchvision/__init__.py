"""Minimal ``torchvision`` stand-in (transforms.Resize only) for executing
the reference implementation (`/root/reference/src/residuals_mechanics_K.py:4,20`,
`denoising_utils.py:57-68`)."""

from . import transforms  # noqa: F401
