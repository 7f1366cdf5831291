"""PDE/FEM residual definitions."""

from physicsinformeddiffusionmodels_tpu.physics import toy

__all__ = ["toy"]
