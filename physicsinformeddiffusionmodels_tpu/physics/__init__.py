"""PDE/FEM residual definitions."""

from physicsinformeddiffusionmodels_tpu.physics import toy
from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
    MechanicsResidual,
    split_mechanics_batch,
)

__all__ = ["toy", "DarcyResidual", "MechanicsResidual", "split_mechanics_batch"]
