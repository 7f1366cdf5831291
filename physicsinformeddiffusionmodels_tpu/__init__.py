"""physicsinformeddiffusionmodels_tpu — TPU-native Physics-Informed Diffusion Models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jhbastek/PhysicsInformedDiffusionModels (ICLR 2025, arXiv 2403.14404):
denoising diffusion models whose training loss is informed by PDE/FEM
residuals evaluated on the model's x0-prediction, differentiated
end-to-end through the denoiser.

Subpackages
-----------
diffusion : schedules, losses, ancestral/DDIM sampling (lax.scan), EMA
models    : Flax denoisers (attention U-Net, toy conditional MLP)
ops       : finite-difference operators (Fornberg), Pallas kernels, reshapes
physics   : PDE/FEM residual definitions (Darcy flow, linear elasticity, toy)
data      : dataset loaders + ground-truth generators (Darcy KLE, mechanics FEM)
parallel  : device mesh + sharding helpers (DP/TP over ICI)
training  : train loop, optimizer, checkpointing, metrics
utils     : IO / visualization helpers

The compute path is pure JAX (jit/scan/vmap + Pallas); everything is
designed for static shapes, bf16-friendly matmuls on the MXU and SPMD
sharding over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from physicsinformeddiffusionmodels_tpu import diffusion, models, ops, physics

__all__ = ["diffusion", "models", "ops", "physics", "__version__"]
