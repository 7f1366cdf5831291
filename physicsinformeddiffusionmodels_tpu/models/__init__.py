"""Flax denoiser models."""

from physicsinformeddiffusionmodels_tpu.models.toy import ConditionalModel

__all__ = ["ConditionalModel"]
