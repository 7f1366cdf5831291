"""Flax denoiser models."""

from physicsinformeddiffusionmodels_tpu.models.blocks import SignalEmbedding
from physicsinformeddiffusionmodels_tpu.models.toy import ConditionalModel
from physicsinformeddiffusionmodels_tpu.models.unet import UNet

__all__ = ["ConditionalModel", "SignalEmbedding", "UNet"]
