"""Auxiliary model blocks.

``SignalEmbedding``: convolutional / GRU encoder for 1D stress-strain
response signals, used by the reference for an ablation study
(`/root/reference/src/unet_model.py:370-404`). Encodes a [B, L] signal into
a [B, cond_dim] conditioning vector.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class SignalEmbedding(nn.Module):
    """1D signal encoder (`unet_model.py:370-404`).

    arch='CNN': a stack of stride-2 Conv1D downsamplings with SiLU
    (channel plan init_channel -> channel_upsamplings).
    arch='GRU': 3-layer GRU over the signal, final hidden state.
    """

    arch: str = "CNN"  # 'CNN' | 'GRU'
    init_channel: int = 1
    channel_upsamplings: Sequence[int] = (16, 32, 64, 128, 128)

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]  # [B, L, 1]
        if self.arch == "CNN":
            h = x
            for ch in self.channel_upsamplings:
                h = nn.Conv(ch, (4,), strides=(2,), padding=((1, 1),))(h)
                h = nn.silu(h)
            return h.reshape(h.shape[0], -1).squeeze() if h.shape[1] == 1 else h.mean(axis=1)
        elif self.arch == "GRU":
            feat = self.channel_upsamplings[-1]
            h = x
            for _ in range(3):
                cell = nn.GRUCell(features=feat)
                carry = cell.initialize_carry(jax.random.key(0), h[:, 0].shape)
                carry, h = nn.RNN(cell, return_carry=True)(h)
            return h[:, -1]
        raise ValueError(f"Unknown architecture: {self.arch}")
