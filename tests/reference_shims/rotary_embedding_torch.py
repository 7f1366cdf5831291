"""Minimal ``rotary_embedding_torch`` stand-in for executing the reference
implementation (`/root/reference/src/unet_model.py:7,439-442`).

Faithful to the lucidrains library's conventions: interleaved-pair rotation
(`rotate_half`: '... (d r) -> ... d r', r=2), positions 0..n-1 over the
second-to-last axis, rotation applied to the leading ``dim`` features. Note
the reference uses this only on the frame-axis attention, where the studies
run with a single frame (n=1 -> angle 0 -> identity).
"""

import torch
from torch import nn


class RotaryEmbedding(nn.Module):
    def __init__(self, dim):
        super().__init__()
        inv_freq = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq)

    def rotate_queries_or_keys(self, t, seq_dim=-2):
        n = t.shape[seq_dim]
        pos = torch.arange(n, device=t.device, dtype=self.inv_freq.dtype)
        freqs = torch.einsum("i,j->ij", pos, self.inv_freq)  # [n, dim/2]
        freqs = torch.repeat_interleave(freqs, 2, dim=-1)  # [n, dim]
        rot_dim = freqs.shape[-1]
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        x1 = t_rot[..., 0::2]
        x2 = t_rot[..., 1::2]
        rotated = torch.stack((-x2, x1), dim=-1).flatten(-2)
        out = t_rot * freqs.cos() + rotated * freqs.sin()
        return torch.cat((out, t_pass), dim=-1)
