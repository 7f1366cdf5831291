"""Minimal ``einops_exts`` stand-in (`rearrange_many`) for executing the
reference implementation (`/root/reference/src/unet_model.py:6`)."""

from einops import rearrange


def rearrange_many(tensors, pattern, **kwargs):
    return tuple(rearrange(t, pattern, **kwargs) for t in tensors)
