"""torchvision.transforms.Resize stand-in.

Matches torchvision's tensor path for ``Resize(size, antialias=False)``:
bilinear interpolation, align_corners=False (half-pixel centers), no
antialiasing — exactly `torch.nn.functional.interpolate(..., mode='bilinear',
align_corners=False, antialias=False)`.
"""

import torch.nn.functional as F


class Resize:
    def __init__(self, size, interpolation=None, antialias=False):
        self.size = tuple(size) if not isinstance(size, int) else (size, size)
        self.antialias = bool(antialias)

    def __call__(self, tensor):
        squeeze = tensor.ndim == 3
        if squeeze:
            tensor = tensor.unsqueeze(0)
        out = F.interpolate(
            tensor,
            size=self.size,
            mode="bilinear",
            align_corners=False,
            antialias=self.antialias,
        )
        return out.squeeze(0) if squeeze else out
