"""Data layer: ground-truth generators (host-side NumPy/SciPy oracles) and
lightweight dataset/batching utilities.

TPU-native equivalent of the reference's L1 data layer
(`/root/reference/src/data_utils.py`, `darcy_data_generation.py`): datasets
are small enough to live fully in host RAM (and, single-device, in HBM — see
``training.make_device_resident_step``), so there is no streaming input
pipeline; batching is plain NumPy index gathers feeding jitted steps.
"""

from physicsinformeddiffusionmodels_tpu.data.datasets import (
    DarcyDataset,
    Normalization,
    NpyFieldDataset,
    SquareImagesDataset,
    cycle_batches,
    iter_batches,
    load_darcy_dataset,
    sample_images_with_squares,
)

__all__ = [
    "DarcyDataset",
    "Normalization",
    "NpyFieldDataset",
    "SquareImagesDataset",
    "cycle_batches",
    "iter_batches",
    "load_darcy_dataset",
    "sample_images_with_squares",
]
