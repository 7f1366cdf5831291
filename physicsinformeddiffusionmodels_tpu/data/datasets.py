"""Dataset containers and batch iterators.

Equivalents of the reference's ``Dataset`` (per-channel CSV stacks,
`data_utils.py:31-78`), ``Dataset_Paths`` (numerically-sorted npy files,
`data_utils.py:80-119`) and ``cycle`` (`data_utils.py:26-29`). Differences by
design: arrays are NHWC (TPU conv layout), datasets expose ``stacked()`` so
the single-device trainer can park the whole dataset in HBM and gather
minibatches inside the jitted step, and iteration is index-based NumPy (no
worker processes — the datasets are a few MB).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _numeric_key(path: Path):
    """Sort '12.npy' numerically like the reference
    (`data_utils.py:85-90`); falls back to lexicographic for non-numeric
    stems (stable mixed ordering)."""
    m = re.search(r"(\d+)", path.stem)
    return (0, int(m.group(1)), path.stem) if m else (1, 0, path.stem)


class NpyFieldDataset:
    """Directory of per-sample ``*.npy`` field files (mechanics layout:
    [nn, nn, 10] NHWC, or the reference's transposed [10, nn, nn] which is
    auto-detected and transposed, `data_utils.py:103-117`).

    Channel order (`data_utils.py:118`): vf, strain_energy_density_fem,
    von_mises_stress, disp_x, disp_y, E_field, BC_node_x, BC_node_y,
    load_x_img, load_y_img.
    """

    def __init__(self, root: str):
        self.root = Path(root)
        self.paths = sorted(self.root.glob("*.npy"), key=_numeric_key)
        if not self.paths:
            raise FileNotFoundError(f"no .npy files under {self.root}")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        arr = np.load(self.paths[i])
        if arr.ndim == 3 and arr.shape[0] == 10 and arr.shape[-1] != 10:
            arr = np.transpose(arr, (1, 2, 0))
        return np.asarray(arr, np.float32)

    def stacked(self) -> np.ndarray:
        """[N, nn, nn, 10] — the full dataset as one array."""
        return np.stack([self[i] for i in range(len(self))])


class DarcyDataset:
    """In-memory (p, K) field pairs as one [N, P, P, 2] NHWC array
    (channel 0 = pressure, 1 = permeability — the layout ``DarcyResidual``
    consumes; the reference stacks the same channels from per-channel CSVs,
    `data_utils.py:52-66`)."""

    def __init__(self, fields: np.ndarray):
        assert fields.ndim == 4 and fields.shape[-1] == 2, fields.shape
        self.fields = np.asarray(fields, np.float32)

    def __len__(self) -> int:
        return self.fields.shape[0]

    def __getitem__(self, i: int) -> np.ndarray:
        return self.fields[i]

    def stacked(self) -> np.ndarray:
        return self.fields


def load_darcy_dataset(root: str) -> DarcyDataset:
    """Load ``p_data.csv`` / ``K_data.csv`` written by the Darcy generator
    (one flattened [P*P] sample per row, reference format
    `darcy_data_generation.py:222-228` / `data_utils.py:40-50`)."""
    root = Path(root)
    p = np.loadtxt(root / "p_data.csv", delimiter=",", ndmin=2)
    K = np.loadtxt(root / "K_data.csv", delimiter=",", ndmin=2)
    assert p.shape == K.shape, (p.shape, K.shape)
    P = int(round(np.sqrt(p.shape[1])))
    assert P * P == p.shape[1], f"non-square samples: {p.shape[1]} values"
    fields = np.stack([p.reshape(-1, P, P), K.reshape(-1, P, P)], axis=-1)
    return DarcyDataset(fields.astype(np.float32))


def sample_images_with_squares(
    no_points: int,
    pixels_per_dim: int,
    dim: int,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Synthetic debug images: one random quarter-size solid square per
    sample, identical across channels (`data_utils.py:121-148`). Returns
    NHWC [N, P, P, dim] float32."""
    rng = rng or np.random.default_rng(0)
    size = pixels_per_dim // 4
    images = np.zeros((no_points, pixels_per_dim, pixels_per_dim, dim), np.float32)
    starts = rng.integers(0, pixels_per_dim - size, (no_points, 2))
    for i, (x0, y0) in enumerate(starts):
        images[i, x0 : x0 + size, y0 : y0 + size, :] = 1.0
    return images


class SquareImagesDataset:
    """Shape-level smoke-test dataset (`data_utils.py:150-173`) — random
    squares, no physics."""

    def __init__(self, no_points: int, pixels_per_dim: int, dim: int, seed: int = 0):
        self.data = sample_images_with_squares(
            no_points, pixels_per_dim, dim, np.random.default_rng(seed)
        )

    def __len__(self) -> int:
        return self.data.shape[0]

    def __getitem__(self, i: int) -> np.ndarray:
        return self.data[i]

    def stacked(self) -> np.ndarray:
        return self.data


class Normalization:
    """Column-wise normalization with the reference's strategies
    (`data_utils.py:175-266`): 'min-max-1' ([0,1] per column),
    'global-min-max-1', 'min-max-2' ([-1,1] per column), 'global-min-max-2',
    'mean-std', 'none'; categorical columns are one-hot encoded on
    ``normalize`` (appended after the continuous block) and passed through on
    ``unnormalize``. Unused in the main study flows — provided for parity.

    Works on [N, C] NumPy or JAX arrays; statistics are taken from the
    constructor data.
    """

    STRATEGIES = (
        "min-max-1",
        "global-min-max-1",
        "min-max-2",
        "global-min-max-2",
        "mean-std",
        "none",
    )

    def __init__(self, data, data_type: list[str], strategy: str):
        if strategy not in self.STRATEGIES:
            raise ValueError(f"Incorrect normalization strategy: {strategy!r}")
        data = np.asarray(data)
        self.mu = data.mean(axis=0)
        # reference uses torch.std (ddof=1)
        self.std = data.std(axis=0, ddof=1)
        self.min = data.min(axis=0)
        self.max = data.max(axis=0)
        self.globalmin = data.min()
        self.globalmax = data.max()
        self.data_type = list(data_type)
        self.cols = data.shape[1]
        self.strategy = strategy
        if not all(t in ("continuous", "categorical") for t in self.data_type):
            raise ValueError("Data type must be either continuous or categorical")

    def _scale(self, col, i):
        s = self.strategy
        if s == "min-max-1":
            return (col - self.min[i]) / (self.max[i] - self.min[i])
        if s == "global-min-max-1":
            return (col - self.globalmin) / (self.globalmax - self.globalmin)
        if s == "min-max-2":
            return 2.0 * (col - self.min[i]) / (self.max[i] - self.min[i]) - 1.0
        if s == "global-min-max-2":
            return 2.0 * (col - self.globalmin) / (self.globalmax - self.globalmin) - 1.0
        if s == "mean-std":
            return (col - self.mu[i]) / self.std[i]
        return col

    def _unscale(self, col, i):
        s = self.strategy
        if s == "min-max-1":
            return col * (self.max[i] - self.min[i]) + self.min[i]
        if s == "global-min-max-1":
            return col * (self.globalmax - self.globalmin) + self.globalmin
        if s == "min-max-2":
            return (0.5 * col + 0.5) * (self.max[i] - self.min[i]) + self.min[i]
        if s == "global-min-max-2":
            return (0.5 * col + 0.5) * (self.globalmax - self.globalmin) + self.globalmin
        if s == "mean-std":
            return col * self.std[i] + self.mu[i]
        return col

    def normalize(self, data):
        data = np.asarray(data)
        continuous = [
            self._scale(data[:, i], i)
            for i in range(self.cols)
            if self.data_type[i] == "continuous"
        ]
        one_hots = []
        for i in range(self.cols):
            if self.data_type[i] == "categorical":
                vals = data[:, i].astype(np.int64)
                eye = np.eye(int(vals.max()) + 1, dtype=data.dtype)
                one_hots.append(eye[vals])
        cols = [np.stack(continuous, axis=1)] if continuous else []
        return np.concatenate(cols + one_hots, axis=1) if (cols or one_hots) else data

    def unnormalize(self, data):
        data = np.asarray(data)
        out = np.zeros_like(data)
        for i in range(self.cols):
            if self.data_type[i] == "continuous":
                out[:, i] = self._unscale(data[:, i], i)
            else:
                out[:, i] = data[:, i]
        return out


def iter_batches(dataset, batch_size: int, *, drop_remainder: bool = False):
    """One sequential pass over ``dataset`` in batches (eval sweeps,
    `sample.py:244-342`)."""
    n = len(dataset)
    stacked = dataset.stacked() if hasattr(dataset, "stacked") else np.stack(
        [dataset[i] for i in range(n)]
    )
    for start in range(0, n, batch_size):
        batch = stacked[start : start + batch_size]
        if drop_remainder and batch.shape[0] < batch_size:
            return
        yield batch


def cycle_batches(dataset, batch_size: int, *, seed: int = 0):
    """Infinite shuffled batch iterator (the reference's
    ``cycle(DataLoader(shuffle=True))``, `data_utils.py:26-29` +
    `main.py:95-99`). Reshuffles every epoch; a short epoch tail is folded
    into the next epoch so every batch has exactly ``batch_size`` samples."""
    stacked = dataset.stacked() if hasattr(dataset, "stacked") else np.stack(
        [dataset[i] for i in range(len(dataset))]
    )
    n = stacked.shape[0]
    batch_size = min(batch_size, n)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    pos = 0
    while True:
        if pos + batch_size > n:
            carry = order[pos:]
            order = np.concatenate([carry, rng.permutation(n)])
            pos = 0
        idx = order[pos : pos + batch_size]
        pos += batch_size
        yield stacked[idx]
