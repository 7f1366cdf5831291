"""Data layer: CSV/npy round-trips, layout auto-detection, batch iterators,
and generator artifact formats."""

import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.data import (
    DarcyDataset,
    Normalization,
    NpyFieldDataset,
    SquareImagesDataset,
    cycle_batches,
    iter_batches,
    load_darcy_dataset,
)
from physicsinformeddiffusionmodels_tpu.data.darcy_generator import generate_dataset
from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    generate_dataset as generate_mech_dataset,
)

P = 16


def test_darcy_csv_roundtrip(tmp_path):
    """generate(out_dir) -> load_darcy_dataset reproduces the arrays with
    channel order (p, K)."""
    K, p, res, seeds = generate_dataset(
        n_samples=2, pixels_per_dim=P, q=16, base_seed=5, out_dir=tmp_path
    )
    for f in ("K_data.csv", "p_data.csv", "res_data.csv", "seeds.csv"):
        assert (tmp_path / f).exists()
    ds = load_darcy_dataset(tmp_path)
    assert len(ds) == 2
    fields = ds.stacked()
    assert fields.shape == (2, P, P, 2)
    np.testing.assert_allclose(fields[..., 0], p.reshape(2, P, P), rtol=1e-6)
    np.testing.assert_allclose(fields[..., 1], K.reshape(2, P, P), rtol=1e-6)


def test_npy_dataset_layouts(tmp_path):
    """NHWC files load as-is; the reference's transposed [10, nn, nn] layout
    (`data_utils.py:103-117`) is auto-detected; filenames sort numerically."""
    nn = 9
    rng = np.random.default_rng(0)
    samples = rng.standard_normal((3, nn, nn, 10)).astype(np.float32)
    np.save(tmp_path / "2.npy", samples[2])
    np.save(tmp_path / "0.npy", samples[0])
    np.save(tmp_path / "10.npy", np.transpose(samples[1], (2, 0, 1)))  # CHW
    ds = NpyFieldDataset(tmp_path)
    assert len(ds) == 3
    # numeric order: 0, 2, 10
    np.testing.assert_array_equal(ds[0], samples[0])
    np.testing.assert_array_equal(ds[1], samples[2])
    np.testing.assert_array_equal(ds[2], samples[1])  # transposed back
    assert ds.stacked().shape == (3, nn, nn, 10)


def test_npy_dataset_empty_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        NpyFieldDataset(tmp_path / "nothing")


def test_mechanics_npy_roundtrip(tmp_path):
    samples = generate_mech_dataset(2, nels_per_side=4, seed=1, out_dir=tmp_path)
    ds = NpyFieldDataset(tmp_path)
    np.testing.assert_array_equal(ds.stacked(), samples)


def test_iter_batches_covers_all():
    fields = np.arange(5 * 2 * 2 * 2, dtype=np.float32).reshape(5, 2, 2, 2)
    ds = DarcyDataset(fields)
    batches = list(iter_batches(ds, 2))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    np.testing.assert_array_equal(np.concatenate(batches), fields)
    assert [b.shape[0] for b in iter_batches(ds, 2, drop_remainder=True)] == [2, 2]


def test_cycle_batches_full_size_and_coverage():
    fields = np.arange(5 * 8, dtype=np.float32).reshape(5, 2, 2, 2)
    ds = DarcyDataset(fields)
    it = cycle_batches(ds, 2, seed=1)
    seen = set()
    for _ in range(10):
        b = next(it)
        assert b.shape == (2, 2, 2, 2)  # never a short batch
        seen.update(b[:, 0, 0, 0].astype(int).tolist())
    assert seen == set(fields[:, 0, 0, 0].astype(int).tolist())


def test_cycle_batches_caps_batch_size():
    ds = DarcyDataset(np.zeros((3, 2, 2, 2), np.float32))
    assert next(cycle_batches(ds, 64)).shape[0] == 3


def test_square_images_dataset():
    ds = SquareImagesDataset(5, 16, 3, seed=2)
    imgs = ds.stacked()
    assert imgs.shape == (5, 16, 16, 3)
    # exactly one 4x4 solid square per channel
    assert (imgs.sum(axis=(1, 2)) == 16.0).all()
    assert set(np.unique(imgs)) == {0.0, 1.0}


@pytest.mark.parametrize(
    "strategy",
    ["min-max-1", "global-min-max-1", "min-max-2", "global-min-max-2", "mean-std", "none"],
)
def test_normalization_roundtrip(strategy):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((20, 3)) * [1.0, 5.0, 0.1] + [0.0, 2.0, -1.0]
    norm = Normalization(data, ["continuous"] * 3, strategy)
    z = norm.normalize(data)
    if strategy == "min-max-1":
        assert z.min() == pytest.approx(0.0) and z.max() == pytest.approx(1.0)
    if strategy == "min-max-2":
        assert z.min() == pytest.approx(-1.0) and z.max() == pytest.approx(1.0)
    if strategy == "mean-std":
        np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-12)
        np.testing.assert_allclose(z.std(0, ddof=1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(norm.unnormalize(z), data, rtol=1e-10, atol=1e-12)


def test_normalization_one_hot():
    data = np.array([[0.5, 0.0], [1.5, 2.0], [2.5, 1.0]])
    norm = Normalization(data, ["continuous", "categorical"], "min-max-1")
    z = norm.normalize(data)
    # continuous column + 3 one-hot columns
    assert z.shape == (3, 4)
    np.testing.assert_array_equal(z[:, 1:], np.eye(3)[[0, 2, 1]])


def test_normalization_rejects_bad_args():
    data = np.zeros((4, 2))
    with pytest.raises(ValueError):
        Normalization(data, ["continuous"] * 2, "nope")
    with pytest.raises(ValueError):
        Normalization(data, ["continuous", "weird"], "none")
