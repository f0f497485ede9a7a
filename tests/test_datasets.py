"""Dataset tests: label derivation, name dataset, prefetch iterator with and
without the native loader."""

import numpy as np
import pytest
from PIL import Image

from gen_adversarial_tpu.data.datasets import (
    ImageLabelDataset, ImageNameLabelDataset, iterate_batches)


@pytest.fixture()
def folder(tmp_path):
    rng = np.random.RandomState(0)
    for cls in ("zebra", "apple", "mango"):
        (tmp_path / cls).mkdir()
        for i in range(3):
            arr = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / cls / f"{i}.png")
    return tmp_path


def test_labels_are_sorted_class_indices(folder):
    ds = ImageLabelDataset(str(folder), 24)
    # sorted class order (datasets.py:35-58 upstream: sorted-index labels)
    assert ds.class_to_idx == {"apple": 0, "mango": 1, "zebra": 2}
    img, label = ds[0]
    assert img.shape == (24, 24, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_name_dataset_returns_relpath(folder):
    ds = ImageNameLabelDataset(str(folder), 24)
    img, label, name = ds[0]
    cls, fname = name.split("/")
    assert cls in ("apple", "mango", "zebra") and fname.endswith(".png")


def test_iterate_batches_shuffle_and_fallback(folder):
    ds = ImageLabelDataset(str(folder), 24)
    a = [b["label"].tolist() for b in iterate_batches(ds, 3, shuffle=True, seed=1)]
    b = [b["label"].tolist() for b in iterate_batches(ds, 3, shuffle=True, seed=2)]
    assert a != b  # different shuffles
    # PIL fallback path
    batches = list(iterate_batches(ds, 4, drop_last=False, use_native=False))
    assert sum(x["image"].shape[0] for x in batches) == 9


def test_iterate_batches_surfaces_decode_errors(tmp_path):
    """A corrupt file must raise in the consumer, not kill the producer
    thread silently (which would deadlock q.get forever)."""
    from PIL import Image
    d = tmp_path / "cls0"
    d.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "ok.png")
    (d / "bad.png").write_bytes(b"not an image")
    ds = ImageLabelDataset(str(tmp_path), 8)
    with pytest.raises(Exception):
        for _ in iterate_batches(ds, 2, drop_last=False):
            pass


def test_iterate_batches_batch_slice(folder):
    """batch_slice decodes only the contiguous 1/n of each global batch,
    preserving the global order (the multi-host DP training contract)."""
    ds = ImageLabelDataset(str(folder), 8)
    full = list(iterate_batches(ds, 4, shuffle=True, seed=3, drop_last=True))
    lo = list(iterate_batches(ds, 4, shuffle=True, seed=3, drop_last=True,
                              batch_slice=(0, 2)))
    hi = list(iterate_batches(ds, 4, shuffle=True, seed=3, drop_last=True,
                              batch_slice=(1, 2)))
    assert len(full) == len(lo) == len(hi)
    for f, a, b in zip(full, lo, hi):
        np.testing.assert_array_equal(
            f["image"], np.concatenate([a["image"], b["image"]], 0))
        np.testing.assert_array_equal(
            f["label"], np.concatenate([a["label"], b["label"]], 0))
