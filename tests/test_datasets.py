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
