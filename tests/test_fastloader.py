"""Native C++ image-pipeline tests: build, decode parity vs PIL, threaded
batch throughput sanity."""

import time

import numpy as np
import pytest
from PIL import Image

from gen_adversarial_tpu.data import fastloader
from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        (root / cls).mkdir()
        for i in range(8):
            arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")
            Image.fromarray(arr).save(root / cls / f"{i}_j.jpg", quality=95)
    return root


def test_native_builds_and_decodes_png_exactly(image_dir):
    if not fastloader.available():
        pytest.skip("native toolchain unavailable")
    files = sorted((image_dir / "a").glob("*.png"))
    # same-size decode: PNG is lossless -> must match PIL bit-exactly
    batch = fastloader.decode_batch(files, 40, 40)
    for i, f in enumerate(files):
        want = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(batch[i], want, atol=1e-6)


def test_native_jpeg_close_to_pil(image_dir):
    if not fastloader.available():
        pytest.skip("native toolchain unavailable")
    files = sorted((image_dir / "a").glob("*.jpg"))
    batch = fastloader.decode_batch(files, 40, 40)
    for i, f in enumerate(files):
        want = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        # libjpeg and PIL may differ by tiny IDCT rounding
        assert np.abs(batch[i] - want).max() < 0.05


def test_native_resize_close_to_pil(tmp_path):
    if not fastloader.available():
        pytest.skip("native toolchain unavailable")
    # smooth image: PIL's antialiased triangle filter and our plain
    # half-pixel bilinear agree closely (they diverge on white noise)
    yy, xx = np.mgrid[0:40, 0:40]
    arr = np.stack([yy * 6, xx * 6, (yy + xx) * 3], -1).astype(np.uint8)
    f = tmp_path / "smooth.png"
    Image.fromarray(arr).save(f)
    got = fastloader.decode_batch([f], 20, 20)[0]
    want = np.asarray(Image.open(f).convert("RGB").resize((20, 20), Image.BILINEAR),
                      np.float32) / 255.0
    assert np.abs(got - want).mean() < 0.01


def test_iterate_batches_native_path(image_dir):
    ds = ImageLabelDataset(str(image_dir), 40)
    batches = list(iterate_batches(ds, 8, drop_last=False, use_native=True))
    n = sum(b["image"].shape[0] for b in batches)
    assert n == len(ds)
    for b in batches:
        assert b["image"].dtype == np.float32
        assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0


def test_bad_file_fallback(tmp_path):
    if not fastloader.available():
        pytest.skip("native toolchain unavailable")
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    with pytest.raises(RuntimeError):
        fastloader.decode_batch([bad], 8, 8)
