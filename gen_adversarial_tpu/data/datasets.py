"""Folder-of-class-folders image datasets.

Mirrors the reference's data/datasets.py:9-58 semantics (rglob over
png/jpg/bmp/JPEG, label = sorted index of the parent directory name,
ToTensor + antialiased resize) but yields numpy NHWC batches ready for
device_put, with a simple double-buffered prefetch thread instead of torch
DataLoader workers.
"""

import threading
import queue
from pathlib import Path

import numpy as np
from PIL import Image

EXTENSIONS = (".png", ".jpg", ".bmp", ".JPEG")


def _find_images(root: Path):
    files = [p for p in sorted(root.rglob("*")) if p.suffix in EXTENSIONS]
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    return files


class ImageLabelDataset:
    """Images + integer labels derived from the parent folder name."""

    def __init__(self, folder: str, image_size: int):
        self.root = Path(folder)
        self.files = _find_images(self.root)
        self.image_size = image_size
        classes = sorted({f.parent.name for f in self.files})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.labels = np.array([self.class_to_idx[f.parent.name] for f in self.files],
                               dtype=np.int32)

    def __len__(self):
        return len(self.files)

    def load_image(self, idx: int) -> np.ndarray:
        img = Image.open(self.files[idx]).convert("RGB")
        if img.size != (self.image_size, self.image_size):
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.float32) / 255.0  # HWC in [0,1]

    def __getitem__(self, idx: int):
        return self.load_image(idx), self.labels[idx]


class ImageNameLabelDataset(ImageLabelDataset):
    """Additionally returns the last-two path components (class/filename),
    used when writing adversarial examples back into class folders
    (reference data/datasets.py:9-33)."""

    def __getitem__(self, idx: int):
        img, label = super().__getitem__(idx)
        f = self.files[idx]
        return img, label, f"{f.parent.name}/{f.name}"


def iterate_batches(dataset: ImageLabelDataset, batch_size: int,
                    shuffle: bool = False, seed: int = 0,
                    drop_last: bool = True, prefetch: int = 2,
                    use_native: bool = True,
                    shard: tuple[int, int] = (0, 1),
                    batch_slice: tuple[int, int] = (0, 1)):
    """Yield dict batches {'image': (B,H,W,C) f32, 'label': (B,) i32} with a
    background prefetch thread (the host-side analogue of DataLoader
    workers; device transfer overlaps via jax's async dispatch).

    When the native C++ loader (native/fastloader.cpp) is available, whole
    batches are decoded+resized by its thread pool; otherwise falls back to
    per-image PIL."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    # round-robin process shard (the DistributedSampler equivalent,
    # reference test_defense.py:116); (0, 1) = the whole dataset
    pid, pcount = shard
    order = order[pid::pcount]
    n_batches = len(order) // batch_size if drop_last else -(-len(order) // batch_size)

    native = None
    if use_native:
        from gen_adversarial_tpu.data import fastloader
        if fastloader.available():
            native = fastloader

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    # contiguous slice-of-n of each GLOBAL batch (multi-host DP training:
    # every process walks the same shuffled order, so the global batch
    # content is identical to a single-process run, but each process only
    # DECODES its own slice - 1/n the host-side IO)
    sl, sn = batch_slice
    hw = (dataset.image_size, dataset.image_size)

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone (an early
        `break` out of the batch loop must not pin this thread on a full
        queue forever)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in range(n_batches):
                idx = order[b * batch_size:(b + 1) * batch_size]
                if sn > 1:
                    idx = idx[sl * len(idx) // sn:(sl + 1) * len(idx) // sn]
                if len(idx) == 0:  # a ragged tail can slice empty
                    imgs = np.zeros((0,) + hw + (3,), np.float32)
                elif native is not None:
                    try:
                        imgs = native.decode_batch(
                            [dataset.files[i] for i in idx], *hw)
                    except RuntimeError:
                        imgs = np.stack([dataset.load_image(i) for i in idx])
                else:
                    imgs = np.stack([dataset.load_image(i) for i in idx])
                if not _put({"image": imgs, "label": dataset.labels[idx]}):
                    return
            _put(None)
        except BaseException as e:  # surface decode errors in the consumer
            _put(e)                 # (a dead producer would deadlock q.get)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
