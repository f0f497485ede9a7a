"""Data-parallel train-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.mesh import make_mesh
from gen_adversarial_tpu.models.classifiers import VGG11BN
from gen_adversarial_tpu.train.classifier import (
    create_train_state, train_step, eval_step, shard_state_and_batch)
from gen_adversarial_tpu.train.augment import train_augment


TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")


def _synthetic_batch(n=16, size=32, n_classes=4, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, size=n).astype(np.int32)
    # class-dependent mean so the task is learnable
    images = rng.rand(n, size, size, 3).astype(np.float32) * 0.2
    images += labels[:, None, None, None] / n_classes * 0.8
    return {"image": np.clip(images, 0, 1), "label": labels}


def test_train_step_decreases_loss_on_8_device_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    model = VGG11BN(n_classes=4, plan=TINY_PLAN)
    state = create_train_state(model, jax.random.PRNGKey(0), 32, lr=0.01)
    batch = _synthetic_batch()
    state, batch = shard_state_and_batch(mesh, state, batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(40):
        key, sub = jax.random.split(key)
        state, loss = train_step(state, batch, sub)
        losses.append(float(loss))
    # per-step losses are noisy under the random augmentations; the TREND
    # must be down (averages are robust to the augment key stream)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # sharded batch really is distributed
    assert len(batch["image"].sharding.device_set) == 8


def test_eval_step_counts_correct():
    mesh = make_mesh(8)
    model = VGG11BN(n_classes=4, plan=TINY_PLAN)
    state = create_train_state(model, jax.random.PRNGKey(0), 32, lr=0.05)
    batch = _synthetic_batch(n=8)
    state, batch = shard_state_and_batch(mesh, state, batch)
    correct, total = eval_step(state, batch)
    assert int(total) == 8
    assert 0 <= int(correct) <= 8


def test_augment_shapes_and_range():
    key = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32))
    out = train_augment(key, images)
    assert out.shape == images.shape
    # normalized to [-1, 1]
    assert float(out.min()) >= -1.0 - 1e-5 and float(out.max()) <= 1.0 + 1e-5
    # stochastic: two keys give different outputs
    out2 = train_augment(jax.random.PRNGKey(1), images)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_fit_ragged_val_tail_on_8_device_mesh(tmp_path):
    """fit() must handle a validation tail smaller than the mesh (pad > b):
    9 val images at batch_size 8 leave a 1-image tail on an 8-device mesh.
    Padded rows (modulo-repeat images, label -1) must not change the
    accuracy accounting."""
    from PIL import Image
    import gen_adversarial_tpu.train.classifier as tc

    data_dir = tmp_path / "data"
    rng = np.random.RandomState(3)
    for split, n in (("train", 8), ("validation", 9)):
        for i in range(n):
            d = data_dir / split / f"cls{i % 2}"
            d.mkdir(parents=True, exist_ok=True)
            arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    orig = tc.make_classifier
    tc.make_classifier = lambda t, n: VGG11BN(n_classes=2, plan=TINY_PLAN)
    try:
        tds = ImageLabelDataset(str(data_dir / "train"), 32)
        vds = ImageLabelDataset(str(data_dir / "validation"), 32)
        state, history = tc.fit("vgg", 2, 32, tds, vds, epochs=1, lr=1e-3,
                                batch_size=8, seed=0, n_devices=8,
                                log_fn=lambda s: None)
    finally:
        tc.make_classifier = orig
    # accuracy is over exactly the 9 real images, not the padded rows
    assert history and 0.0 <= history[-1]["acc"] <= 1.0
