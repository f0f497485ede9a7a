"""Orbax train-state checkpoint/resume round trip (the reference's
torch.save/--resume_from, classifier/train.py:221-236,292-312)."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.checkpoint import save_train_state, load_train_state
from gen_adversarial_tpu.models.classifiers import VGG11BN
from gen_adversarial_tpu.train.classifier import create_train_state, train_step

TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")


def test_train_state_roundtrip(tmp_path):
    model = VGG11BN(n_classes=4, plan=TINY_PLAN)
    state = create_train_state(model, jax.random.PRNGKey(0), 32, lr=0.01)
    batch = {"image": jnp.asarray(np.random.RandomState(0)
                                  .rand(8, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(np.arange(8) % 4, dtype=jnp.int32)}
    state, _ = train_step(state, batch, jax.random.PRNGKey(1))

    save_train_state(tmp_path, jax.device_get(state), step=3)

    template = create_train_state(model, jax.random.PRNGKey(0), 32, lr=0.01)
    restored = load_train_state(tmp_path, 3, jax.device_get(template))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # training continues from the restored state
    restored, loss = train_step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
