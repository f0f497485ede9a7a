"""Data-parallel classifier trainer.

Replaces the reference's torch DDP trainer (classifier/train.py:136-302):
DDP grad all-reduce becomes an XLA-inserted psum (the train step is jitted
with batch sharded over the mesh and params replicated), loss/accuracy
all_reduces become jnp reductions over the global (sharded) batch, and the
kornia augmentation pipeline runs inside the same jitted step.
"""

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from gen_adversarial_tpu.core.mesh import make_mesh, batch_sharding, replicated
from gen_adversarial_tpu.models.classifiers import make_classifier
from gen_adversarial_tpu.train.augment import train_augment, eval_normalize


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, rng, image_size: int, lr: float,
                       momentum: float = 0.9) -> TrainState:
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    tx = optax.sgd(lr, momentum=momentum)
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=tx, batch_stats=variables.get("batch_stats", {}))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


@partial(jax.jit, donate_argnums=(0,))
def train_step(state: TrainState, batch: dict, key: jax.Array):
    images = train_augment(key, batch["image"])

    def loss_fn(params):
        logits, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
        return cross_entropy(logits, batch["label"]), updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads,
                                  batch_stats=updates["batch_stats"])
    return state, loss


@jax.jit
def eval_step(state: TrainState, batch: dict):
    images = eval_normalize(batch["image"])
    logits = state.apply_fn({"params": state.params, "batch_stats": state.batch_stats},
                            images, train=False)
    correct = jnp.sum(jnp.argmax(logits, -1) == batch["label"])
    return correct, batch["label"].shape[0]


def shard_state_and_batch(mesh, state, batch):
    """Replicate params/optimizer over the mesh, shard the batch axis.

    With these shardings, jit(train_step) compiles to per-device forward +
    backward with a single grad all-reduce over ICI - the TPU equivalent of
    DDP (reference classifier/train.py:257)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    state = jax.device_put(state, rep)
    batch = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
    return state, batch


def _to_global(sharding, tree):
    """Place a host pytree under `sharding`, working in BOTH runtimes: plain
    device_put single-process, jax.make_array_from_process_local_data when
    the mesh spans processes (device_put cannot address remote devices).
    For batch shardings each process passes its LOCAL slice; for replicated
    shardings every process passes the same full value."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def fit(model_type: str, n_classes: int, image_size: int, train_ds, val_ds,
        epochs: int, lr: float, batch_size: int, seed: int = 0,
        eval_freq: int | None = None, log_fn=print, n_devices: int | None = None,
        checkpoint_dir: str | None = None, resume_step: int | None = None,
        save_every: int | None = None, init_variables: dict | None = None,
        distributed: bool = False):
    """End-to-end training loop (epoch structure mirrors
    classifier/train.py:261-302: validate every eval_freq epochs where
    eval_freq = 1 if epochs <= 50 else 5; periodic orbax checkpoints +
    --resume_from equivalent via resume_step, train.py:221-236,292-301).

    With distributed=True (after core.distributed.maybe_initialize), the DP
    mesh spans every process's devices - the multi-host equivalent of the
    reference's torchrun DDP launch (train.py:334-348).  Every process
    walks the SAME shuffled epoch order and takes its contiguous slice of
    each global batch, so the global batch content (and therefore the
    training trajectory) is identical to the single-process run; grads
    all-reduce over DCN via the XLA-inserted collective, checkpoints/logs
    come from process 0 only."""
    from gen_adversarial_tpu.data.datasets import iterate_batches
    from gen_adversarial_tpu.core.checkpoint import save_train_state, load_train_state

    model = make_classifier(model_type, n_classes)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, rng, image_size, lr)
    if init_variables is not None:
        # e.g. an ImageNet-pretrained backbone + fresh projector, the
        # reference's starting point (classifier/model.py:15-16)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, init_variables["params"]),
            batch_stats=jax.tree.map(jnp.asarray,
                                     init_variables.get("batch_stats", {})))
    start_epoch = 0
    if checkpoint_dir and resume_step is not None:
        state = load_train_state(checkpoint_dir, resume_step, state)
        start_epoch = resume_step
        log_fn(f"[resume] from {checkpoint_dir} epoch {resume_step}")
    mesh = make_mesh(n_devices)
    if eval_freq is None:
        eval_freq = 1 if epochs <= 50 else 5
    if save_every is None:
        save_every = eval_freq * 2  # train.py:292

    n_proc = jax.process_count() if distributed else 1
    pid = jax.process_index() if distributed else 0
    if pid != 0:
        log_fn = lambda s: None  # noqa: E731 (rank-0 logging, train.py:309)
    elif checkpoint_dir:
        # persistent log.txt next to the checkpoints, written line-by-line
        # (the reference flushes args.log at run end, train.py:309-315)
        from gen_adversarial_tpu.core.runlog import RunLog, param_summary
        log_fn = RunLog(Path(checkpoint_dir) / "log.txt", log_fn)
        log_fn(param_summary(state.params, model_type))
    if batch_size % n_proc:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{n_proc} processes")

    step_key = jax.random.PRNGKey(seed + 1)
    history = []
    n_mesh = int(mesh.devices.size)  # a multiple of n_proc (equal locals)
    with jax.set_mesh(mesh):
        state = _to_global(replicated(mesh), state)
        for epoch in range(start_epoch, epochs):
            losses = []
            # batch_slice: every process walks the SAME shuffled epoch
            # order but only decodes its contiguous 1/n_proc of each global
            # batch - identical trajectory, 1/n_proc the host-side IO
            for batch in iterate_batches(train_ds, batch_size, shuffle=True,
                                         seed=seed + epoch,
                                         batch_slice=(pid, n_proc)):
                batch = _to_global(batch_sharding(mesh), batch)
                step_key, sub = jax.random.split(step_key)
                state, loss = train_step(state, batch, sub)
                losses.append(loss)
            epoch_loss = float(jnp.mean(jnp.stack(losses)))
            log_fn(f"[epoch {epoch + 1}/{epochs}] loss {epoch_loss:.4f}")
            if epoch % eval_freq == 0 or epoch == epochs - 1:
                correct = total = 0
                for batch in iterate_batches(val_ds, batch_size, drop_last=False):
                    b = batch["label"].shape[0]
                    if b % n_mesh:
                        # pad the ragged tail to the mesh size so the batch
                        # axis shards evenly; modulo-repeat handles pad > b,
                        # label -1 keeps padded rows out of the accounting
                        pad = n_mesh - b % n_mesh
                        reps = np.arange(pad) % b
                        batch = {
                            "image": np.concatenate(
                                [batch["image"], batch["image"][reps]], 0),
                            "label": np.concatenate(
                                [batch["label"],
                                 np.full((pad,), -1, batch["label"].dtype)], 0),
                        }
                    bsz = batch["label"].shape[0] // n_proc
                    local = jax.tree.map(
                        lambda x: x[pid * bsz:(pid + 1) * bsz], batch) \
                        if n_proc > 1 else batch
                    batch = _to_global(batch_sharding(mesh), local)
                    c, n = eval_step(state, batch)
                    correct += int(c)
                    total += int(n) - int(jnp.sum(batch["label"] == -1))
                acc = correct / max(total, 1)
                log_fn(f"[epoch {epoch + 1}] val accuracy {acc * 100:.2f}")
                history.append({"epoch": epoch, "loss": epoch_loss, "acc": acc})
            if checkpoint_dir and pid == 0 and (
                    epoch % save_every == 0 or epoch == epochs - 1):
                save_train_state(checkpoint_dir, jax.device_get(state), epoch + 1)
    return state, history
