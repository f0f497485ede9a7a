"""Small-scale NVAE trainer.

The reference never trains its NVAE — it loads NVlabs pretrained
checkpoints (`src/mlvgms_autoencoders/NVAE/loading_utils.py`), and the
upstream trainer lives in NVlabs/NVAE `train.py` (Adamax, annealed
balanced-KL ELBO).  This module provides that minimal recipe for the
repo's own `models/nvae` at small scale, so the defense-efficacy
experiment (`tools/efficacy_run.py`) can train a real generative
purifier end-to-end on TPU instead of synthesizing random weights.

Recipe (NVlabs/NVAE train.py:64-118, utils.py kl_balancer):
 - Adamax(lr, eps=1e-3) + small decoupled weight decay,
 - nelbo = recon(-log DiscMixLogistic) + beta(t) * balanced_kl,
 - beta anneals linearly over the first 30% of training from 1e-4 to 1,
 - while beta < 1 the per-group KL terms are rebalanced by their running
   magnitude x the config's square-schedule alpha (cfg.kl_alpha), exactly
   the scheme train/ndvae.py reproduces for the ND-VAE competitor.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gen_adversarial_tpu.models.nvae.model import NVAE
from gen_adversarial_tpu.train.ndvae import (
    KL_ANNEAL_PORTION, KL_CONST_PORTION, KL_CONST_COEFF, kl_coeff)


def balanced_kl(kl_all: jnp.ndarray, beta, alpha: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-balanced KL over the stacked (B, L) per-group terms
    (NVlabs/NVAE utils.py:kl_balancer, balance=True while beta < 1)."""

    def balanced(_):
        kl_mag = jnp.mean(jnp.abs(kl_all), axis=0, keepdims=True) + 0.01
        c = kl_mag / alpha[None, :] * jnp.sum(kl_mag)
        c = c / jnp.mean(c, axis=1, keepdims=True)
        return jnp.sum(kl_all * jax.lax.stop_gradient(c), axis=1)

    def plain(_):
        return jnp.sum(kl_all, axis=1)

    return beta * jax.lax.cond(beta < 1.0, balanced, plain, None)


def make_nvae_train_step(model: NVAE, lr: float, num_total_iter: int,
                         weight_decay: float = 1e-4,
                         input_noise: float = 0.0):
    """input_noise: std of Gaussian pixel-noise augmentation on the encoder
    input (the ELBO target stays the clean image).  Purification encodes
    *perturbed* images at defense time; a small-data NVAE whose encoder only
    ever saw clean pixels mis-encodes them, so the efficacy trainer uses a
    light denoising augmentation (0 = plain ELBO)."""
    tx = optax.chain(optax.add_decayed_weights(weight_decay),
                     optax.adamax(lr, eps=1e-3))
    alpha = jnp.asarray(model.cfg.kl_alpha(), jnp.float32)

    @jax.jit
    def train_step(variables, opt_state, batch, key, global_step):
        x = jnp.clip(batch["image"], 0.0, 1.0)
        if input_noise > 0.0:
            key, kn = jax.random.split(key)
            x_in = jnp.clip(
                x + input_noise * jax.random.normal(kn, x.shape), 0.0, 1.0)
        else:
            x_in = x

        def loss_fn(params):
            v = {**variables, "params": params}
            (logits, kl_all), updates = model.apply(
                v, x_in, key, train=True, mutable=["batch_stats"])
            recon = model.reconstruction_loss(x, logits)
            beta = kl_coeff(global_step, KL_ANNEAL_PORTION * num_total_iter,
                            KL_CONST_PORTION * num_total_iter, KL_CONST_COEFF)
            kl = balanced_kl(kl_all, beta, alpha)
            loss = jnp.mean(recon + kl)
            return loss, (updates, jnp.mean(recon), jnp.mean(jnp.sum(kl_all, axis=1)))

        (loss, (updates, recon, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        upd, opt_state = tx.update(grads, opt_state, variables["params"])
        variables = {**variables,
                     "params": optax.apply_updates(variables["params"], upd),
                     "batch_stats": updates["batch_stats"]}
        return variables, opt_state, loss, recon, kl

    return tx, train_step


def fit_nvae(model: NVAE, train_ds, epochs: int, lr: float, batch_size: int,
             seed: int = 0, log_fn=print, checkpoint_path: str | None = None,
             save_every_epochs: int = 5, input_noise: float = 0.0):
    """Train over a folder dataset; returns the final variables.

    checkpoint_path: a single .msgpack file updated every
    save_every_epochs epochs (core/checkpoint.save_variables) and reloaded
    on restart — the crash-resume granularity is the epoch."""
    from gen_adversarial_tpu.data.datasets import iterate_batches
    from gen_adversarial_tpu.core.checkpoint import save_variables, load_variables

    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, model.cfg.resolution, model.cfg.resolution,
                    model.cfg.img_channels))
    variables = jax.jit(
        lambda k: model.init({"params": k}, x0, k))(key)

    steps_per_epoch = max(1, len(train_ds) // batch_size)
    tx, train_step = make_nvae_train_step(model, lr,
                                          num_total_iter=epochs * steps_per_epoch,
                                          input_noise=input_noise)
    opt_state = tx.init(variables["params"])

    start_epoch = 0
    if checkpoint_path and Path(checkpoint_path).exists():
        variables, meta = load_variables(checkpoint_path)
        start_epoch = int(meta["epoch"]) + 1
        # optimizer moments restart cold; with epoch-granular saves on the
        # small-scale models this trainer targets, re-warming Adamax costs
        # a few steps and keeps the checkpoint a plain variables file
        log_fn(f"[resume] NVAE from {checkpoint_path} epoch {start_epoch}")

    gstep = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, epochs):
        losses, recons, kls = [], [], []
        for batch in iterate_batches(train_ds, batch_size, shuffle=True,
                                     seed=seed + epoch):
            key, sub = jax.random.split(key)
            variables, opt_state, loss, recon, kl = train_step(
                variables, opt_state, batch, sub, jnp.float32(gstep))
            gstep += 1
            losses.append(loss)
            recons.append(recon)
            kls.append(kl)
        log_fn(f"[nvae epoch {epoch + 1}/{epochs}] "
               f"nelbo {float(jnp.mean(jnp.stack(losses))):.2f} "
               f"recon {float(jnp.mean(jnp.stack(recons))):.2f} "
               f"kl {float(jnp.mean(jnp.stack(kls))):.2f}")
        if checkpoint_path and ((epoch + 1) % save_every_epochs == 0
                                or epoch == epochs - 1):
            save_variables(checkpoint_path, variables, {"epoch": epoch})
    return variables
