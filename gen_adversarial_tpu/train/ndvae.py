"""ND-VAE trainer: Adamax denoising-VAE over (adversarial -> clean) pairs,
with annealed balanced KL (reference
nd_vae/modules/NVAE_defense_training.py:18-110, NVAE.py:677-694 and
NVAE_utils.py:20-60 in SerezD/gen_adversarial), plus the FGSM
adversarial-dataset generator (generate_fgsm_data.py:39-77).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
from gen_adversarial_tpu.models.nvae.distributions import DiscMixLogistic

# NVAE.py:22-24
KL_ANNEAL_PORTION = 0.3
KL_CONST_PORTION = 0.0001
KL_CONST_COEFF = 0.0001

# per-task hyperparameters, train_ndvae.py:41-96
NDVAE_RECIPES = {
    "celeba256": dict(image_size=256, epochs=50, lr=1e-3, batch_size=32,
                      params=dict(x_channels=3, pre_proc_groups=2,
                                  encoding_channels=16, scales=2, groups=4,
                                  cells=2),
                      noise_max=0.1, use_noise=True),
    "celeba64": dict(image_size=64, epochs=400, lr=1e-4, batch_size=256,
                     params=dict(x_channels=3, pre_proc_groups=2,
                                 encoding_channels=8, scales=1, groups=2,
                                 cells=4),
                     noise_max=0.05, use_noise=True),
    "cars128": dict(image_size=128, epochs=100, lr=1e-3, batch_size=32,
                    params=dict(x_channels=3, pre_proc_groups=2,
                                encoding_channels=16, scales=2, groups=2,
                                cells=4),
                    noise_max=0.1, use_noise=True),
}

# FGSM bounds for adversarial-dataset generation (generate_fgsm_data.py:42-55)
FGSM_DATA_BOUNDS = {"resnet-50": 4.0, "vgg-11": 2.0, "resnext-50": 4.0}


def kl_balancer_coeff(num_scales: int, groups_per_scale: int) -> jnp.ndarray:
    """'square' coefficients (NVAE_utils.py:251-266).  NOTE the reference
    calls this with groups_per_scale = num_latent_scales (NVAE.py:678-679) -
    reproduced by the caller."""
    parts = [np.square(2 ** i) / groups_per_scale * np.ones(groups_per_scale)
             for i in range(num_scales)]
    return jnp.asarray(np.concatenate(parts), jnp.float32)


def kl_coeff(step, total_step, constant_step, min_kl_coeff):
    return jnp.clip((step - constant_step) / total_step, min_kl_coeff, 1.0)


def kl_balancer(kl_terms: list, beta, alpha: jnp.ndarray):
    """Balanced KL (NVAE_utils.py:23-60, balance=True path; falls back to a
    plain sum when beta >= 1)."""
    kl_all = jnp.stack(kl_terms, axis=1)  # (B, L)

    def balanced(_):
        alpha_i = alpha[1:][None, :]
        kl_coeff_i = jnp.mean(jnp.abs(kl_all), axis=0, keepdims=True) + 0.01
        total_kl = jnp.sum(kl_coeff_i)
        c = kl_coeff_i[0] / alpha_i * total_kl
        c = c / jnp.mean(c, axis=1, keepdims=True)
        return jnp.sum(kl_all * jax.lax.stop_gradient(c), axis=1)

    def plain(_):
        return jnp.sum(kl_all, axis=1)

    kl = jax.lax.cond(beta < 1.0, balanced, plain, None)
    return beta * kl


def ndvae_loss(model: DefenceNVAE, logits, x_orig, kl_all, global_step,
               num_total_iter):
    """Defence_NVAE.loss (NVAE.py:677-694).  NOTE: the reference evaluates
    the mixture log-prob on x_orig in [0,1] (not renormalized to [-1,1]) -
    reproduced faithfully."""
    alpha_i = kl_balancer_coeff(model.scales, model.scales)
    coeff = kl_coeff(global_step, KL_ANNEAL_PORTION * num_total_iter,
                     KL_CONST_PORTION * num_total_iter, KL_CONST_COEFF)
    recon = -jnp.sum(DiscMixLogistic(logits).log_prob(x_orig), axis=(1, 2))
    balanced_kl = kl_balancer(kl_all, coeff, alpha_i)
    nelbo = recon + balanced_kl
    return jnp.mean(nelbo), recon, balanced_kl


def make_ndvae_train_step(model: DefenceNVAE, lr: float, num_total_iter: int):
    tx = optax.adamax(lr, eps=1e-3)
    tx = optax.chain(optax.add_decayed_weights(1e-2), tx)  # Adamax(wd 1e-2)

    @jax.jit
    def train_step(variables, opt_state, batch, key, global_step):
        x_adv = jnp.clip(batch["x_adv"], 0.0, 1.0)
        x_orig = jnp.clip(batch["x_orig"], 0.0, 1.0)

        def loss_fn(params):
            v = {**variables, "params": params}
            (logits, _, _, kl_all), updates = model.apply(
                v, x_adv, key, train=True, mutable=["batch_stats"])
            loss, recon, kl = ndvae_loss(model, logits, x_orig, kl_all,
                                         global_step, num_total_iter)
            return loss, (updates, jnp.mean(recon), jnp.mean(kl))

        (loss, (updates, recon, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        new_updates, opt_state = tx.update(grads, opt_state, variables["params"])
        variables = {**variables,
                     "params": optax.apply_updates(variables["params"], new_updates),
                     "batch_stats": updates["batch_stats"]}
        return variables, opt_state, loss, recon, kl

    return tx, train_step


def generate_fgsm_dataset(classifier_fn, dataset, l2_bound: float,
                          out_dir: str, batch_size: int = 32, seed: int = 0):
    """FGSM adversaries over a folder dataset, written back into class
    folders as PNGs (generate_fgsm_data.py:61-77)."""
    import os
    from PIL import Image
    from gen_adversarial_tpu.attacks import fgsm_attack
    from gen_adversarial_tpu.data.datasets import iterate_batches

    net = lambda key, x: classifier_fn(x)
    attack = jax.jit(lambda k, x, y: fgsm_attack(k, net, x, y, l2_bound))
    key = jax.random.PRNGKey(seed)
    idx = 0
    for batch in iterate_batches(dataset, batch_size, drop_last=False):
        key, sub = jax.random.split(key)
        _, _, adv = attack(sub, jnp.clip(jnp.asarray(batch["image"]), 0, 1),
                           jnp.asarray(batch["label"]))
        adv = np.asarray(adv)
        for img in adv:
            f = dataset.files[idx]
            # always .png: saving under a .jpg source name would re-encode
            # lossily and destroy the L2-bounded perturbation (the reference
            # also writes PNGs, generate_fgsm_data.py:71-77)
            rel = f.parent.name + "/" + f.with_suffix(".png").name
            path = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
            idx += 1
