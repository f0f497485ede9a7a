"""Competitor defense wrappers + the TRADES loss (reference
src/defenses/competitors/{a_vae,nd_vae}/purification_model.py and
trades/modules.py in SerezD/gen_adversarial)."""

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gen_adversarial_tpu.models.avae.model import StyledGenerator
from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
from gen_adversarial_tpu.ops.image import avg_pool2d


@struct.dataclass
class AVaeDefense:
    """a_vae/purification_model.py: avg_pool([-1,1] input) -> generator at
    inference temp 0.6 -> back to [0,1] -> classifier."""
    variables: Any
    classifier_variables: Any
    model: StyledGenerator = struct.field(pytree_node=False)
    classifier_apply: Callable = struct.field(pytree_node=False)
    kernel_size: int = struct.field(pytree_node=False, default=4)

    def get_purified(self, key, x):
        x = avg_pool2d(x * 2.0 - 1.0, self.kernel_size)
        out = self.model.apply(self.variables, x, key, inference=True)
        return (out + 1.0) / 2.0

    def __call__(self, key, x, preds_only: bool = True):
        purified = self.get_purified(key, x)
        logits = self.classifier_apply(self.classifier_variables, purified)
        return logits if preds_only else (logits, purified)


@struct.dataclass
class NDVaeDefense:
    """nd_vae/purification_model.py: add N(0, noise_std) -> clamp ->
    Defence_NVAE -> DiscMixLogistic mean in [0,1] (the ND-VAE's own mean
    shifts by (x+1)/2, NVAE_utils.py:248) -> classifier."""
    variables: Any
    classifier_variables: Any
    model: DefenceNVAE = struct.field(pytree_node=False)
    classifier_apply: Callable = struct.field(pytree_node=False)
    noise_std: float = struct.field(pytree_node=False, default=0.1)

    def get_purified(self, key, x):
        k1, k2 = jax.random.split(key)
        from gen_adversarial_tpu.ops.image import clamp01
        x = clamp01(x + jax.random.normal(k1, x.shape, x.dtype) * self.noise_std)
        return self.model.apply(self.variables, x, k2,
                                method=DefenceNVAE.purify)

    def __call__(self, key, x, preds_only: bool = True):
        purified = self.get_purified(key, x)
        logits = self.classifier_apply(self.classifier_variables, purified)
        return logits if preds_only else (logits, purified)


def kl_div_sum(log_p_adv, p_nat):
    """torch nn.KLDivLoss(reduction='sum')(log_softmax(adv), softmax(nat))."""
    return jnp.sum(p_nat * (jnp.log(jnp.maximum(p_nat, 1e-30)) - log_p_adv))


def trades_inner_l2(model_fn, key, x_natural, epsilon: float,
                    perturb_steps: int, normalization_function=lambda x: x):
    """TRADES inner maximization, l_2 variant (trades/modules.py:46-74):
    SGD(lr = 2*eps/steps) on delta with per-sample grad renorm, projection
    into the [0,1] box and the per-sample L2 ball."""
    b = x_natural.shape[0]
    bdims = (-1,) + (1,) * (x_natural.ndim - 1)
    step_lr = epsilon / perturb_steps * 2

    nat_logits = model_fn(normalization_function(x_natural))
    p_nat = jax.nn.softmax(nat_logits, axis=1)

    def kl_loss(delta):
        adv = x_natural + delta
        log_p_adv = jax.nn.log_softmax(model_fn(normalization_function(adv)), axis=1)
        return -kl_div_sum(log_p_adv, p_nat)  # minimize -KL == maximize KL

    ks = jax.random.split(key, perturb_steps + 1)  # no key reuse: one for
    delta = 0.001 * jax.random.normal(ks[0], x_natural.shape,  # the init,
                                      x_natural.dtype)  # one per PGD step
    keys = ks[1:]
    for i in range(perturb_steps):
        g = jax.grad(kl_loss)(delta)
        norms = jnp.sqrt(jnp.sum(g.reshape(b, -1) ** 2, axis=1))
        g = g / norms.reshape(bdims)
        # 0-grad samples get random directions (modules.py:66-67)
        rnd = jax.random.normal(keys[i], g.shape, g.dtype)
        g = jnp.where((norms == 0).reshape(bdims), rnd, g)
        delta = delta - step_lr * g  # SGD minimizing -KL
        # projection: into box, then renorm to the eps ball (modules.py:71-73)
        delta = jnp.clip(delta + x_natural, 0.0, 1.0) - x_natural
        dn = jnp.sqrt(jnp.sum(delta.reshape(b, -1) ** 2, axis=1))
        factor = jnp.minimum(1.0, epsilon / jnp.maximum(dn, 1e-12))
        delta = delta * factor.reshape(bdims)
    return jnp.clip(x_natural + delta, 0.0, 1.0)


def trades_inner_linf(model_fn, key, x_natural, epsilon: float,
                      step_size: float, perturb_steps: int,
                      normalization_function=lambda x: x):
    """l_inf sign-PGD variant (trades/modules.py:36-45)."""
    nat_logits = model_fn(normalization_function(x_natural))
    p_nat = jax.nn.softmax(nat_logits, axis=1)

    def kl_loss(x_adv):
        log_p_adv = jax.nn.log_softmax(model_fn(normalization_function(x_adv)), axis=1)
        return kl_div_sum(log_p_adv, p_nat)

    x_adv = x_natural + 0.001 * jax.random.normal(key, x_natural.shape,
                                                  x_natural.dtype)
    for _ in range(perturb_steps):
        g = jax.grad(kl_loss)(x_adv)
        x_adv = x_adv + step_size * jnp.sign(g)
        x_adv = jnp.clip(x_adv, x_natural - epsilon, x_natural + epsilon)
        x_adv = jnp.clip(x_adv, 0.0, 1.0)
    return x_adv


def trades_loss(model_fn, key, x_natural, y, step_size: float = 0.003,
                epsilon: float = 0.031, perturb_steps: int = 10,
                beta: float = 1.0, distance: str = "l_inf",
                normalization_function=lambda x: x):
    """Outer TRADES objective (trades/modules.py:79-88):
    CE(natural) + beta * (1/B) * KL(adv || natural)."""
    if distance == "l_2":
        x_adv = trades_inner_l2(model_fn, key, x_natural, epsilon,
                                perturb_steps, normalization_function)
    elif distance == "l_inf":
        x_adv = trades_inner_linf(model_fn, key, x_natural, epsilon, step_size,
                                  perturb_steps, normalization_function)
    else:
        x_adv = jnp.clip(x_natural + 0.001 * jax.random.normal(
            key, x_natural.shape, x_natural.dtype), 0.0, 1.0)
    x_adv = jax.lax.stop_gradient(x_adv)

    b = x_natural.shape[0]
    logits_nat = model_fn(normalization_function(x_natural))
    loss_natural = optax.softmax_cross_entropy_with_integer_labels(logits_nat, y).mean()
    log_p_adv = jax.nn.log_softmax(model_fn(normalization_function(x_adv)), axis=1)
    p_nat = jax.nn.softmax(logits_nat, axis=1)
    loss_robust = kl_div_sum(log_p_adv, p_nat) / b
    return loss_natural + beta * loss_robust
