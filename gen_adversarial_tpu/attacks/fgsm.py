"""FGSM, L2-projected (reference untargeted.py:708-750): one signed-gradient
step, sign normalized to unit L2, projected onto the L2 ball, with
early-exit for already-misclassified inputs."""

import jax
import jax.numpy as jnp
import optax

from gen_adversarial_tpu.attacks.utils import normalize


def fgsm_attack(key: jax.Array, net, images: jnp.ndarray, labels: jnp.ndarray,
                l2_bound: float):
    """Batched FGSM.  net(key, x) -> logits."""
    k0, k2 = jax.random.split(key)

    def neg_ce(x):
        # ONE stochastic forward provides both the already-wrong check and
        # the gradient (the reference backprops through the same h_adv it
        # tests, untargeted.py:728-741) - a separate draw could mask a
        # sample the gradient draw still classifies correctly
        logits = net(k0, x)
        loss = -optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(loss), logits

    (_, logits0), grad = jax.value_and_grad(neg_ce, has_aux=True)(images)
    already_wrong = jnp.argmax(logits0, -1) != labels
    pert = normalize(jnp.sign(grad))
    x_adv = jnp.clip(images - pert * l2_bound, 0.0, 1.0)

    succ = jnp.argmax(net(k2, x_adv), -1) != labels
    mask = already_wrong.reshape((-1,) + (1,) * (images.ndim - 1))
    adv = jnp.where(mask, images, x_adv)
    success = jnp.where(already_wrong, True, succ)
    bound = jnp.where(already_wrong, 0.0, l2_bound)
    return success, bound, adv
