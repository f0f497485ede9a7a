"""FAB: Fast Adaptive Boundary attack, minimum-norm untargeted L2 variant
(reference untargeted.py:571-705).

Batched re-design: the per-class backward loop (get_diff_logits_grads)
becomes one vjp linearization applied to n_classes one-hot cotangents; the
closed-form projection onto hyperplane ∩ box is the batched projection_l2
in attacks/utils.py; iterations run in a lax.fori_loop with masked
best-tracking and the beta backward step applied where the iterate is
adversarial.
"""

import jax
import jax.numpy as jnp
from jax import lax

from gen_adversarial_tpu.attacks.utils import (
    l2_norm, projection_l2, class_grads as _all_class_grads)


def fab_attack(key: jax.Array, net, images: jnp.ndarray, labels: jnp.ndarray,
               n_iter: int = 128, alpha_max: float = 0.1, eta: float = 1.05,
               beta: float = 0.9, cotangent_chunk: int | None = None):
    b = images.shape[0]
    bdims = (-1,) + (1,) * (images.ndim - 1)
    k0, kloop = jax.random.split(key)

    pred0 = jnp.argmax(net(k0, images), axis=1)
    already_wrong = pred0 != labels

    x_orig_flat = images.reshape(b, -1)
    keys = jax.random.split(kloop, n_iter)

    carry = dict(x_i=images, x_adv=images,
                 bound=jnp.full((b,), 1e10, images.dtype),
                 succeed=jnp.zeros((b,), bool))

    def body(i, c):
        k1, k2 = jax.random.split(keys[i])
        logits, grads = _all_class_grads(  # (B,C), (C,B,...)
            net, k1, c["x_i"], cotangent_chunk=cotangent_chunk)
        g2 = jnp.moveaxis(grads, 0, 1).reshape(b, logits.shape[1], -1)  # (B,C,D)
        y_lab = jnp.take_along_axis(logits, labels[:, None], axis=1)
        g_lab = jnp.take_along_axis(g2, labels[:, None, None], axis=1)
        df = logits - y_lab                       # (B, C)
        dg = g2 - g_lab                           # (B, C, D)
        df = df.at[jnp.arange(b), labels].set(1e10)

        dist = jnp.abs(df) / (1e-12 + jnp.sqrt(jnp.sum(dg ** 2, axis=2)))
        closest = jnp.argmin(dist, axis=1)        # (B,)

        dg2 = jnp.take_along_axis(dg, closest[:, None, None], axis=1)[:, 0]  # (B,D)
        x_i_flat = c["x_i"].reshape(b, -1)
        b_coef = -jnp.take_along_axis(df, closest[:, None], axis=1)[:, 0] + \
            jnp.sum(dg2 * x_i_flat, axis=1)       # (B,)

        pts = jnp.concatenate([x_i_flat, x_orig_flat], axis=0)   # (2B, D)
        ws = jnp.concatenate([dg2, dg2], axis=0)
        bs = jnp.concatenate([b_coef, b_coef], axis=0)[:, None]
        d3 = projection_l2(pts, ws, bs)                          # (2B, D)
        d1 = d3[:b].reshape(images.shape)
        d2 = d3[b:].reshape(images.shape)

        a0 = jnp.sqrt(jnp.sum(d3 ** 2, axis=1))
        a1 = jnp.maximum(a0[:b], 1e-8)
        a2 = jnp.maximum(a0[b:], 1e-8)
        alpha = jnp.clip(a1 / (a1 + a2), 0.0, alpha_max).reshape(bdims)

        x_i = jnp.clip((c["x_i"] + eta * d1) * (1 - alpha) +
                       (images + d2 * eta) * alpha, 0.0, 1.0)

        succ_i = jnp.argmax(net(k2, x_i), axis=1) != labels
        t = l2_norm(x_i - images)
        improved = succ_i & (t < c["bound"])
        x_adv = jnp.where(improved.reshape(bdims), x_i, c["x_adv"])
        bound = jnp.where(improved, t, c["bound"])
        succeed = c["succeed"] | succ_i
        # backward step towards the original where adversarial
        x_i = jnp.where(succ_i.reshape(bdims),
                        (1 - beta) * images + beta * x_i, x_i)
        return dict(x_i=x_i, x_adv=x_adv, bound=bound, succeed=succeed)

    out = lax.fori_loop(0, n_iter, body, carry)

    success = jnp.where(already_wrong, True, out["succeed"])
    bound = jnp.where(already_wrong, 0.0, out["bound"])
    adv = jnp.where(already_wrong.reshape(bdims), images, out["x_adv"])
    return success, bound, adv
