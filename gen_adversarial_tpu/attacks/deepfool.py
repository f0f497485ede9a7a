"""DeepFool: iterative closest-hyperplane linearization over the top-k
classes of the original prediction (reference untargeted.py:470-568).

Batched re-design: the per-class `backward(retain_graph=True)` calls become
one jax.vjp linearization applied to k one-hot cotangents (same forward
randomness for all class gradients, exactly like the retained torch graph),
and the Python while-loop becomes lax.while_loop with a per-sample active
mask.
"""

import jax
import jax.numpy as jnp
from jax import lax

from gen_adversarial_tpu.attacks.utils import l2_norm, class_grads as _class_grads


def deepfool_attack(key: jax.Array, net, images: jnp.ndarray, labels: jnp.ndarray,
                    num_classes: int = 10, overshoot: float = 0.02,
                    max_iter: int = 50, return_iters: bool = False,
                    cotangent_chunk: int | None = None):
    b = images.shape[0]
    bdims = (-1,) + (1,) * (images.ndim - 1)
    k0, kloop = jax.random.split(key)

    logits0 = net(k0, images)
    order = jnp.argsort(-logits0, axis=1)[:, :num_classes]  # (B, K) descending
    label = order[:, 0]
    already_wrong = label != labels

    carry = dict(i=jnp.zeros((), jnp.int32),
                 r_tot=jnp.zeros_like(images),
                 k_i=label,
                 active=~already_wrong,
                 key=kloop)

    def cond(c):
        return (c["i"] < max_iter) & jnp.any(c["active"])

    def body(c):
        key, k1 = jax.random.split(c["key"])
        pert_image = images + (1.0 + overshoot) * c["r_tot"]
        fs, grads = _class_grads(net, k1, pert_image, order,  # (B,C), (K,B,...)
                                 cotangent_chunk=cotangent_chunk)

        # the SAME forward serves as the previous step's exit test and this
        # step's linearization (the reference's retain_graph coupling,
        # untargeted.py:557-560: fs at the stepped image yields k_i AND the
        # next iteration's gradients).  The first iteration always steps
        # (reference inits k_i = label before the loop).
        k_i_cur = jnp.argmax(fs, axis=1)
        tested = c["i"] > 0
        k_i = jnp.where(tested & c["active"], k_i_cur, c["k_i"])
        active = c["active"] & jnp.where(tested, k_i_cur == label, True)

        grad_orig = grads[0]
        f_sel = jnp.take_along_axis(fs, order, axis=1)  # (B, K)

        w_k = grads[1:] - grad_orig[None]                      # (K-1, B, ...)
        f_k = (f_sel[:, 1:] - f_sel[:, 0:1]).T                  # (K-1, B)
        w_norms = jnp.sqrt(jnp.sum(w_k ** 2, axis=tuple(range(2, w_k.ndim))))
        pert_k = jnp.abs(f_k) / jnp.maximum(w_norms, 1e-30)     # (K-1, B)
        kstar = jnp.argmin(pert_k, axis=0)                      # (B,)
        pert = jnp.min(pert_k, axis=0)                          # (B,)
        w = jnp.take_along_axis(
            w_k, kstar.reshape((1, -1) + (1,) * (images.ndim - 1)), axis=0)[0]

        r_i = (pert.reshape(bdims) + 1e-4) * w / jnp.maximum(
            l2_norm(w, keepdims=True), 1e-30)
        r_tot = jnp.where(active.reshape(bdims), c["r_tot"] + r_i, c["r_tot"])
        return dict(i=c["i"] + 1, r_tot=r_tot, k_i=k_i, active=active, key=key)

    out = lax.while_loop(cond, body, carry)

    pert_image = images + (1.0 + overshoot) * out["r_tot"]
    # samples still active at loop exit took a final step whose post-step
    # forward has not run yet (in the reference it runs at the body's end)
    kfin, _ = jax.random.split(out["key"])
    k_i = jnp.where(out["active"],
                    jnp.argmax(net(kfin, pert_image), axis=1), out["k_i"])
    failed = k_i == labels  # never crossed the boundary
    success = ~failed
    bound = jnp.where(failed, jnp.inf, l2_norm((1.0 + overshoot) * out["r_tot"]))
    adv = jnp.where(failed.reshape(bdims), images, pert_image)

    # inputs that were already misclassified: success with zero perturbation
    # (untargeted.py:511-513)
    success = jnp.where(already_wrong, True, success)
    bound = jnp.where(already_wrong, 0.0, bound)
    adv = jnp.where(already_wrong.reshape(bdims), images, adv)
    if return_iters:  # realized while_loop trip count (bench/diagnostics)
        return success, bound, adv, out["i"]
    return success, bound, adv
