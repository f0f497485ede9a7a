"""APGD (AutoAttack's auto-PGD) with CE or DLR loss, L2-bounded, untargeted.

Faithful batched re-design of the reference implementation
(untargeted.py:37-243): the momentum update (a=0.75), the loss-oscillation
step-size halving and the restart-from-best all become masked per-sample
updates inside one lax.fori_loop — the check *schedule* is data-independent
(counter arithmetic on n_iter only), so it is precomputed at trace time and
looked up per iteration; only the halving *decision* is per-sample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from gen_adversarial_tpu.attacks.utils import l2_norm, normalize


def dlr_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             eps: float = 1e-12) -> jnp.ndarray:
    """Difference-of-Logits-Ratio loss (untargeted.py:89-125), batched.
    Undefined for < 4 classes (trace-time check, matching the reference's
    AttributeError)."""
    n = logits.shape[1]
    if n < 4:
        raise AttributeError("APGD_DLR is undefined for problems with less than 4 classes!")
    logits_sorted = jnp.sort(logits, axis=1)
    attack_failed = jnp.argmax(logits, axis=1) == labels
    correct_logit = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    highest_wrong = jnp.where(attack_failed, logits_sorted[:, -2], logits_sorted[:, -1])
    numerator = -(correct_logit - highest_wrong)
    normalizer = jnp.where(logits_sorted[:, -3] != correct_logit,
                           logits_sorted[:, -3], logits_sorted[:, -4])
    denominator = logits_sorted[:, -1] - normalizer + eps
    return numerator / denominator


def _check_schedule(n_iter: int):
    """Static schedule of (is_check, lookback) per iteration
    (untargeted.py:66-68,216-238 counter arithmetic)."""
    initial = max(int(0.22 * n_iter), 1)
    min_it = max(int(0.06 * n_iter), 1)
    decr = max(int(0.03 * n_iter), 1)
    lookback = np.zeros((n_iter,), np.int32)
    counter, sii = 0, initial
    for i in range(n_iter):
        counter += 1
        if counter == sii:
            lookback[i] = counter
            counter = 0
            sii = max(sii - decr, min_it)
    return lookback


def apgd_attack(key: jax.Array, net, images: jnp.ndarray, labels: jnp.ndarray,
                n_iter: int, rho: float, max_bound: float, ce_loss: bool):
    """Batched APGD.  Returns (success, bound, adv)."""
    b = images.shape[0]
    bdims = (-1,) + (1,) * (images.ndim - 1)

    if ce_loss:
        criterion = lambda lg, y: optax.softmax_cross_entropy_with_integer_labels(lg, y)
    else:
        criterion = dlr_loss

    def loss_and_grad(k, x):
        def f(x_):
            loss = criterion(net(k, x_), labels)
            return jnp.sum(loss), loss
        (_, loss), grad = jax.value_and_grad(f, has_aux=True)(x)
        return loss, grad

    lookback_np = _check_schedule(n_iter)
    lookback_arr = jnp.asarray(lookback_np)
    is_check_arr = jnp.asarray(lookback_np > 0)

    keys = jax.random.split(key, n_iter + 3)

    def project(delta):
        nrm = l2_norm(delta, keepdims=True)
        return normalize(delta) * jnp.minimum(max_bound, nrm)

    # init (untargeted.py:132-167)
    x_adv = jnp.clip(images + max_bound * normalize(
        jax.random.normal(keys[0], images.shape, images.dtype)), 0.0, 1.0)
    loss, grad = loss_and_grad(keys[1], x_adv)

    carry = dict(
        x_adv=x_adv, x_adv_old=x_adv, grad=grad,
        step_size=jnp.full((b,), 2.0 * max_bound, images.dtype),
        best_loss=loss, prev_best_loss=loss,
        x_best=x_adv, grad_best=grad,
        reduced_last=jnp.ones((b,), bool),
        prev_loss=loss,
        cum_inc=jnp.zeros((n_iter, b), jnp.int32),
        cum_now=jnp.zeros((b,), jnp.int32),
    )

    def body(i, c):
        a = jnp.where(i > 0, 0.75, 1.0).astype(images.dtype)
        grad2 = c["x_adv"] - c["x_adv_old"]
        x_old = c["x_adv"]

        new_adv = c["x_adv"] + c["step_size"].reshape(bdims) * normalize(c["grad"])
        new_adv = jnp.clip(images + project(new_adv - images), 0.0, 1.0)
        new_adv = c["x_adv"] + (new_adv - c["x_adv"]) * a + grad2 * (1 - a)
        x_adv = jnp.clip(images + project(new_adv - images), 0.0, 1.0)

        loss, grad = loss_and_grad(keys[2 + i], x_adv)

        inc = jnp.where(i > 0, loss > c["prev_loss"], False).astype(jnp.int32)
        cum_now = c["cum_now"] + inc
        cum_inc = lax.dynamic_update_index_in_dim(c["cum_inc"], cum_now, i, 0)

        improved = loss > c["best_loss"]
        best_loss = jnp.where(improved, loss, c["best_loss"])
        x_best = jnp.where(improved.reshape(bdims), x_adv, c["x_best"])
        grad_best = jnp.where(improved.reshape(bdims), grad, c["grad_best"])

        # step-size check (untargeted.py:216-238)
        lb = lookback_arr[i]
        do_check = is_check_arr[i]
        cum_lo = lax.dynamic_index_in_dim(cum_inc, jnp.maximum(i - lb + 1, 0), 0,
                                          keepdims=False)
        n_incr = cum_now - cum_lo
        loss_not_increasing = n_incr.astype(jnp.float32) < lb.astype(jnp.float32) * rho
        no_improvement = c["prev_best_loss"] >= best_loss
        reduce = loss_not_increasing | (no_improvement & ~c["reduced_last"])
        apply = do_check & reduce

        step_size = jnp.where(apply, c["step_size"] / 2.0, c["step_size"])
        x_adv = jnp.where(apply.reshape(bdims), x_best, x_adv)
        grad = jnp.where(apply.reshape(bdims), grad_best, grad)
        reduced_last = jnp.where(do_check, reduce, c["reduced_last"])
        prev_best_loss = jnp.where(do_check, best_loss, c["prev_best_loss"])

        return dict(x_adv=x_adv, x_adv_old=x_old, grad=grad, step_size=step_size,
                    best_loss=best_loss, prev_best_loss=prev_best_loss,
                    x_best=x_best, grad_best=grad_best, reduced_last=reduced_last,
                    prev_loss=loss, cum_inc=cum_inc, cum_now=cum_now)

    carry = lax.fori_loop(0, n_iter, body, carry)

    x_adv = carry["x_adv"]
    succeed = jnp.argmax(net(keys[-1], x_adv), -1) != labels
    bound = l2_norm(x_adv - images)
    return succeed, bound, x_adv
