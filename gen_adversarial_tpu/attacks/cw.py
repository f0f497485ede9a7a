"""Carlini & Wagner L2 attack, tanh-space Adam optimization.

Batched re-design of the reference (untargeted.py:325-467): FGSM+noise
initialization, per-restart Adam on w = atanh(2x-1), rolling-mean early
stopping, and the adaptive-c restart schedule (x1.2 on fail / x0.8 on new
best / x0.9 on worse, clamped to [0.1, 1000]).  Restarts run as a lax.scan
(one traced body), iterations as a lax.fori_loop with per-sample 'active'
masks standing in for the reference's Python `break`.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gen_adversarial_tpu.attacks.fgsm import fgsm_attack
from gen_adversarial_tpu.attacks.utils import l2_norm


def _cw_f(logits: jnp.ndarray, labels: jnp.ndarray, kappa: float) -> jnp.ndarray:
    """The C&W f-function (untargeted.py:350-361), batched."""
    n = logits.shape[1]
    one_hot = jax.nn.one_hot(labels, n, dtype=logits.dtype)
    real = jnp.sum(one_hot * logits, axis=1)
    other = jnp.max((1 - one_hot) * logits - one_hot * 1e4, axis=1)
    return jnp.maximum(real - other + kappa, 0.0)


def cw_attack(key: jax.Array, net, images: jnp.ndarray, labels: jnp.ndarray,
              c: float = 1.0, kappa: float = 0.0, steps: int = 64,
              lr: float = 1e-2, n_restarts: int = 1,
              early_stopping_steps: int = 16):
    b = images.shape[0]
    bdims = (-1,) + (1,) * (images.ndim - 1)
    res = float(np.log2(images.shape[2]))  # W of (B,H,W,C): the reference
    # derives res from image.shape[-1] = W in NCHW (untargeted.py:380)
    init_bound = float(2.0 ** (res - 5))
    noise_norm = float(2.0 ** (res - 8))

    restart_keys = jax.random.split(key, n_restarts)

    def one_restart(carry, rkey):
        c_cur, abs_succ, abs_best_l2, abs_best_adv = carry
        kf, kn, ks, kfin = jax.random.split(rkey, 4)

        # FGSM + noise init (untargeted.py:380-391)
        _, _, fgsm_adv = fgsm_attack(kf, net, images, labels, init_bound)
        noise = jax.random.normal(kn, images.shape, images.dtype)
        noise = noise * noise_norm / l2_norm(noise, keepdims=True)
        best_adv = jnp.clip(fgsm_adv + noise, 1e-6, 1.0 - 1e-6)
        best_l2 = l2_norm(best_adv - images)

        w0 = jnp.arctanh(best_adv * 2.0 - 1.0)
        step_keys = jax.random.split(ks, steps)

        state = dict(
            w=w0, m=jnp.zeros_like(w0), v=jnp.zeros_like(w0),
            t=jnp.zeros((b,), images.dtype),
            active=jnp.ones((b,), bool),
            rolling_mean=jnp.zeros((b,), images.dtype),
            rolling_updates=jnp.zeros((b,), jnp.int32),
            prev_succeed=jnp.zeros((b,), bool),
            best_adv=best_adv, best_l2=best_l2,
        )

        def body(i, s):
            adv = 0.5 * (jnp.tanh(s["w"]) + 1.0)

            def loss_fn(w_):
                adv_ = 0.5 * (jnp.tanh(w_) + 1.0)
                l2_loss = jnp.sum((adv_ - images) ** 2, axis=tuple(range(1, images.ndim)))
                logits = net(step_keys[i], adv_)
                loss = l2_loss + c_cur * _cw_f(logits, labels, kappa)
                return jnp.sum(loss), (loss, logits)

            (_, (loss, logits)), grad = jax.value_and_grad(loss_fn, has_aux=True)(s["w"])

            # per-sample clip_grad_norm_(max_norm=1) (untargeted.py:421)
            gn = l2_norm(grad, keepdims=True)
            grad = grad * jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-12))

            # Adam step, frozen for inactive samples
            act = s["active"]
            t = s["t"] + act.astype(images.dtype)
            m = jnp.where(act.reshape(bdims), 0.9 * s["m"] + 0.1 * grad, s["m"])
            v = jnp.where(act.reshape(bdims), 0.999 * s["v"] + 0.001 * grad ** 2, s["v"])
            t_safe = jnp.maximum(t, 1.0).reshape(bdims)
            mhat = m / (1 - 0.9 ** t_safe)
            vhat = v / (1 - 0.999 ** t_safe)
            w = jnp.where(act.reshape(bdims),
                          s["w"] - lr * mhat / (jnp.sqrt(vhat) + 1e-8), s["w"])

            succeed = jnp.argmax(logits, -1) != labels

            # early stopping (untargeted.py:428-439): break when succeeding
            # but not converging
            stop_now = act & succeed & (loss > s["rolling_mean"]) & \
                (s["rolling_updates"] > early_stopping_steps)
            still = act & ~stop_now
            upd_roll = still & succeed
            lookback = jnp.minimum(s["rolling_updates"], early_stopping_steps).astype(images.dtype)
            new_mean = (s["rolling_mean"] * lookback + loss) / (lookback + 1)
            rolling_mean = jnp.where(upd_roll, new_mean, s["rolling_mean"])
            rolling_updates = s["rolling_updates"] + upd_roll.astype(jnp.int32)

            # best-adv update (untargeted.py:441-446)
            this_l2 = l2_norm(adv - images)
            upd = still & (~s["prev_succeed"] | (s["best_l2"] > this_l2))
            best_adv = jnp.where(upd.reshape(bdims), adv, s["best_adv"])
            best_l2 = jnp.where(upd, this_l2, s["best_l2"])
            prev_succeed = jnp.where(upd, succeed, s["prev_succeed"])

            return dict(w=w, m=m, v=v, t=t, active=act & ~stop_now,
                        rolling_mean=rolling_mean, rolling_updates=rolling_updates,
                        prev_succeed=prev_succeed, best_adv=best_adv, best_l2=best_l2)

        # while_loop instead of a fixed fori_loop: once every sample has
        # early-stopped the body is a pure identity (all updates are masked
        # by `active`), so exiting is result-identical and realizes the
        # reference's per-image `break` (untargeted.py:428-439) at batch
        # granularity - the production budget is 1024 steps and early stop
        # usually fires within tens.
        def while_cond(i_s):
            i, s = i_s
            return (i < steps) & jnp.any(s["active"])

        def while_body(i_s):
            i, s = i_s
            return i + 1, body(i, s)

        _, state = lax.while_loop(while_cond, while_body,
                                  (jnp.zeros((), jnp.int32), state))

        # restart epilogue: evaluate, adapt c (untargeted.py:448-465)
        best_adv, best_l2 = state["best_adv"], state["best_l2"]
        succeed = jnp.argmax(net(kfin, best_adv), -1) != labels

        new_best = succeed & (~abs_succ | (abs_succ & (abs_best_l2 > best_l2)))
        worse = succeed & abs_succ & (abs_best_l2 < best_l2)
        c_next = jnp.where(~succeed, 1.2 * c_cur,
                           jnp.where(new_best, 0.8 * c_cur,
                                     jnp.where(worse, 0.9 * c_cur, c_cur)))
        c_next = jnp.clip(c_next, 0.1, 1000.0)

        abs_best_adv = jnp.where(new_best.reshape(bdims), best_adv, abs_best_adv)
        abs_best_l2 = jnp.where(new_best, best_l2, abs_best_l2)
        abs_succ = abs_succ | succeed
        return (c_next, abs_succ, abs_best_l2, abs_best_adv), None

    init = (jnp.full((b,), c, images.dtype),
            jnp.zeros((b,), bool),
            jnp.zeros((b,), images.dtype),
            images)
    (c_fin, succ, best_l2, best_adv), _ = lax.scan(one_restart, init, restart_keys)
    return succ, best_l2, best_adv
