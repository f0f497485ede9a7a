"""TRADES fine-tuning of a pretrained classifier (reference
trades/fine_tune_classifier.py in SerezD/gen_adversarial): the DDP
classifier-trainer skeleton with the loss swapped for trades_loss, L2 inner
PGD (perturb_steps=16, step_size=0.001), per-task eps/beta from the README
(108-112).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from gen_adversarial_tpu.defenses.competitors import trades_inner_l2, kl_div_sum
from gen_adversarial_tpu.train.classifier import TrainState

# README.md:108-112 / fine_tune_classifier.py:142-148
TRADES_RECIPES = {
    "gender": dict(beta=1.5, epsilon=4.0),
    "ids": dict(beta=1.0, epsilon=2.0),
    "cars": dict(beta=8.0, epsilon=4.0),
}
TRADES_PERTURB_STEPS = 16
TRADES_STEP_SIZE = 0.001

_norm = lambda z: (z - 0.5) / 0.5


def make_trades_train_step(beta: float, epsilon: float,
                           perturb_steps: int = TRADES_PERTURB_STEPS):
    """Data-parallel TRADES step.  The inner PGD runs against the frozen
    model (model.eval() in modules.py:32); the outer CE + beta*KL loss runs
    in training mode (model.train(), modules.py:77), mirroring the
    reference's mode flips."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        x, y = batch["image"], batch["label"]
        b = x.shape[0]

        def eval_model_fn(inp):
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                inp, train=False)

        x_adv = trades_inner_l2(eval_model_fn, key, x, epsilon, perturb_steps,
                                normalization_function=_norm)
        x_adv = jax.lax.stop_gradient(jnp.clip(x_adv, 0.0, 1.0))

        def loss_fn(params):
            logits_nat, upd1 = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                _norm(x), train=True, mutable=["batch_stats"])
            logits_adv, upd2 = state.apply_fn(
                {"params": params, "batch_stats": upd1["batch_stats"]},
                _norm(x_adv), train=True, mutable=["batch_stats"])
            loss_natural = optax.softmax_cross_entropy_with_integer_labels(
                logits_nat, y).mean()
            p_nat = jax.nn.softmax(logits_nat, axis=1)
            log_p_adv = jax.nn.log_softmax(logits_adv, axis=1)
            loss_robust = kl_div_sum(log_p_adv, p_nat) / b
            return loss_natural + beta * loss_robust, upd2["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss

    return train_step
