"""Alpha schedules + evaluation objective (reference
alpha_learning/common_utils.py in SerezD/gen_adversarial)."""

import math
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

# hardcoded attenuations (common_utils.py:42,53,64)
ALPHA_ATTENUATION = {"gender": 1.0, "ids": 0.7, "cars": 0.7}


def get_linear_alphas(n: int) -> list:
    return [i / n for i in range(1, n + 1)]


def get_cosine_alphas(n: int) -> list:
    return [0.5 * (1 - math.cos(math.pi * (i / n))) for i in range(1, n + 1)]


def get_best_combination(folder: str) -> np.ndarray:
    alphas = np.load(f"{folder}/alphas.npy")
    accuracies = np.load(f"{folder}/accuracies.npy")[:, 0]
    return alphas[accuracies.argmax()]


class AlphaEvaluator:
    """EoT-32 accuracy of a purification defense on a precomputed
    adversarial set, as a function of the alpha vector
    (common_utils.py:32-103).

    `make_defense(alphas)` rebuilds the defense closure for a new alpha
    vector; because alphas enter the jitted purify as a plain array
    argument, re-evaluation does NOT retrace - the objective is one cached
    XLA program per batch shape.
    """

    def __init__(self, defense_for_alphas, images, labels, attenuation: float,
                 eot_steps: int = 32, batch_size: int = 16, seed: int = 0):
        from gen_adversarial_tpu.defenses.eot import eot_wrap
        self.defense_for_alphas = defense_for_alphas
        self.images = np.asarray(images)
        self.labels = np.asarray(labels)
        self.attenuation = attenuation
        self.eot_steps = eot_steps
        self.batch_size = batch_size
        self.key = jax.random.PRNGKey(seed)

        def accuracy_batch(key, x, y, alphas):
            defense = self.defense_for_alphas(alphas)
            net = eot_wrap(defense, self.eot_steps)
            preds = jnp.argmax(net(key, x), axis=1)
            return jnp.sum(preds == y)

        self._acc_batch = jax.jit(accuracy_batch)

    def objective_function(self, alphas) -> float:
        alphas = jnp.asarray(alphas) * self.attenuation
        correct, total = 0, 0
        bs = self.batch_size
        for i in range(0, len(self.images), bs):
            x = jnp.asarray(self.images[i:i + bs])
            y = jnp.asarray(self.labels[i:i + bs])
            self.key, sub = jax.random.split(self.key)
            correct += int(self._acc_batch(sub, x, y, alphas))
            total += int(x.shape[0])
        return correct / max(total, 1)
