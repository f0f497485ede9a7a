"""Alpha schedules + evaluation objective (reference
alpha_learning/common_utils.py in SerezD/gen_adversarial)."""

import math
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

    The defense is a pytree dataclass (defenses/base.py) passed to the
    jitted objective as an ARGUMENT with `.replace(alphas=...)` swapping the
    alpha leaf - so re-evaluation with new alphas reuses the same compiled
    XLA program, mirroring the reference's in-place alpha mutation
    (common_utils.py:88) without its eager re-dispatch.

    EoT noise keys are position-addressed, not stream-addressed: evaluation
    `e`, batch `b` always uses fold_in(fold_in(base_key, e), b).  A search
    that resumes after `done` evaluations calls fast_forward(done) and every
    later evaluation draws EXACTLY the noise an uninterrupted run would have
    - full-run seed reproducibility, not just search-side (ADVICE r2).
    """

    def __init__(self, defense_template, images, labels, attenuation: float,
                 eot_steps: int = 32, batch_size: int = 16, seed: int = 0,
                 eot_chunk: int | None = None):
        from gen_adversarial_tpu.defenses.eot import eot_wrap
        self.defense = defense_template
        self.images = np.asarray(images)
        self.labels = np.asarray(labels)
        self.attenuation = attenuation
        self.eot_steps = eot_steps
        self.batch_size = batch_size
        self.base_key = jax.random.PRNGKey(seed)
        self._eval_index = 0

        def accuracy_batch(defense, key, x, y):
            # eot_chunk bounds peak activations for the high-res purifiers
            # (the harness chunks the same way; unchunked EoT-32 through a
            # 1024^2 decode OOMs a 16G chip)
            net = eot_wrap(defense, self.eot_steps, chunk=eot_chunk)
            preds = jnp.argmax(net(key, x), axis=1)
            return jnp.sum(preds == y)

        self._acc_batch = jax.jit(accuracy_batch)

    def fast_forward(self, n_evaluations: int):
        """Skip the key material of the first n completed evaluations (used
        by the searches' resume path; see grid._fast_forward)."""
        self._eval_index = int(n_evaluations)

    def objective_function(self, alphas) -> float:
        alphas = jnp.asarray(alphas) * self.attenuation
        defense = self.defense.replace(alphas=alphas)
        eval_key = jax.random.fold_in(self.base_key, self._eval_index)
        self._eval_index += 1
        correct, total = 0, 0
        bs = self.batch_size
        for bi, i in enumerate(range(0, len(self.images), bs)):
            x = jnp.asarray(self.images[i:i + bs])
            y = jnp.asarray(self.labels[i:i + bs])
            sub = jax.random.fold_in(eval_key, bi)
            correct += int(self._acc_batch(defense, sub, x, y))
            total += int(x.shape[0])
        return correct / max(total, 1)
