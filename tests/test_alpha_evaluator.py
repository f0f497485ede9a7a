"""AlphaEvaluator integration: the search objective re-evaluates without
retracing when alphas change (they enter the jitted program as an array)."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.defenses.base import MLVGMDefense
from gen_adversarial_tpu.defenses.purify import make_nvae_purify
from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
from gen_adversarial_tpu.search.alphas import AlphaEvaluator


def test_alpha_evaluator_objective():
    cfg = NVAEConfig(resolution=16, initial_channels=4, n_pre_post_blocks=1,
                     n_pre_post_cells=1, num_scales=2, num_groups_per_scale=1,
                     min_groups_per_scale=1, num_cells_per_group=1,
                     num_latent_per_group=2, num_nf_cells=None, num_mixtures=3)
    model = NVAE(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 16, 16, 3)), k))(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(16 * 16 * 3, 4).astype(np.float32))
    clf_apply = lambda v, x: x.reshape(x.shape[0], -1) @ v

    template = MLVGMDefense(purify_variables=variables, classifier_variables=W,
                            alphas=jnp.zeros((cfg.n_latents,)),
                            purify_apply=make_nvae_purify(model),
                            classifier_apply=clf_apply, image_size=16,
                            normalize_before_purify=False)

    images = rng.rand(6, 16, 16, 3).astype(np.float32)
    logits = np.asarray(clf_apply(W, jnp.asarray(images)))
    labels = logits.argmax(1).astype(np.int32)

    ev = AlphaEvaluator(template, images, labels, attenuation=0.7,
                        eot_steps=2, batch_size=3)
    acc0 = ev.objective_function(np.zeros(cfg.n_latents))
    acc1 = ev.objective_function(np.ones(cfg.n_latents))
    assert 0.0 <= acc0 <= 1.0 and 0.0 <= acc1 <= 1.0
    # repeated calls reuse the same compiled program (different alphas,
    # identical shapes) - sanity: returns without error and quickly
    for _ in range(3):
        ev.objective_function(np.random.RandomState(1).rand(cfg.n_latents))
