"""bf16 defense path: casts cleanly and stays numerically close to f32 on
the purify forward (CPU check; throughput use is on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.precision import cast_floating
from gen_adversarial_tpu.defenses.base import MLVGMDefense
from gen_adversarial_tpu.defenses.purify import make_nvae_purify
from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig


def test_bf16_defense_close_to_f32():
    cfg = NVAEConfig(resolution=16, initial_channels=4, n_pre_post_blocks=1,
                     n_pre_post_cells=1, num_scales=2, num_groups_per_scale=1,
                     min_groups_per_scale=1, num_cells_per_group=1,
                     num_latent_per_group=2, num_nf_cells=None, num_mixtures=3)
    model = NVAE(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 16, 16, 3)), k))(jax.random.PRNGKey(0))
    W = jnp.asarray(np.random.RandomState(0).randn(16 * 16 * 3, 4).astype(np.float32))
    defense = MLVGMDefense(purify_variables=variables, classifier_variables=W,
                           alphas=jnp.zeros((cfg.n_latents,)),
                           purify_apply=make_nvae_purify(model),
                           classifier_apply=lambda v, x: x.reshape(x.shape[0], -1) @ v,
                           image_size=16, normalize_before_purify=False)
    d16 = cast_floating(defense)
    assert d16.alphas.dtype == jnp.bfloat16

    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(2)
    p32 = defense.get_purified(key, x)
    p16 = d16.get_purified(key, x.astype(jnp.bfloat16))
    # deterministic path (alphas=0): bf16 decode within coarse tolerance
    err = float(jnp.abs(p16.astype(jnp.float32) - p32).mean())
    assert err < 0.05, err
