"""Scan-over-groups NVAE purify: exact parity with the unrolled flax model
(same variables, same PRNG keys, same alphas)."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
from gen_adversarial_tpu.models.nvae.scanned import (
    stack_for_scan, make_scanned_nvae_purify)


def test_scanned_purify_matches_unrolled():
    cfg = NVAEConfig(resolution=32, initial_channels=8, n_pre_post_blocks=1,
                     n_pre_post_cells=2, num_scales=2, num_groups_per_scale=4,
                     min_groups_per_scale=2, num_cells_per_group=2,
                     num_latent_per_group=4, num_nf_cells=None, num_mixtures=5)
    model = NVAE(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 32, 32, 3)), k))(key)
    # non-trivial running stats so BN eval mode is actually exercised
    rng = np.random.RandomState(0)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(np.float32)),
            variables["batch_stats"]),
    }

    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32))
    alphas = jnp.asarray(np.linspace(0.1, 0.9, cfg.n_latents).astype(np.float32))
    pkey = jax.random.PRNGKey(7)

    want = model.apply(variables, x, pkey, alphas, 0.6, method=NVAE.purify)

    stacked = stack_for_scan(variables, cfg)
    purify = make_scanned_nvae_purify(cfg, temperature=0.6)
    got = purify(stacked, alphas, pkey, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    # and under jit + grad (the attack path)
    g = jax.jit(jax.grad(lambda x_: jnp.sum(purify(stacked, alphas, pkey, x_))))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
