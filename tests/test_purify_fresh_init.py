"""Purify paths work from freshly-initialized variables (not only converted
checkpoints) - guards the init-coverage pitfall where flax only materializes
parameters on executed paths (PSP's decode bypasses the style MLP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gen_adversarial_tpu.defenses.purify import make_e4e_purify, make_trans_purify
from gen_adversarial_tpu.models.e4e.psp import PSP
from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer


@pytest.mark.slow
def test_e4e_purify_from_fresh_init():
    model = PSP(stylegan_size=256)  # small generator for test speed
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 256, 256, 3))
    variables = jax.jit(lambda k, xx: model.init(k, xx, method=PSP.init_all))(key, x)
    purify = make_e4e_purify(model)
    alphas = jnp.full((14,), 0.5)  # 2*log2(256)-2
    out = jax.jit(purify)(variables, alphas, key, x)
    assert out.shape == (1, 256, 256, 3)


@pytest.mark.slow
def test_trans_purify_from_fresh_init():
    model = StyleTransformer(output_size=512)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 192, 256, 3))
    variables = jax.jit(lambda k, xx: model.init(k, xx))(key, x)
    purify = make_trans_purify(model)
    alphas = jnp.full((16,), 0.5)
    xin = jnp.zeros((1, 128, 128, 3))
    out = jax.jit(purify)(variables, alphas, key, xin)
    assert out.shape == (1, 128, 128, 3)
