"""Purify functions for the three MLVGM families (reference
ours/models.py:105-132, 160-274, 299-353 in SerezD/gen_adversarial).

Each factory closes over a model + converted variables and returns a pure
(key, x) -> purified function operating in the defense's normalized domain
([-1,1] for the StyleGAN families, [0,1] for NVAE which normalizes
internally).
"""

import jax
import jax.numpy as jnp

from gen_adversarial_tpu.models.e4e.psp import PSP
from gen_adversarial_tpu.models.nvae.model import NVAE
from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
from gen_adversarial_tpu.ops.image import resize_bilinear, adaptive_avg_pool


def _mix_codes(key, model, variables, codes, alphas, noise_std: float):
    """(1-a) * codes + a * style(N(0, std)) per latent layer
    (ours/models.py:116-127 and :331-342)."""
    b, n_codes, d = codes.shape
    noises = noise_std * jax.random.normal(key, (n_codes, b, d), codes.dtype)
    styles = model.apply(variables, noises.reshape(n_codes * b, d),
                         method=type(model).style)
    styles = styles.reshape(n_codes, b, d)
    a = alphas.reshape(-1, 1, 1)
    mixed = (1 - a) * jnp.transpose(codes, (1, 0, 2)) + a * styles
    return jnp.transpose(mixed, (1, 0, 2))


def make_e4e_purify(model: PSP, variables, alphas):
    """E4E defense purify (ours/models.py:105-132): encode -> per-layer mix
    with freshly sampled styles -> decode (fixed noise buffers)."""
    alphas = jnp.asarray(alphas)

    def purify(key, x):
        codes = model.apply(variables, x, method=PSP.encode)
        codes = _mix_codes(key, model, variables, codes, alphas, 1.0)
        return model.apply(variables, codes, method=PSP.decode)

    return purify


def make_trans_purify(model: StyleTransformer, variables, alphas):
    """Style-Transformer defense purify (ours/models.py:299-353): resize 256
    + letterbox crop -> query-token encode -> mix with style(N(0, 0.8)) ->
    decode -> blank letterbox rows -> resize 128."""
    alphas = jnp.asarray(alphas)

    def purify(key, x):
        x = resize_bilinear(x, 256, 256)
        x = x[:, 32:-32, :, :]
        codes = model.apply(variables, x, method=StyleTransformer.encode)
        codes = _mix_codes(key, model, variables, codes, alphas, 0.8)
        images = model.apply(variables, codes, method=StyleTransformer.decode)
        images = images.at[:, :32].set(-1.0)
        images = images.at[:, -32:].set(-1.0)
        return resize_bilinear(images, 128, 128)

    return purify


def make_nvae_purify(model: NVAE, variables, alphas, temperature: float = 0.6):
    """NVAE defense purify (ours/models.py:160-274); operates on [0,1]
    images directly (the NVAE normalizes internally)."""
    alphas = jnp.asarray(alphas)

    def purify(key, x):
        return model.apply(variables, x, key, alphas, temperature,
                           method=NVAE.purify)

    return purify
