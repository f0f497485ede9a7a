"""Purify apply-functions for the three MLVGM families (reference
ours/models.py:105-132, 160-274, 299-353 in SerezD/gen_adversarial).

Each factory takes only the (static) model definition and returns a pure
`purify_apply(variables, alphas, key, x)` operating in the defense's
normalized domain ([-1,1] for the StyleGAN families, [0,1] for NVAE which
normalizes internally).  Variables and alphas stay jit arguments (see
defenses/base.py).
"""

import jax
import jax.numpy as jnp

from gen_adversarial_tpu.models.e4e.psp import PSP
from gen_adversarial_tpu.models.nvae.model import NVAE
from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
from gen_adversarial_tpu.ops.image import resize_bilinear


def _mix_codes(key, style_fn, codes, alphas, noise_std: float):
    """(1-a) * codes + a * style(N(0, std)) per latent layer
    (ours/models.py:116-127 and :331-342)."""
    b, n_codes, d = codes.shape
    noises = noise_std * jax.random.normal(key, (n_codes, b, d), codes.dtype)
    styles = style_fn(noises.reshape(n_codes * b, d)).reshape(n_codes, b, d)
    a = alphas.reshape(-1, 1, 1)
    mixed = (1 - a) * jnp.transpose(codes, (1, 0, 2)) + a * styles
    return jnp.transpose(mixed, (1, 0, 2))


def make_e4e_purify(model: PSP):
    """E4E defense purify (ours/models.py:105-132): encode -> per-layer mix
    with freshly sampled styles -> decode (fixed noise buffers)."""

    def purify_apply(variables, alphas, key, x):
        codes = model.apply(variables, x, method=PSP.encode)
        style_fn = lambda z: model.apply(variables, z, method=PSP.style)
        codes = _mix_codes(key, style_fn, codes, alphas, 1.0)
        return model.apply(variables, codes, method=PSP.decode)

    return purify_apply


def make_trans_purify(model: StyleTransformer):
    """Style-Transformer defense purify (ours/models.py:299-353): resize 256
    + letterbox crop -> query-token encode -> mix with style(N(0, 0.8)) ->
    decode -> blank letterbox rows -> resize 128."""

    def purify_apply(variables, alphas, key, x):
        x = resize_bilinear(x, 256, 256)
        x = x[:, 32:-32, :, :]
        codes = model.apply(variables, x, method=StyleTransformer.encode)
        style_fn = lambda z: model.apply(variables, z, method=StyleTransformer.style)
        codes = _mix_codes(key, style_fn, codes, alphas, 0.8)
        images = model.apply(variables, codes, method=StyleTransformer.decode)
        images = images.at[:, :32].set(-1.0)
        images = images.at[:, -32:].set(-1.0)
        return resize_bilinear(images, 128, 128)

    return purify_apply


def make_nvae_purify(model: NVAE, temperature: float = 0.6):
    """NVAE defense purify (ours/models.py:160-274); operates on [0,1]
    images directly (the NVAE normalizes internally)."""

    def purify_apply(variables, alphas, key, x):
        return model.apply(variables, x, key, alphas, temperature,
                           method=NVAE.purify)

    return purify_apply
