"""Purify apply-functions for the three MLVGM families (reference
ours/models.py:105-132, 160-274, 299-353 in SerezD/gen_adversarial).

Each factory takes only the (static) model definition and returns a pure
`purify_apply(variables, alphas, key, x)` operating in the defense's
normalized domain ([-1,1] for the StyleGAN families, [0,1] for NVAE which
normalizes internally).  Variables and alphas stay jit arguments (see
defenses/base.py).

Every family also exposes a `make_*_purify_split(model)` returning
    encode_apply(variables, x) -> state
    decode_apply(variables, alphas, key, state) -> purified
with purify == decode(encode(x)) by construction: the encode half consumes
no randomness, so an EoT wrapper can run it ONCE per image and share the
state across all stochastic draws (defenses/eot.py) — the reference
recomputes the whole pipeline per EoT repeat (wrappers.py:14-16)."""

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


def _compose(encode_apply, decode_apply):
    def purify_apply(variables, alphas, key, x):
        return decode_apply(variables, alphas, key, encode_apply(variables, x))
    return purify_apply


def make_e4e_purify_split(model: PSP):
    """E4E defense purify (ours/models.py:105-132) as encode/decode halves:
    encode -> per-layer mix with freshly sampled styles -> decode (fixed
    noise buffers)."""

    def encode_apply(variables, x):
        return model.apply(variables, x, method=PSP.encode)

    def decode_apply(variables, alphas, key, codes):
        style_fn = lambda z: model.apply(variables, z, method=PSP.style)
        codes = _mix_codes(key, style_fn, codes, alphas, 1.0)
        return model.apply(variables, codes, method=PSP.decode)

    return encode_apply, decode_apply


def make_e4e_purify(model: PSP):
    """E4E defense purify (ours/models.py:105-132)."""
    return _compose(*make_e4e_purify_split(model))


def make_trans_purify_split(model: StyleTransformer):
    """Style-Transformer defense purify (ours/models.py:299-353) as
    encode/decode halves: resize 256 + letterbox crop -> query-token encode
    | mix with style(N(0, 0.8)) -> decode -> blank letterbox rows ->
    resize 128."""

    def encode_apply(variables, x):
        x = resize_bilinear(x, 256, 256)
        x = x[:, 32:-32, :, :]
        return model.apply(variables, x, method=StyleTransformer.encode)

    def decode_apply(variables, alphas, key, codes):
        style_fn = lambda z: model.apply(variables, z, method=StyleTransformer.style)
        codes = _mix_codes(key, style_fn, codes, alphas, 0.8)
        images = model.apply(variables, codes, method=StyleTransformer.decode)
        images = images.at[:, :32].set(-1.0)
        images = images.at[:, -32:].set(-1.0)
        return resize_bilinear(images, 128, 128)

    return encode_apply, decode_apply


def make_trans_purify(model: StyleTransformer):
    """Style-Transformer defense purify (ours/models.py:299-353)."""
    return _compose(*make_trans_purify_split(model))


def make_nvae_purify_split(model: NVAE, temperature: float = 0.6):
    """NVAE defense purify (ours/models.py:160-274) as encode/decode halves;
    operates on [0,1] images directly (the NVAE normalizes internally).
    state = (feats dict, top feature)."""

    def encode_apply(variables, x):
        return model.apply(variables, x, method=NVAE.purify_encode)

    def decode_apply(variables, alphas, key, state):
        return model.apply(variables, state, key, alphas, temperature,
                           method=NVAE.purify_decode)

    return encode_apply, decode_apply


def make_nvae_purify(model: NVAE, temperature: float = 0.6):
    """NVAE defense purify (ours/models.py:160-274)."""
    return _compose(*make_nvae_purify_split(model, temperature))
