"""StyleGAN2 stack parity tests vs the actual reference implementation
(CUDA ops stubbed with their pure-torch equivalents)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.models.stylegan2.generator import Generator
from gen_adversarial_tpu.models.stylegan2.discriminator import Discriminator
from gen_adversarial_tpu.models.e4e.encoder import Encoder4Editing
from gen_adversarial_tpu.models.style_transformer.encoder import GradualStyleEncoder
from gen_adversarial_tpu.core.stylegan_convert import (
    convert_generator, convert_e4e_encoder, convert_style_transformer_encoder)

SIZE = 64  # small generator: n_latent = 10


@pytest.fixture(scope="module")
def torch_generator():
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_E4E.stylegan2.generator import (
        Generator as RefGenerator)
    torch.manual_seed(0)
    g = RefGenerator(SIZE, 512, 8, channel_multiplier=2)
    g.eval()
    return g


def test_generator_parity_fixed_noise(torch_generator):
    """decode path used by the defense: input_is_latent=True,
    randomize_noise=False (psp.py:109-115)."""
    variables = convert_generator(
        {k: v.detach().numpy() for k, v in torch_generator.state_dict().items()},
        SIZE)
    variables = jax.tree.map(jnp.asarray, variables)
    ours = Generator(SIZE, 512, 8, channel_multiplier=2)

    rng = np.random.RandomState(0)
    codes = rng.randn(2, ours.n_latent, 512).astype(np.float32) * 0.5
    with torch.no_grad():
        want, _ = torch_generator([torch.tensor(codes)], input_is_latent=True,
                                  randomize_noise=False)
    got, _ = ours.apply(variables, [jnp.asarray(codes)], input_is_latent=True,
                        randomize_noise=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), rtol=2e-3, atol=2e-3)


def test_style_mlp_parity(torch_generator):
    variables = jax.tree.map(jnp.asarray, convert_generator(
        {k: v.detach().numpy() for k, v in torch_generator.state_dict().items()},
        SIZE))
    ours = Generator(SIZE, 512, 8)
    z = np.random.RandomState(1).randn(4, 512).astype(np.float32)
    with torch.no_grad():
        want = torch_generator.style(torch.tensor(z)).numpy()
    got = ours.apply(variables, jnp.asarray(z), method=Generator.run_style)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_generator_not_latent_and_truncation(torch_generator):
    variables = jax.tree.map(jnp.asarray, convert_generator(
        {k: v.detach().numpy() for k, v in torch_generator.state_dict().items()},
        SIZE))
    ours = Generator(SIZE, 512, 8)
    z = np.random.RandomState(2).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        trunc = torch_generator.mean_latent(64)
        want, _ = torch_generator([torch.tensor(z)], input_is_latent=False,
                                  randomize_noise=False, truncation=0.7,
                                  truncation_latent=trunc)
    got, _ = ours.apply(variables, [jnp.asarray(z)], input_is_latent=False,
                        randomize_noise=False, truncation=0.7,
                        truncation_latent=jnp.asarray(trunc.numpy()))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), rtol=2e-3, atol=2e-3)


def test_e4e_encoder_parity():
    load_reference()
    from argparse import Namespace
    from src.mlvgms_autoencoders.StyleGan_E4E.encoding.encoder import Encoder4Editing as RefE4E
    torch.manual_seed(1)
    ref = RefE4E(50, "ir_se", Namespace(stylegan_size=SIZE))
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ref.eval()

    variables = jax.tree.map(jnp.asarray, convert_e4e_encoder(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, SIZE))
    ours = Encoder4Editing(SIZE)
    x = np.random.RandomState(3).rand(1, 3, 256, 256).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_style_transformer_encoder_parity():
    load_reference()
    from argparse import Namespace
    from src.mlvgms_autoencoders.StyleGan_Trans.models.encoders.style_transformer_encoders import (
        GradualStyleEncoder as RefGSE)
    torch.manual_seed(2)
    ref = RefGSE(50, "ir_se", Namespace(input_nc=3))
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ref.eval()

    variables = jax.tree.map(jnp.asarray, convert_style_transformer_encoder(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}))
    ours = GradualStyleEncoder(16)
    x = np.random.RandomState(4).rand(1, 3, 256, 256).astype(np.float32) * 2 - 1
    q = np.random.RandomState(5).randn(1, 16, 512).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(q)).numpy()
    got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_discriminator_runs():
    """Structure smoke test (the reference Discriminator is not part of any
    defense path; it exists for GAN training parity)."""
    d = Discriminator(SIZE)
    x = jnp.zeros((4, SIZE, SIZE, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (4, 1)


def test_discriminator_converted_parity():
    """Exact output parity of the converted Discriminator vs the reference
    (Trans model.py:616-674) on a randomly initialized torch instance."""
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_Trans.models.stylegan2.model import (
        Discriminator as RefDiscriminator)
    from gen_adversarial_tpu.core.stylegan_convert import convert_discriminator

    size = 16
    torch.manual_seed(1)
    ref = RefDiscriminator(size)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_discriminator(sd, size)

    x = np.random.RandomState(2).rand(4, 3, size, size).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = Discriminator(size).apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_randomize_noise_requires_key():
    """randomize_noise=True without a key must raise, not silently disable
    noise injection (the torch default draws implicitly)."""
    import pytest
    from gen_adversarial_tpu.models.stylegan2.generator import Generator
    gen = Generator(32, 64, 2)
    z = jnp.zeros((1, 64))
    v = gen.init(jax.random.PRNGKey(0), [z], randomize_noise=False)
    with pytest.raises(ValueError, match="noise_key"):
        gen.apply(v, [z], randomize_noise=True)
    img, _ = gen.apply(v, [z], randomize_noise=True,
                       noise_key=jax.random.PRNGKey(1))
    assert img.shape[1] == 32


def test_randomize_noise_requires_key():
    """randomize_noise=True without a key must raise, not silently disable
    noise injection (the torch default draws implicitly)."""
    import pytest
    from gen_adversarial_tpu.models.stylegan2.generator import Generator
    gen = Generator(32, 64, 2)
    z = jnp.zeros((1, 64))
    v = gen.init(jax.random.PRNGKey(0), [z], randomize_noise=False)
    with pytest.raises(ValueError, match="noise_key"):
        gen.apply(v, [z], randomize_noise=True)
    img, _ = gen.apply(v, [z], randomize_noise=True,
                       noise_key=jax.random.PRNGKey(1))
    assert img.shape[1] == 32
