"""Exact purify parity vs the reference defense (ours/models.py in
SerezD/gen_adversarial) with injected noise.

The purify op - encode, per-layer (1-a)*code + a*style(noise) mix, decode -
is THE defense of the paper.  Existing tests pin encode/decode parity and
the deterministic alphas=0 path; this one pins the full stochastic purify:
`torch.normal` on the reference side and `jax.random.normal` on ours are
patched to return the SAME noise tensor, making both purifies deterministic
and directly comparable, through the reference's own pSp checkpoint loader.
"""

from argparse import Namespace
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference, load_reference_defenses

SIZE = 64  # stylegan size -> n_codes = 10


@pytest.fixture(scope="module")
def psp_pair(tmp_path_factory):
    """Reference pSp (via its own checkpoint loader, psp.py:39-45) and the
    converted Flax PSP, sharing fabricated weights."""
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_E4E.encoding.encoder import Encoder4Editing
    from src.mlvgms_autoencoders.StyleGan_E4E.stylegan2.generator import (
        Generator as RefGen)
    from src.mlvgms_autoencoders.StyleGan_E4E.psp import pSp

    torch.manual_seed(5)
    enc = Encoder4Editing(50, "ir_se", Namespace(stylegan_size=SIZE))
    gen = RefGen(SIZE, 512, 8, channel_multiplier=2)
    for m in enc.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in gen.state_dict().items()})
    latent_avg = torch.randn(2 * 6 - 2, 512)
    ckpt_path = tmp_path_factory.mktemp("psp") / "e4e.pt"
    ckpt = {"state_dict": sd, "latent_avg": latent_avg,
            "opts": {"stylegan_size": SIZE}}
    torch.save(ckpt, ckpt_path)

    ref = pSp(Namespace(stylegan_size=SIZE, encoder_type="Encoder4Editing",
                        checkpoint_path=str(ckpt_path), device="cpu",
                        start_from_latent_avg=True))
    ref.eval()

    from gen_adversarial_tpu.core.stylegan_convert import convert_psp
    from gen_adversarial_tpu.models.e4e.psp import PSP
    np_ckpt = {"state_dict": {k: v.numpy() for k, v in sd.items()},
               "latent_avg": latent_avg.numpy()}
    variables = jax.tree.map(jnp.asarray, convert_psp(np_ckpt, stylegan_size=SIZE))
    return ref, PSP(stylegan_size=SIZE), variables


def test_e4e_purify_exact(psp_pair, monkeypatch):
    E4EStyleGanDefenseModel = load_reference_defenses().E4EStyleGanDefenseModel
    from gen_adversarial_tpu.defenses.purify import make_e4e_purify

    ref_psp, model, variables = psp_pair
    n_codes = ref_psp.decoder.n_latent
    b = 2
    rng = np.random.RandomState(11)
    x = (rng.rand(b, 3, 256, 256).astype(np.float32) * 2 - 1)
    noise = rng.randn(n_codes, b, 512).astype(np.float32)
    alphas = np.linspace(0.0, 1.0, n_codes).astype(np.float32)

    # reference purify on a minimal self (the method only touches
    # .autoencoder and .interpolation_alphas, ours/models.py:105-132)
    monkeypatch.setattr(
        torch, "normal",
        lambda mean, std, size, device=None: torch.tensor(noise))
    fake_self = SimpleNamespace(autoencoder=ref_psp,
                                interpolation_alphas=list(alphas))
    with torch.no_grad():
        want = E4EStyleGanDefenseModel.purify(fake_self, torch.tensor(x)).numpy()

    # our purify with the same noise (first normal() call of matching shape)
    state = {"first": True}
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if state["first"] and tuple(shape) == noise.shape:
            state["first"] = False
            return jnp.asarray(noise, dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        purify_apply = make_e4e_purify(model)
        got = purify_apply(variables, jnp.asarray(alphas),
                           jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not state["first"], "noise injection never matched"
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=5e-3, atol=5e-3)


def test_trans_purify_exact(monkeypatch):
    """Same injected-noise parity for the Style-Transformer defense purify
    (ours/models.py:299-353): kornia-resize 256 -> letterbox crop ->
    query-token encode -> mix with style(N(0, 0.8)) -> decode -> blank
    letterbox rows -> resize 128."""
    load_reference()
    from argparse import Namespace
    from src.mlvgms_autoencoders.StyleGan_Trans.models.style_transformer import (
        StyleTransformer as RefST)
    TransStyleGanDefenseModel = load_reference_defenses().TransStyleGanDefenseModel
    from gen_adversarial_tpu.core.stylegan_convert import convert_style_transformer
    from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
    from gen_adversarial_tpu.defenses.purify import make_trans_purify

    size = 512  # the reference encoder has a fixed 16 query tokens
    torch.manual_seed(9)
    ref = RefST(Namespace(output_size=size, input_nc=3,
                          start_from_latent_avg=True, learn_in_w=False))
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ref.latent_avg = torch.randn(16, 512)
    ref.eval()

    sd = {f"encoder.module.{k}": v.numpy() for k, v in ref.encoder.state_dict().items()}
    sd.update({f"decoder.module.{k}": v.numpy() for k, v in ref.decoder.state_dict().items()})
    variables = jax.tree.map(jnp.asarray, convert_style_transformer(
        {"state_dict": sd, "latent_avg": ref.latent_avg.numpy()}, output_size=size))

    b, n_codes = 1, 16
    rng = np.random.RandomState(13)
    x = (rng.rand(b, 3, 128, 128).astype(np.float32) * 2 - 1)
    noise = rng.randn(n_codes, b, 512).astype(np.float32)
    alphas = np.linspace(0.0, 0.7, n_codes).astype(np.float32)

    monkeypatch.setattr(
        torch, "normal",
        lambda mean, std, size, device=None: torch.tensor(std * noise))
    fake_self = SimpleNamespace(autoencoder=ref,
                                interpolation_alphas=list(alphas))
    with torch.no_grad():
        want = TransStyleGanDefenseModel.purify(fake_self, torch.tensor(x)).numpy()

    state = {"first": True}
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if state["first"] and tuple(shape) == noise.shape:
            state["first"] = False
            return jnp.asarray(noise, dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        purify_apply = make_trans_purify(StyleTransformer(output_size=size))
        got = purify_apply(variables, jnp.asarray(alphas),
                           jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not state["first"], "noise injection never matched"
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=5e-3, atol=5e-3)


def test_nvae_purify_exact(monkeypatch):
    """Injected-eps parity for the NVAE defense purify (ours/models.py:
    160-274): at every latent group, (1-a)*posterior-mean + a*prior-sample
    (temp 0.6), NF post-interpolation, DiscMixLogistic mean decode.  The
    reference's Normal.sample is patched to record its eps draws; our
    purify replays the same eps sequence, so outputs must match exactly."""
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder
    import src.mlvgms_autoencoders.NVAE.modules.distributions as ref_dists
    NVAEDefenseModel = load_reference_defenses().NVAEDefenseModel
    from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
    from gen_adversarial_tpu.core.torch_convert import convert_nvae

    ae_args = {
        "initial_channels": 8, "num_pre-post_process_blocks": 1,
        "num_pre-post_process_cells": 2, "num_logistic_mixtures": 5,
        "num_scales": 2, "min_groups_per_scale": 1,
        "num_groups_per_scale": 2, "is_adaptive": True,
        "num_cells_per_group": 1, "num_latent_per_group": 4,
        "num_nf_cells": 1,
    }
    torch.manual_seed(2)
    ae = AutoEncoder(ae_args, resolution=(3, 32, 32))
    for m in ae.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ae.eval()

    cfg = NVAEConfig.from_reference_dict(ae_args, (3, 32, 32))
    variables = jax.tree.map(jnp.asarray, convert_nvae(
        {k: v.detach().numpy() for k, v in ae.state_dict().items()}, cfg))

    n_groups = sum(cfg.groups_per_scale)
    alphas = np.linspace(0.1, 0.9, n_groups).astype(np.float32)
    x = np.random.RandomState(17).rand(2, 3, 32, 32).astype(np.float32)

    # reference side: record every eps draw (decode order: z_0, then groups)
    eps_rng = np.random.RandomState(23)
    recorded = []

    def rec_sample(self):
        eps = torch.tensor(eps_rng.standard_normal(
            tuple(self.mu.shape)).astype(np.float32))
        recorded.append(eps.numpy())
        return self.sample_given_eps(eps), eps

    monkeypatch.setattr(ref_dists.Normal, "sample", rec_sample)
    fake_self = SimpleNamespace(autoencoder=ae, temperature=0.6,
                                interpolation_alphas=list(alphas))
    with torch.no_grad():
        want = NVAEDefenseModel.purify(fake_self, torch.tensor(x)).numpy()
    assert len(recorded) == n_groups

    # our side: replay the same eps sequence (NCHW -> NHWC)
    replay = [e.transpose(0, 2, 3, 1) for e in recorded]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if replay and tuple(shape) == replay[0].shape:
            return jnp.asarray(replay.pop(0), dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        model = NVAE(cfg)
        got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jax.random.PRNGKey(0), jnp.asarray(alphas), 0.6,
                          method=NVAE.purify)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not replay, f"{len(replay)} eps draws not consumed"
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=5e-4)


def test_nvae_defense_pipeline_exact(monkeypatch):
    """Exact full-pipeline parity for MLVGMDefenseModel.__call__
    (abstract_models.py:161-193) on the NVAE family: gaussian blur (the
    upstream 2^(sqrt(H)//2)-1 kernel quirk) -> L2-ball gaussian noise ->
    purify (injected eps) -> classifier with 0.5/0.5 normalize.  Both the
    noise draw and every purify eps draw are injected identically, so the
    returned logits must match."""
    from types import MethodType
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder
    import src.mlvgms_autoencoders.NVAE.modules.distributions as ref_dists
    ref_defs = load_reference_defenses()
    from tests.torch_refs import TVVgg, WrappedClassifier, numpy_state_dict
    from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
    from gen_adversarial_tpu.core.torch_convert import convert_nvae, convert_vgg
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.defenses.purify import make_nvae_purify

    ae_args = {
        "initial_channels": 8, "num_pre-post_process_blocks": 1,
        "num_pre-post_process_cells": 2, "num_logistic_mixtures": 5,
        "num_scales": 2, "min_groups_per_scale": 1,
        "num_groups_per_scale": 2, "is_adaptive": True,
        "num_cells_per_group": 1, "num_latent_per_group": 4,
        "num_nf_cells": 1,
    }
    torch.manual_seed(4)
    ae = AutoEncoder(ae_args, resolution=(3, 32, 32))
    plan = (8, "M", 16, "M", 16, 16, "M", 32, 32, "M", 32, 32, "M")
    clf_t = WrappedClassifier(TVVgg(plan, n_classes=5))
    for m in list(ae.modules()) + list(clf_t.modules()):
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ae.eval(); clf_t.eval()

    cfg = NVAEConfig.from_reference_dict(ae_args, (3, 32, 32))
    nvae_vars = jax.tree.map(jnp.asarray, convert_nvae(
        {k: v.detach().numpy() for k, v in ae.state_dict().items()}, cfg))
    clf_vars = jax.tree.map(jnp.asarray,
                            convert_vgg(numpy_state_dict(clf_t), plan=plan))

    n_groups = sum(cfg.groups_per_scale)
    alphas = (np.linspace(0.1, 0.9, n_groups) * 0.7).astype(np.float32)
    eps = 2.0
    b = 2
    rng = np.random.RandomState(29)
    x = rng.rand(b, 3, 32, 32).astype(np.float32)
    input_noise = rng.randn(b, 3, 32, 32).astype(np.float32)

    # ---- reference: minimal self running the real pipeline methods
    MLVGM = ref_defs.MLVGMDefenseModel
    fake = SimpleNamespace(
        blur_input=True, eps=eps, preprocess=False, postprocess=False,
        mean=None, std=None, temperature=0.6, autoencoder=ae,
        interpolation_alphas=list(alphas),
        classifier=lambda img: clf_t((img - 0.5) / 0.5))
    fake.apply_gaussian_blur = MethodType(MLVGM.apply_gaussian_blur, fake)
    fake.add_gaussian_noise = MethodType(MLVGM.add_gaussian_noise, fake)
    fake.purify = MethodType(ref_defs.NVAEDefenseModel.purify, fake)

    monkeypatch.setattr(
        torch.Tensor, "normal_",
        lambda self, mean=0.0, std=1.0: self.copy_(torch.tensor(input_noise)))
    eps_rng = np.random.RandomState(33)
    recorded = []

    def rec_sample(self):
        e = torch.tensor(eps_rng.standard_normal(
            tuple(self.mu.shape)).astype(np.float32))
        recorded.append(e.numpy())
        return self.sample_given_eps(e), e

    monkeypatch.setattr(ref_dists.Normal, "sample", rec_sample)
    with torch.no_grad():
        want = MLVGM.__call__(fake, torch.tensor(x)).numpy()
    assert len(recorded) == n_groups

    # ---- ours: one ordered replay list (noise first, then purify eps)
    replay = [np.transpose(input_noise, (0, 2, 3, 1))] + \
        [e.transpose(0, 2, 3, 1) for e in recorded]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        assert replay and tuple(shape) == replay[0].shape, \
            (tuple(shape), replay[0].shape if replay else None)
        return jnp.asarray(replay.pop(0), dtype)

    defense = MLVGMDefense(
        purify_variables=nvae_vars, classifier_variables=clf_vars,
        alphas=jnp.asarray(alphas),
        purify_apply=make_nvae_purify(NVAE(cfg), temperature=0.6),
        classifier_apply=make_classifier_apply(VGG11BN(n_classes=5, plan=plan)),
        image_size=32, initial_noise_eps=eps, apply_blur=True,
        normalize_before_purify=False)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        got = defense(jax.random.PRNGKey(0),
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not replay
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
