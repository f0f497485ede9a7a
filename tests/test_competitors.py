"""Competitor (A-VAE, ND-VAE, TRADES) tests: parity vs the reference
oracle, incl. exact defense-wrapper parity for both VAE competitors (the
reference's scattered .cuda() hardcodings are stubbed to identity so the
oracle paths run on CPU; TRADES loss parity lives in
tests/test_trades_parity.py)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.models.avae.model import (
    StyledGenerator, AVAEDiscriminator, AEqualConv2d, FusedUpsample,
    FusedDownsample, blur3)
from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE, NDNormal
from gen_adversarial_tpu.defenses.competitors import (
    AVaeDefense, NDVaeDefense, trades_loss)


def test_avae_equal_conv_parity():
    load_reference()
    from src.defenses.competitors.a_vae.modules import EqualConv2d as RefEC
    torch.manual_seed(0)
    ref = RefEC(6, 10, 3, padding=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # conv.weight_orig (O,I,k,k) -> ours (k,k,I,O)
    params = {"weight": sd["conv.weight_orig"].transpose(2, 3, 1, 0),
              "bias": sd["conv.bias"]}
    x = np.random.RandomState(0).randn(2, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = AEqualConv2d(10, 3, padding=1).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_avae_fused_updown_parity():
    load_reference()
    from src.defenses.competitors.a_vae.modules import (
        FusedUpsample as RefUp, FusedDownsample as RefDown, Blur as RefBlur)
    torch.manual_seed(1)
    x = np.random.RandomState(1).randn(2, 6, 8, 8).astype(np.float32)

    up = RefUp(6, 10, 3, padding=1)
    sd = {k: v.detach().numpy() for k, v in up.state_dict().items()}
    params = {"weight": sd["weight"].transpose(2, 3, 0, 1),  # (I,O,k,k)->(k,k,I,O)
              "bias": sd["bias"]}
    with torch.no_grad():
        want = up(torch.tensor(x)).numpy()
    got = FusedUpsample(10, 3, padding=1).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)

    down = RefDown(6, 10, 3, padding=1)
    sd = {k: v.detach().numpy() for k, v in down.state_dict().items()}
    params = {"weight": sd["weight"].transpose(2, 3, 1, 0),
              "bias": sd["bias"]}
    with torch.no_grad():
        want = down(torch.tensor(x)).numpy()
    got = FusedDownsample(10, 3, padding=1).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)

    blur = RefBlur(6)
    with torch.no_grad():
        want = blur(torch.tensor(x)).numpy()
    got = blur3(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_avae_generator_shapes_and_defense():
    model = StyledGenerator(output_size=64)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    variables = jax.jit(lambda k: model.init(k, x, k))(key)
    out = model.apply(variables, x, key, inference=True)
    assert out.shape == (2, 64, 64, 3)
    m, v, img = model.apply(variables, x, key)
    assert m.shape == (2, 4, 4, 512) and img.shape == (2, 64, 64, 3)

    clf_w = jnp.ones((64 * 64 * 3, 4))
    clf_apply = lambda v, z: z.reshape(z.shape[0], -1) @ v
    defense = AVaeDefense(variables, clf_w, model, clf_apply, kernel_size=2)
    logits, purified = defense(key, jnp.asarray(
        np.random.rand(2, 64, 64, 3).astype(np.float32)), preds_only=False)
    assert logits.shape == (2, 4) and purified.shape == (2, 64, 64, 3)


def test_avae_discriminator_shapes():
    d = AVAEDiscriminator(64)
    x = jnp.zeros((2, 64, 64, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(variables, x).shape == (2, 1)


def _stub_tk():
    """NVAE.py has dead imports (tkinter, turtle, torchvision, matplotlib);
    stub whatever is unavailable."""
    for name in ("tkinter", "turtle"):
        if name not in sys.modules:
            try:
                __import__(name)
            except Exception:
                mod = types.ModuleType(name)
                mod.W = None
                mod.forward = None
                sys.modules[name] = mod
    try:
        import torchvision  # noqa: F401
    except Exception:
        tv = types.ModuleType("torchvision")
        for sub in ("datasets", "transforms", "utils"):
            m = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, m)
            sys.modules[f"torchvision.{sub}"] = m
        sys.modules["torchvision"] = tv
    try:
        import matplotlib.pyplot  # noqa: F401
    except Exception:
        mpl = types.ModuleType("matplotlib")
        plt = types.ModuleType("matplotlib.pyplot")
        mpl.pyplot = plt
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.pyplot"] = plt


@pytest.fixture(scope="module")
def ref_ndvae():
    load_reference()
    _stub_tk()
    from src.defenses.competitors.nd_vae.modules.models.NVAE import Defence_NVAE
    torch.manual_seed(0)
    m = Defence_NVAE(x_channels=3, encoding_channels=4, pre_proc_groups=2,
                     scales=2, groups=1, cells=1, input_dim=32)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.2)
            mod.running_var.uniform_(0.6, 1.5)
    m.eval()
    return m


def test_ndvae_parity_deterministic(ref_ndvae):
    """Pin sampling to z = mu on both sides and compare mixture logits + KL."""
    from gen_adversarial_tpu.core.ndvae_convert import convert_ndvae
    model = DefenceNVAE(x_channels=3, encoding_channels=4, pre_proc_groups=2,
                        scales=2, groups=1, cells=1, input_dim=32)
    sd = {k: v.detach().numpy() for k, v in ref_ndvae.state_dict().items()}
    variables = convert_ndvae(sd, model)
    # the reference's h is a random non-parameter tensor (NVAE.py:490, not in
    # the state dict); copy it for exact parity
    variables["params"]["h"] = ref_ndvae.decoder.h.detach().numpy().transpose(0, 2, 3, 1)

    x = np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32)

    import src.defenses.competitors.nd_vae.modules.models.NVAE as ref_mod
    orig_t = ref_mod.sample_normal_jit
    ref_mod.sample_normal_jit = lambda mu, sigma: (mu, torch.zeros_like(mu))
    try:
        with torch.no_grad():
            want_logits, _, _, want_kl, _ = ref_ndvae(torch.tensor(x))
    finally:
        ref_mod.sample_normal_jit = orig_t

    import gen_adversarial_tpu.models.ndvae.model as nd_mod
    orig_j = nd_mod.NDNormal.sample
    nd_mod.NDNormal.sample = lambda self, key: (self.mu, jnp.zeros_like(self.mu))
    try:
        logits, _, _, kl_all = model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jax.random.PRNGKey(0))
    finally:
        nd_mod.NDNormal.sample = orig_j

    np.testing.assert_allclose(np.asarray(logits).transpose(0, 3, 1, 2),
                               want_logits.numpy(), rtol=2e-3, atol=2e-3)
    for got_k, want_k in zip(kl_all, want_kl):
        np.testing.assert_allclose(np.asarray(got_k), want_k.numpy(),
                                   rtol=2e-3, atol=2e-3)


def test_ndvae_defense_wrapper(ref_ndvae):
    model = DefenceNVAE(x_channels=3, encoding_channels=4, pre_proc_groups=2,
                        scales=2, groups=1, cells=1, input_dim=32)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3)), k))(jax.random.PRNGKey(0))
    clf_w = jnp.ones((32 * 32 * 3, 4))
    clf_apply = lambda v, z: z.reshape(z.shape[0], -1) @ v
    defense = NDVaeDefense(variables, clf_w, model, clf_apply, noise_std=0.1)
    x = jnp.asarray(np.random.rand(2, 32, 32, 3).astype(np.float32))
    logits, purified = defense(jax.random.PRNGKey(1), x, preds_only=False)
    assert logits.shape == (2, 4)
    # the ND-VAE's own DiscMixLogistic.mean maps to [0,1] (NVAE_utils.py:248)
    assert float(purified.min()) >= 0.0 and float(purified.max()) <= 1.0


def test_trades_loss_behavior():
    """No CPU-runnable reference (hardcoded .cuda()); check the math
    properties instead: perturbation respects the L2 ball and the robust
    term increases the loss."""
    rng = np.random.RandomState(5)
    W = jnp.asarray(rng.randn(48, 4).astype(np.float32))
    model_fn = lambda x: x.reshape(x.shape[0], -1) @ W
    x = jnp.asarray(rng.rand(4, 4, 4, 3).astype(np.float32))
    y = jnp.argmax(model_fn(x), axis=1)
    key = jax.random.PRNGKey(0)

    from gen_adversarial_tpu.defenses.competitors import trades_inner_l2
    x_adv = trades_inner_l2(model_fn, key, x, epsilon=0.5, perturb_steps=8)
    deltas = np.asarray(x_adv - x).reshape(4, -1)
    assert np.all(np.linalg.norm(deltas, axis=1) <= 0.5 + 1e-4)

    loss_b0 = trades_loss(model_fn, key, x, y, beta=0.0, distance="l_2",
                          epsilon=0.5, perturb_steps=4)
    loss_b8 = trades_loss(model_fn, key, x, y, beta=8.0, distance="l_2",
                          epsilon=0.5, perturb_steps=4)
    assert float(loss_b8) >= float(loss_b0)


def test_ndvae_defense_wrapper_exact(ref_ndvae, monkeypatch):
    """Exact NDVaeDefenseModel parity (purification_model.py:8-31) vs the
    reference wrapper itself: injected input noise, z = mu pinned on both
    sides, matched linear classifier.  Seals the wrapper arithmetic -
    noise_std scaling, clamp, DiscMixLogistic mean, and the
    un-denormalized-[-1,1]-input classifier quirk."""
    from src.defenses.competitors.nd_vae.purification_model import (
        NDVaeDefenseModel as RefWrapper)
    import src.defenses.competitors.nd_vae.modules.models.NVAE as ref_mod
    import gen_adversarial_tpu.models.ndvae.model as nd_mod
    from gen_adversarial_tpu.core.ndvae_convert import convert_ndvae

    model = DefenceNVAE(x_channels=3, encoding_channels=4, pre_proc_groups=2,
                        scales=2, groups=1, cells=1, input_dim=32)
    sd = {k: v.detach().numpy() for k, v in ref_ndvae.state_dict().items()}
    variables = convert_ndvae(sd, model)
    variables["params"]["h"] = ref_ndvae.decoder.h.detach().numpy().transpose(0, 2, 3, 1)

    rng = np.random.RandomState(19)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    input_noise = rng.randn(2, 3, 32, 32).astype(np.float32)
    noise_std = 0.25

    W = rng.randn(32 * 32 * 3, 4).astype(np.float32)

    class TorchClf(torch.nn.Module):
        def forward(self, img):
            return img.reshape(img.shape[0], -1) @ torch.tensor(W)

    monkeypatch.setattr(torch, "randn_like",
                        lambda t: torch.tensor(input_noise))
    monkeypatch.setattr(ref_mod, "sample_normal_jit",
                        lambda mu, sigma: (mu, torch.zeros_like(mu)))
    ref_def = RefWrapper(TorchClf(), ref_ndvae, noise_std)
    with torch.no_grad():
        want = ref_def(torch.tensor(x)).numpy()

    # ours: same classifier over the NCHW flatten ordering
    Wj = jnp.asarray(W)

    def clf_apply(v, z):
        return jnp.transpose(z, (0, 3, 1, 2)).reshape(z.shape[0], -1) @ Wj

    real_normal = jax.random.normal
    state = {"first": True}

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if state["first"] and tuple(shape) == (2, 32, 32, 3):
            state["first"] = False
            return jnp.asarray(input_noise.transpose(0, 2, 3, 1), dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    monkeypatch.setattr(nd_mod.NDNormal, "sample",
                        lambda self, key: (self.mu, jnp.zeros_like(self.mu)))
    try:
        defense = NDVaeDefense(variables, None, model, clf_apply,
                               noise_std=noise_std)
        got = defense(jax.random.PRNGKey(0),
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not state["first"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_avae_defense_wrapper_exact(monkeypatch):
    """Exact AVaeDefenseModel parity (a_vae/purification_model.py) vs the
    reference wrapper itself, with all sampling pinned to zero on both
    sides: avg_pool downsampling, the [0,1]<->[-1,1] transforms, generator
    inference, and a matched linear classifier.  The reference file uses
    `torch.Tensor` annotations without importing torch (documented upstream
    bug, SURVEY.md 7), shimmed via builtins for the import."""
    import builtins
    import importlib
    load_reference()
    had = hasattr(builtins, "torch")
    builtins.torch = torch
    try:
        ref_wrap_mod = importlib.import_module(
            "src.defenses.competitors.a_vae.purification_model")
    finally:
        if not had:
            del builtins.torch
    from src.defenses.competitors.a_vae.model import StyledGenerator as RefSG
    from gen_adversarial_tpu.models.avae.model import StyledGenerator
    from gen_adversarial_tpu.core.avae_convert import convert_avae

    torch.manual_seed(3)
    ref_gen = RefSG(64).eval()
    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_avae(sd, 64))

    rng = np.random.RandomState(37)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    W = rng.randn(64 * 64 * 3, 4).astype(np.float32)

    class TorchClf(torch.nn.Module):
        def forward(self, img):
            return img.reshape(img.shape[0], -1) @ torch.tensor(W)

    monkeypatch.setattr(torch, "randn_like",
                        lambda t, **kw: torch.zeros_like(t))
    monkeypatch.setattr(torch, "randn",
                        lambda *a, **kw: torch.zeros(*a))
    # the generator's noise path hardcodes .cuda() (a_vae/model.py:134)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **kw: self)
    ref_def = ref_wrap_mod.AVaeDefenseModel(TorchClf(), ref_gen, kernel_size=2)
    with torch.no_grad():
        want = ref_def(torch.tensor(x)).numpy()

    Wj = jnp.asarray(W)

    def clf_apply(v, z):
        return jnp.transpose(z, (0, 3, 1, 2)).reshape(z.shape[0], -1) @ Wj

    real_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    try:
        defense = AVaeDefense(variables, None, StyledGenerator(64), clf_apply,
                              kernel_size=2)
        got = defense(jax.random.PRNGKey(0),
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
