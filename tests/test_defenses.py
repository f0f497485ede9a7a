"""Defense-layer tests: pipeline semantics, EoT, ablations, purify
composition with tiny models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.defenses.base import (
    MLVGMDefense, ClassifierDefense, blur_kernel_size, add_l2_gaussian_noise)
from gen_adversarial_tpu.defenses.ablations import (
    GaussianNoiseDefense, GaussianBlurDefense)
from gen_adversarial_tpu.defenses.eot import eot_wrap
from gen_adversarial_tpu.defenses.purify import make_nvae_purify, make_e4e_purify
from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig


def test_blur_kernel_formula():
    """abstract_models.py:150-156 effective kernel sizes (SURVEY.md 7)."""
    assert blur_kernel_size(64) == 15
    assert blur_kernel_size(128) == 31
    assert blur_kernel_size(256) == 255


def test_l2_noise_norm():
    key = jax.random.PRNGKey(0)
    x = jnp.full((3, 8, 8, 3), 0.5)
    out = add_l2_gaussian_noise(key, x, eps=2.0)
    # pre-clip norm is exactly eps; after clipping at [0,1] it can shrink
    noise = out - x
    norms = np.sqrt(np.sum(np.asarray(noise) ** 2, axis=(1, 2, 3)))
    assert np.all(norms <= 2.0 + 1e-4) and np.all(norms > 0.5)


def _linear_classifier(n_classes=4, d=8 * 8 * 3, seed=0):
    """(variables, apply) pair for the pytree-defense API."""
    rng = np.random.RandomState(seed)
    W = jnp.asarray(rng.randn(d, n_classes).astype(np.float32))
    return W, (lambda v, x: x.reshape(x.shape[0], -1) @ v)


def test_ablation_defenses():
    w, apply = _linear_classifier()
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32))
    noise_def = GaussianNoiseDefense(w, apply, eps=2.0)
    logits, purified = noise_def(key, x, preds_only=False)
    assert logits.shape == (2, 4)
    assert not np.allclose(np.asarray(purified), np.asarray(x))

    w64, apply64 = _linear_classifier(d=64 * 64 * 3)
    blur_def = GaussianBlurDefense(w64, apply64, image_size=64)
    logits2 = blur_def(key, jnp.asarray(np.random.rand(2, 64, 64, 3).astype(np.float32)))
    assert logits2.shape == (2, 4)


def test_eot_wrap_reduces_variance():
    w, apply = _linear_classifier()
    noise_def = GaussianNoiseDefense(w, apply, eps=1.0)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 3).astype(np.float32))

    single = [np.asarray(noise_def(jax.random.PRNGKey(i), x)) for i in range(8)]
    net = eot_wrap(noise_def, eot_steps=32)
    eot = [np.asarray(net(jax.random.PRNGKey(i), x)) for i in range(8)]
    assert np.mean(np.var(np.stack(eot), axis=0)) < \
        np.mean(np.var(np.stack(single), axis=0)) / 4

    # chunked EoT matches unchunked per-key semantics shape-wise
    net_c = eot_wrap(noise_def, eot_steps=32, chunk=8)
    out = net_c(jax.random.PRNGKey(0), x)
    assert out.shape == (1, 4)


def test_eot_chunk_unroll_parity():
    """Chunked EoT (scan, any unroll factor) is result-identical to the
    unchunked vmap, forward and grad — the unroll knob (GAT_EOT_UNROLL)
    only changes the schedule, never the math (defenses/eot.py)."""
    w, apply = _linear_classifier()
    noise_def = GaussianNoiseDefense(w, apply, eps=1.0)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 8, 8, 3).astype(np.float32))
    key = jax.random.PRNGKey(5)

    ref = np.asarray(eot_wrap(noise_def, eot_steps=8)(key, x))
    g_ref = np.asarray(jax.grad(
        lambda x: jnp.sum(eot_wrap(noise_def, eot_steps=8)(key, x)))(x))
    for unroll in (1, 2, 4):
        net = eot_wrap(noise_def, eot_steps=8, chunk=2, unroll=unroll)
        np.testing.assert_allclose(np.asarray(net(key, x)), ref, atol=1e-6)
        g = np.asarray(jax.grad(lambda x: jnp.sum(net(key, x)))(x))
        np.testing.assert_allclose(g, g_ref, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_nvae():
    cfg = NVAEConfig(resolution=16, initial_channels=4, n_pre_post_blocks=1,
                     n_pre_post_cells=1, num_scales=2, num_groups_per_scale=1,
                     min_groups_per_scale=1, num_cells_per_group=1,
                     num_latent_per_group=2, num_nf_cells=None, num_mixtures=3)
    model = NVAE(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 16, 16, 3)), k))(jax.random.PRNGKey(0))
    return model, variables, cfg


def test_nvae_defense_pipeline(tiny_nvae):
    model, variables, cfg = tiny_nvae
    w, apply = _linear_classifier(d=16 * 16 * 3)
    defense = MLVGMDefense(purify_variables=variables, classifier_variables=w,
                           alphas=jnp.full((cfg.n_latents,), 0.3),
                           purify_apply=make_nvae_purify(model),
                           classifier_apply=apply, image_size=16,
                           initial_noise_eps=0.5, apply_blur=False,
                           normalize_before_purify=False)
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.RandomState(4).rand(2, 16, 16, 3).astype(np.float32))
    logits, purified = defense(key, x, preds_only=False)
    assert logits.shape == (2, 4)
    assert purified.shape == x.shape
    assert float(purified.min()) >= -1e-4 and float(purified.max()) <= 1 + 1e-4

    # stochastic + differentiable end to end
    net = eot_wrap(defense, eot_steps=4)
    g = jax.grad(lambda x_: jnp.sum(net(key, x_) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_remat_policies_exact(tiny_nvae):
    """remat / remat_policy only change the backward's memory schedule;
    values and gradients must agree with the unremat'd defense (up to
    XLA fusion reassociation noise)."""
    model, variables, cfg = tiny_nvae
    w, apply = _linear_classifier(d=16 * 16 * 3)
    base = MLVGMDefense(purify_variables=variables, classifier_variables=w,
                        alphas=jnp.full((cfg.n_latents,), 0.3),
                        purify_apply=make_nvae_purify(model),
                        classifier_apply=apply, image_size=16,
                        normalize_before_purify=False)
    key = jax.random.PRNGKey(5)
    x = jnp.asarray(np.random.RandomState(6).rand(2, 16, 16, 3).astype(np.float32))

    def loss_and_grad(d):
        f = jax.jit(lambda x_: jnp.sum(d(key, x_) ** 2))
        return float(f(x)), np.asarray(jax.jit(jax.grad(
            lambda x_: jnp.sum(d(key, x_) ** 2)))(x))

    v0, g0 = loss_and_grad(base)
    for policy in (None, "dots_saveable"):
        v1, g1 = loss_and_grad(base.replace(remat=True, remat_policy=policy))
        assert v1 == pytest.approx(v0, rel=1e-6)
        np.testing.assert_allclose(g1, g0, rtol=1e-2, atol=1e-5)


def test_classifier_defense():
    w, apply = _linear_classifier()
    d = ClassifierDefense(w, apply)
    x = jnp.asarray(np.random.rand(2, 8, 8, 3).astype(np.float32))
    logits = d(None, x)
    assert logits.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(d.get_purified(None, x)), np.asarray(x))


def test_eot_chunk_validation():
    """chunk >= eot_steps degrades to unchunked; a non-divisor raises."""
    w, apply = _linear_classifier()
    d = GaussianNoiseDefense(w, apply, eps=1.0)
    x = jnp.full((1, 8, 8, 3), 0.5)
    key = jax.random.PRNGKey(0)
    out = eot_wrap(d, eot_steps=1, chunk=8)(key, x)  # factory's forced-1 case
    assert out.shape == (1, 4)
    with pytest.raises(ValueError):
        eot_wrap(d, eot_steps=32, chunk=5)(key, x)


def _split_nvae_defense(tiny_nvae, eps: float):
    from gen_adversarial_tpu.defenses.purify import (
        make_nvae_purify_split, _compose)
    model, variables, cfg = tiny_nvae
    w, apply = _linear_classifier(d=16 * 16 * 3)
    encode_apply, decode_apply = make_nvae_purify_split(model)
    return MLVGMDefense(
        purify_variables=variables, classifier_variables=w,
        alphas=jnp.full((cfg.n_latents,), 0.3),
        purify_apply=_compose(encode_apply, decode_apply),
        purify_encode_apply=encode_apply, purify_decode_apply=decode_apply,
        classifier_apply=apply, image_size=16, initial_noise_eps=eps,
        normalize_before_purify=False)


def test_shared_encode_eot_parity(tiny_nvae):
    """The shared-encode EoT fast path (one encoder pass per image instead
    of one per draw, defenses/eot.py) must be result-identical to the naive
    per-draw recompute: same key splits, same decode ops — values AND
    attack gradients agree."""
    defense = _split_nvae_defense(tiny_nvae, eps=0.0)
    assert defense.supports_shared_encode
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(np.random.RandomState(8).rand(2, 16, 16, 3).astype(np.float32))

    for chunk in (None, 2):
        naive = eot_wrap(defense, eot_steps=4, chunk=chunk, shared_encode=False)
        shared = eot_wrap(defense, eot_steps=4, chunk=chunk, shared_encode=True)
        l_naive = jax.jit(naive)(key, x)
        l_shared = jax.jit(shared)(key, x)
        np.testing.assert_allclose(np.asarray(l_shared), np.asarray(l_naive),
                                   rtol=1e-6, atol=1e-6)
        g_naive = jax.jit(jax.grad(lambda x_: jnp.sum(naive(key, x_) ** 2)))(x)
        g_shared = jax.jit(jax.grad(lambda x_: jnp.sum(shared(key, x_) ** 2)))(x)
        np.testing.assert_allclose(np.asarray(g_shared), np.asarray(g_naive),
                                   rtol=1e-4, atol=1e-6)


def test_shared_encode_disabled_by_input_noise(tiny_nvae):
    """initial_noise_eps > 0 randomizes the encoder input per draw — sharing
    must be off, and the wrapper must fall back to the naive path."""
    defense = _split_nvae_defense(tiny_nvae, eps=0.5)
    assert not defense.supports_shared_encode
    key = jax.random.PRNGKey(9)
    x = jnp.asarray(np.random.RandomState(10).rand(1, 16, 16, 3).astype(np.float32))
    naive = eot_wrap(defense, eot_steps=2, shared_encode=False)
    auto = eot_wrap(defense, eot_steps=2)  # shared_encode=True, but unsupported
    np.testing.assert_array_equal(np.asarray(jax.jit(auto)(key, x)),
                                  np.asarray(jax.jit(naive)(key, x)))


def test_clamp01_matches_torch_gradient():
    """The defense-side clamp must use torch.clamp's INCLUSIVE pass-through
    gradient (1.0 at exact 0/1 ties, where PNG pixels sit en masse);
    jnp.clip would give 0.5 there (ops/image.py clamp01)."""
    import torch
    from gen_adversarial_tpu.ops.image import clamp01

    vals = [-0.5, 0.0, 0.25, 1.0, 1.5]
    g = jax.grad(lambda x: jnp.sum(clamp01(x)))(jnp.asarray(vals))
    xt = torch.tensor(vals, requires_grad=True)
    torch.clamp(xt, 0.0, 1.0).sum().backward()
    np.testing.assert_array_equal(np.asarray(g), xt.grad.numpy())
    np.testing.assert_array_equal(
        np.asarray(clamp01(jnp.asarray(vals))),
        torch.clamp(torch.tensor(vals), 0.0, 1.0).numpy())


def test_mlvgm_preprocess_clamps_at_eps0():
    """abstract_models.py:174 applies add_gaussian_noise unconditionally:
    at eps=0 it degenerates to clamp(0,1), which must still apply to
    out-of-box attack iterates."""
    from gen_adversarial_tpu.defenses.base import MLVGMDefense

    d = MLVGMDefense(
        purify_variables=None, classifier_variables=None,
        alphas=jnp.zeros(1), purify_apply=lambda *a: None,
        classifier_apply=lambda *a: None, image_size=8,
        initial_noise_eps=0.0, normalize_before_purify=False)
    x = jnp.asarray([[-0.2, 0.0, 0.5, 1.0, 1.3]])
    out = d.preprocess(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 0.0, 0.5, 1.0, 1.0]])
