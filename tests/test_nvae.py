"""NVAE parity tests against the actual reference implementation
(/root/reference, imported as an oracle with kornia/CUDA stubbed)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
from gen_adversarial_tpu.models.nvae.distributions import Normal, DiscMixLogistic
from gen_adversarial_tpu.core.torch_convert import convert_nvae

AE_ARGS = {
    "initial_channels": 8,
    "num_pre-post_process_blocks": 1,
    "num_pre-post_process_cells": 2,
    "num_logistic_mixtures": 5,
    "num_scales": 2,
    "min_groups_per_scale": 1,
    "num_groups_per_scale": 2,
    "is_adaptive": True,
    "num_cells_per_group": 1,
    "num_latent_per_group": 4,
    "num_nf_cells": 1,
}


@pytest.fixture(scope="module")
def torch_nvae():
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder
    torch.manual_seed(0)
    ae = AutoEncoder(AE_ARGS, resolution=(3, 32, 32))
    # non-trivial running stats
    for m in ae.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ae.eval()
    return ae


@pytest.fixture(scope="module")
def flax_nvae(torch_nvae):
    cfg = NVAEConfig.from_reference_dict(AE_ARGS, (3, 32, 32))
    sd = {k: v.detach().numpy() for k, v in torch_nvae.state_dict().items()}
    variables = convert_nvae(sd, cfg)
    return NVAE(cfg), jax.tree.map(jnp.asarray, variables), cfg


def test_groups_per_scale_and_param_count(flax_nvae, torch_nvae):
    model, variables, cfg = flax_nvae
    assert cfg.groups_per_scale == torch_nvae.groups_per_scale
    n_torch = sum(p.numel() for p in torch_nvae.parameters())
    n_flax = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # torch counts weight_norm as (g, v) pairs: g has one extra scalar per
    # output channel per weight-normed conv; flax folds them.
    assert n_flax <= n_torch


def test_deterministic_reconstruct_parity(flax_nvae, torch_nvae):
    """reconstruct(deterministic=True) is the reference's only fully
    deterministic full-model path (model.py:631-736) - exact parity check."""
    model, variables, cfg = flax_nvae
    x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = torch_nvae.reconstruct(torch.tensor(x), deterministic=True).numpy()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jax.random.PRNGKey(0), True, method=NVAE.reconstruct)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_purify_zero_alphas_equals_det_reconstruct(flax_nvae):
    model, variables, cfg = flax_nvae
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    rec = model.apply(variables, x, jax.random.PRNGKey(0), True, method=NVAE.reconstruct)
    pur = model.apply(variables, x, jax.random.PRNGKey(7),
                      jnp.zeros((cfg.n_latents,)), method=NVAE.purify)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pur), atol=1e-5)


def test_purify_is_stochastic_and_differentiable(flax_nvae):
    model, variables, cfg = flax_nvae
    x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32))
    alphas = jnp.full((cfg.n_latents,), 0.5)
    p1 = model.apply(variables, x, jax.random.PRNGKey(1), alphas, method=NVAE.purify)
    p2 = model.apply(variables, x, jax.random.PRNGKey(2), alphas, method=NVAE.purify)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))

    def loss(x_):
        out = model.apply(variables, x_, jax.random.PRNGKey(1), alphas, method=NVAE.purify)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_forward_kl_parity(flax_nvae, torch_nvae):
    """KL terms of the training forward: compare against the reference with
    sampling noise pinned to zero on both sides (eps=0 -> z = mu)."""
    model, variables, cfg = flax_nvae
    x = np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32)

    # reference forward with eps=0: monkeypatch Normal.sample
    from src.mlvgms_autoencoders.NVAE.modules import distributions as ref_dists
    orig = ref_dists.Normal.sample
    ref_dists.Normal.sample = lambda self: (self.mu, torch.zeros_like(self.mu))
    try:
        with torch.no_grad():
            logits_t, kl_t = torch_nvae(torch.tensor(x))
    finally:
        ref_dists.Normal.sample = orig

    # our forward with the same pinning via a Normal subclass patch
    import gen_adversarial_tpu.models.nvae.model as nvae_model
    orig_j = nvae_model.Normal.sample
    nvae_model.Normal.sample = lambda self, key: (self.mu, jnp.zeros_like(self.mu))
    try:
        logits_j, kl_j = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                     jax.random.PRNGKey(0))
    finally:
        nvae_model.Normal.sample = orig_j

    np.testing.assert_allclose(np.asarray(kl_j), kl_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logits_j).transpose(0, 3, 1, 2),
                               logits_t.numpy(), rtol=1e-3, atol=2e-3)


def test_discmix_logistic_parity(torch_nvae):
    """DiscMixLogistic log_prob/mean vs the reference distribution classes
    on random parameters."""
    load_reference()
    from src.mlvgms_autoencoders.NVAE.modules.distributions import (
        DiscMixLogistic as RefDML)
    rng = np.random.RandomState(4)
    m = 5
    params = rng.randn(2, m * 10, 8, 8).astype(np.float32)
    samples = (rng.rand(2, 3, 8, 8).astype(np.float32) * 2 - 1)

    ref = RefDML(torch.tensor(params), img_channels=3, num_bits=8)
    want_lp = ref.log_prob(torch.tensor(samples)).numpy()          # (B, HW)
    want_mean = ref.mean().numpy()                                  # (B,3,H,W)

    ours = DiscMixLogistic(jnp.asarray(params.transpose(0, 2, 3, 1)))
    got_lp = np.asarray(ours.log_prob(jnp.asarray(samples.transpose(0, 2, 3, 1))))
    got_mean = np.asarray(ours.mean()).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got_lp.reshape(2, -1), want_lp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-5)


def test_normal_kl_closed_form():
    """Residual-normal KL vs the analytic formula."""
    rng = np.random.RandomState(5)
    mu_q = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    ls_q = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.3)
    mu_p = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    ls_p = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.3)
    q = Normal(mu_q, ls_q)
    p = Normal(mu_p, ls_p)
    kl = np.asarray(q.kl(p))
    # analytic KL(N(m1,s1) || N(m2,s2))
    m1, s1, m2, s2 = map(np.asarray, (q.mu, q.sigma, p.mu, p.sigma))
    want = np.log(s2 / s1) + (s1 ** 2 + (m1 - m2) ** 2) / (2 * s2 ** 2) - 0.5
    np.testing.assert_allclose(kl, want, rtol=1e-4, atol=1e-5)


def test_bn_fold_parity(flax_nvae, monkeypatch):
    """GAT_NVAE_BN_FOLD folds the decoder cells' eval-BN affines into the
    adjacent bias-free conv kernels (cells.py ResidualCellDecoder) -
    result-identical at inference by linearity.  The fixture's running
    stats are randomized, so every folded scale/bias is non-trivial."""
    model, variables, cfg = flax_nvae
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3).astype(np.float32))
    alphas = jnp.full((cfg.n_latents,), 0.5)
    key = jax.random.PRNGKey(11)

    monkeypatch.setenv("GAT_NVAE_BN_FOLD", "0")  # explicit: default is ON
    base_pur = model.apply(variables, x, key, alphas, method=NVAE.purify)
    base_rec = model.apply(variables, x, key, True, method=NVAE.reconstruct)

    monkeypatch.setenv("GAT_NVAE_BN_FOLD", "1")
    fold_pur = model.apply(variables, x, key, alphas, method=NVAE.purify)
    fold_rec = model.apply(variables, x, key, True, method=NVAE.reconstruct)

    np.testing.assert_allclose(np.asarray(fold_pur), np.asarray(base_pur),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fold_rec), np.asarray(base_rec),
                               rtol=1e-4, atol=2e-4)

    # the variable tree must be unchanged by the fold path (same params
    # init under the flag)
    v2 = model.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(0))
    assert jax.tree.structure(v2) == jax.tree.structure(variables)

    # training path is unaffected by the flag (fold is eval-only)
    (logits_f, kl_f) = model.apply(v2, x, key, train=True,
                                   mutable=["batch_stats"])[0]
    monkeypatch.delenv("GAT_NVAE_BN_FOLD", raising=False)
    (logits_b, kl_b) = model.apply(v2, x, key, train=True,
                                   mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_b))
