"""bf16 defense path: casts cleanly and stays numerically close to f32 on
the purify forward (CPU check; throughput use is on TPU).

The promoted fast path is core.precision.defense_astype: weights cast once,
compute in bf16, f32 boundary contract so attack math never degrades.  The
parity tests below guard the benchmarked bf16 configuration (VERDICT round 1
item 3): EoT-logit closeness + prediction agreement + attack-bound closeness
vs the f32 defense on identical weights/keys."""

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.precision import cast_floating, defense_astype
from gen_adversarial_tpu.defenses.base import MLVGMDefense
from gen_adversarial_tpu.defenses.purify import make_nvae_purify
from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig


def _small_nvae_defense(n_classes: int = 8):
    cfg = NVAEConfig(resolution=16, initial_channels=4, n_pre_post_blocks=1,
                     n_pre_post_cells=1, num_scales=2, num_groups_per_scale=2,
                     min_groups_per_scale=1, num_cells_per_group=1,
                     num_latent_per_group=2, num_nf_cells=None, num_mixtures=3)
    model = NVAE(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 16, 16, 3)), k))(jax.random.PRNGKey(0))
    W = jnp.asarray(
        np.random.RandomState(0).randn(16 * 16 * 3, n_classes).astype(np.float32)
        * 0.05)
    alphas = jnp.linspace(0.1, 0.7, cfg.n_latents)
    return MLVGMDefense(
        purify_variables=variables, classifier_variables=W,
        alphas=alphas, purify_apply=make_nvae_purify(model),
        classifier_apply=lambda v, x: x.reshape(x.shape[0], -1) @ v,
        image_size=16, initial_noise_eps=0.5, normalize_before_purify=False)


def test_defense_astype_contract_and_parity():
    """bf16 defense keeps the f32 external contract and agrees with f32 on
    EoT predictions / logits within bf16 tolerance (identical keys)."""
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    defense = _small_nvae_defense()
    d16 = defense_astype(defense)
    assert d16.compute_dtype == jnp.bfloat16
    assert jax.tree.leaves(d16.purify_variables)[0].dtype == jnp.bfloat16

    x = jnp.asarray(np.random.RandomState(1).rand(8, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(3)
    logits32 = jax.jit(lambda d, k, x: eot_wrap(d, 16)(k, x))(defense, key, x)
    logits16 = jax.jit(lambda d, k, x: eot_wrap(d, 16)(k, x))(d16, key, x)
    # contract: bf16 defense still EMITS float32 logits (attack math is f32)
    assert logits16.dtype == jnp.float32
    assert d16.get_purified(key, x).dtype == jnp.float32

    spread = float(jnp.std(logits32))
    err = float(jnp.abs(logits16 - logits32).mean())
    assert err < 0.15 * spread, (err, spread)
    agree = float(jnp.mean(jnp.argmax(logits16, 1) == jnp.argmax(logits32, 1)))
    assert agree >= 0.875, agree  # at most 1/8 prediction flips


def test_bf16_attack_bounds_close_to_f32():
    """The measured quantity of the whole harness - per-image minimal L2
    bounds - matches between the f32 and bf16 defenses (same keys, FGSM:
    one purifier backward, so gradient fidelity is exercised too)."""
    from gen_adversarial_tpu.attacks.fgsm import fgsm_attack
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    defense = _small_nvae_defense()
    d16 = defense_astype(defense)
    x = jnp.asarray(np.random.RandomState(2).rand(6, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(np.arange(6) % 8)
    key = jax.random.PRNGKey(4)

    run = jax.jit(lambda d, k, x, y: fgsm_attack(
        k, eot_wrap(d, 8), x, y, l2_bound=3.0))
    s32, b32, a32 = run(defense, key, x, y)
    s16, b16, a16 = run(d16, key, x, y)
    assert a16.dtype == jnp.float32
    # identical keys, bf16 forward/backward: success flags agree and bounds
    # match where both succeed
    assert float(jnp.mean(s32 == s16)) >= 5 / 6
    both = s32 & s16
    if bool(jnp.any(both)):
        db = jnp.abs(jnp.where(both, b32 - b16, 0.0))
        assert float(db.max()) < 0.3, float(db.max())


def test_bf16_defense_close_to_f32():
    cfg = NVAEConfig(resolution=16, initial_channels=4, n_pre_post_blocks=1,
                     n_pre_post_cells=1, num_scales=2, num_groups_per_scale=1,
                     min_groups_per_scale=1, num_cells_per_group=1,
                     num_latent_per_group=2, num_nf_cells=None, num_mixtures=3)
    model = NVAE(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 16, 16, 3)), k))(jax.random.PRNGKey(0))
    W = jnp.asarray(np.random.RandomState(0).randn(16 * 16 * 3, 4).astype(np.float32))
    defense = MLVGMDefense(purify_variables=variables, classifier_variables=W,
                           alphas=jnp.zeros((cfg.n_latents,)),
                           purify_apply=make_nvae_purify(model),
                           classifier_apply=lambda v, x: x.reshape(x.shape[0], -1) @ v,
                           image_size=16, normalize_before_purify=False)
    d16 = cast_floating(defense)
    assert d16.alphas.dtype == jnp.bfloat16

    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(2)
    p32 = defense.get_purified(key, x)
    p16 = d16.get_purified(key, x.astype(jnp.bfloat16))
    # deterministic path (alphas=0): bf16 decode within coarse tolerance
    err = float(jnp.abs(p16.astype(jnp.float32) - p32).mean())
    assert err < 0.05, err
