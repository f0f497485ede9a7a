"""Head-to-head attack parity vs the reference implementations on an
identical network.  DeepFool and FAB are deterministic (no RNG in the
reference's loops), so their minimal-L2 bounds must agree closely; C&W and
APGD draw random inits, so their trajectory tests inject the SAME noise on
both sides (making them deterministic too); distributional checks live in
tests/test_attack_distributional.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.attacks import deepfool_attack, fab_attack

D = 4 * 4 * 3
N_CLASSES = 5


@pytest.fixture(scope="module")
def nets():
    load_reference()
    rng = np.random.RandomState(0)
    W = rng.randn(D, N_CLASSES).astype(np.float32)
    b = rng.randn(N_CLASSES).astype(np.float32) * 0.1

    class TorchNet(torch.nn.Module):
        def forward(self, x):
            flat = x.reshape(x.shape[0], -1)
            return flat @ torch.tensor(W) + torch.tensor(b)

    Wj, bj = jnp.asarray(W), jnp.asarray(b)

    def jax_net(key, x):
        # NHWC -> match torch NCHW flatten ordering
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1) @ Wj + bj

    return TorchNet().eval(), jax_net, W, b


def _sample(nets, seed):
    torch_net, jax_net, W, b = nets
    rng = np.random.RandomState(seed)
    for _ in range(50):
        x = rng.rand(1, 3, 4, 4).astype(np.float32) * 0.6 + 0.2
        logits = x.reshape(-1) @ W + b
        y = int(np.argmax(logits))
        margins = sorted(
            (logits[y] - logits[c]) / np.linalg.norm(W[:, y] - W[:, c])
            for c in range(N_CLASSES) if c != y)
        if 0.05 < margins[0] < 0.5:
            return x, y
    raise RuntimeError


def test_deepfool_bound_parity(nets):
    from src.attacks.untargeted import DeepFool
    torch_net, jax_net, W, b = nets
    ref = DeepFool(num_classes=N_CLASSES, overshoot=0.02, max_iter=50)
    for seed in (1, 2, 3):
        x, y = _sample(nets, seed)
        s_t, b_t, _ = ref(torch.tensor(x), torch.tensor([y]), torch_net)
        s_j, b_j, _ = deepfool_attack(
            jax.random.PRNGKey(0), jax_net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([y]),
            num_classes=N_CLASSES, overshoot=0.02, max_iter=50)
        assert bool(s_j[0]) == bool(s_t)
        if s_t:
            np.testing.assert_allclose(float(b_j[0]), float(b_t), rtol=1e-3)


def test_fab_bound_parity(nets):
    from src.attacks.untargeted import FABAttack
    torch_net, jax_net, W, b = nets
    ref = FABAttack(n_iter=20, alpha_max=0.1, eta=1.05, beta=0.9)
    for seed in (4, 5):
        x, y = _sample(nets, seed)
        s_t, b_t, _ = ref(torch.tensor(x), torch.tensor([y]), torch_net)
        s_j, b_j, _ = fab_attack(
            jax.random.PRNGKey(0), jax_net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([y]),
            n_iter=20, alpha_max=0.1, eta=1.05, beta=0.9)
        assert bool(s_j[0]) == bool(s_t)
        if s_t:
            np.testing.assert_allclose(float(b_j[0]), float(b_t),
                                       rtol=1e-3, atol=1e-4)


def test_cw_trajectory_parity(nets, monkeypatch):
    """Exact-trajectory C&W parity with injected restart noise: the
    reference's only randomness is one randn_like per restart
    (untargeted.py:386-388); with identical noise both sides run the same
    FGSM init, Adam steps, early stopping, and adaptive-c schedule."""
    from src.attacks.untargeted import CW
    from gen_adversarial_tpu.attacks.cw import cw_attack

    torch_net, jax_net, W, b = nets
    B, R = 3, 2
    xs, ys = zip(*[_sample(nets, s) for s in (6, 7, 8)])
    x = np.concatenate(xs, 0)
    y = np.asarray(ys)
    rng = np.random.RandomState(21)
    noise = rng.randn(B, R, 1, 3, 4, 4).astype(np.float32)

    kw = dict(c=1.0, kappa=0.0, steps=25, lr=1e-2, n_restarts=R,
              early_stopping_steps=5)

    # reference: per-image loop; randn_like pops image-major, restart-minor
    seq = [torch.tensor(noise[i, r]) for i in range(B) for r in range(R)]
    monkeypatch.setattr(torch, "randn_like", lambda t: seq.pop(0))
    ref = CW(**{k: v for k, v in kw.items()})
    res_t = [ref(torch.tensor(x[i:i + 1]), torch.tensor([y[i]]), torch_net)
             for i in range(B)]
    assert not seq

    # ours: batched; one (B,H,W,C) normal draw per restart, restart-major
    replay = [np.transpose(noise[:, r, 0], (0, 2, 3, 1)) for r in range(R)]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if replay and tuple(shape) == replay[0].shape:
            return jnp.asarray(replay.pop(0), dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        # disable_jit so the restart lax.scan executes eagerly (per-restart
        # normal() calls reach fake_normal instead of tracing once)
        with jax.disable_jit():
            s_j, b_j, adv_j = cw_attack(
                jax.random.PRNGKey(0), jax_net,
                jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y), **kw)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not replay

    for i, (s_t, b_t, _) in enumerate(res_t):
        assert bool(s_j[i]) == bool(s_t), i
        if s_t:
            np.testing.assert_allclose(float(b_j[i]), float(b_t),
                                       rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("ce", [True, False], ids=["ce", "dlr"])
def test_apgd_trajectory_parity(nets, monkeypatch, ce):
    """Exact-trajectory APGD parity with injected init noise: the
    reference's only randomness is one randn_like at init
    (untargeted.py:133); with identical noise the whole trajectory -
    momentum update, loss-oscillation step-size halving, restart-from-best
    - is deterministic on both sides."""
    from src.attacks.untargeted import APGDAttack
    from gen_adversarial_tpu.attacks.apgd import apgd_attack

    torch_net, jax_net, W, b = nets
    B = 3
    xs, ys = zip(*[_sample(nets, s) for s in (9, 10, 11)])
    x = np.concatenate(xs, 0)
    y = np.asarray(ys)
    rng = np.random.RandomState(31)
    noise = rng.randn(B, 1, 3, 4, 4).astype(np.float32)

    kw = dict(n_iter=30, rho=0.75, max_bound=1.0, ce_loss=ce)

    seq = [torch.tensor(noise[i]) for i in range(B)]
    monkeypatch.setattr(torch, "randn_like", lambda t: seq.pop(0))
    ref = APGDAttack(**kw)
    res_t = [ref(torch.tensor(x[i:i + 1]), torch.tensor([y[i]]), torch_net)
             for i in range(B)]
    assert not seq

    replay = [np.transpose(noise[:, 0], (0, 2, 3, 1))]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if replay and tuple(shape) == replay[0].shape:
            return jnp.asarray(replay.pop(0), dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        s_j, b_j, adv_j = apgd_attack(
            jax.random.PRNGKey(0), jax_net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y), **kw)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not replay

    for i, (s_t, b_t, _) in enumerate(res_t):
        assert bool(s_j[i]) == bool(s_t), i
        np.testing.assert_allclose(float(b_j[i]), float(b_t),
                                   rtol=2e-3, atol=1e-4)


def test_autoattack_trajectory_parity(nets, monkeypatch):
    """Exact-trajectory AutoAttack ensemble parity: the only randomness is
    each APGD stage's init draw; the reference side tags every sub-attack
    call with its stage index so each image consumes exactly the noise our
    batched stage draws use, even though the reference skips escalation
    stages for already-successful images (untargeted.py:287-317 - our
    batched version runs every stage and gates the merge per sample)."""
    from src.attacks.untargeted import AutoAttack as RefAutoAttack
    from gen_adversarial_tpu.attacks.autoattack import autoattack

    torch_net, jax_net, W, b = nets
    B, STAGES = 3, 6
    xs, ys = zip(*[_sample(nets, s) for s in (12, 13, 14)])
    x = np.concatenate(xs, 0)
    y = np.asarray(ys)
    rng = np.random.RandomState(41)
    noise = rng.randn(STAGES, B, 1, 3, 4, 4).astype(np.float32)

    ref = RefAutoAttack()
    cur = {"stage": -1, "img": -1}
    for i, attr in enumerate(["apgd_ce1", "apgd_ce2", "apgd_ce3",
                              "apgd_dlr1", "apgd_dlr2", "apgd_dlr3"]):
        orig = getattr(ref, attr)

        def tagged(img, yy, net, _orig=orig, _i=i):
            cur["stage"] = _i
            return _orig(img, yy, net)

        setattr(ref, attr, tagged)

    monkeypatch.setattr(
        torch, "randn_like",
        lambda t: torch.tensor(noise[cur["stage"], cur["img"]]))

    res_t = []
    for i in range(B):
        cur["img"] = i
        res_t.append(ref(torch.tensor(x[i:i + 1]), torch.tensor([y[i]]),
                         torch_net))

    # ours: six batched APGD stage draws in the same stage order
    replay = [np.transpose(noise[s, :, 0], (0, 2, 3, 1)) for s in range(STAGES)]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        if replay and tuple(shape) == replay[0].shape:
            return jnp.asarray(replay.pop(0), dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        s_j, b_j, adv_j = autoattack(
            jax.random.PRNGKey(0), jax_net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            n_classes=N_CLASSES)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    assert not replay

    for i, (s_t, b_t, _) in enumerate(res_t):
        assert bool(s_j[i]) == bool(s_t), i
        np.testing.assert_allclose(float(b_j[i]), float(b_t),
                                   rtol=3e-3, atol=1e-4)
