"""Attack library tests against a linear toy classifier with a closed-form
minimal L2 distortion (distance to the decision hyperplane), plus parity
tests of the attack math helpers vs the reference torch implementations."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from gen_adversarial_tpu.attacks import (
    fgsm_attack, apgd_attack, cw_attack, deepfool_attack, fab_attack,
    autoattack, projection_l2)
from gen_adversarial_tpu.attacks.apgd import dlr_loss

SHAPE = (4, 4, 3)
D = int(np.prod(SHAPE))
N_CLASSES = 4


def make_linear_net(seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    W = rng.randn(D, N_CLASSES).astype(np.float32) * scale
    bvec = rng.randn(N_CLASSES).astype(np.float32) * 0.1
    Wj, bj = jnp.asarray(W), jnp.asarray(bvec)

    def net(key, x):
        return x.reshape(x.shape[0], -1) @ Wj + bj

    return net, W, bvec


def margin_distance(W, bvec, x_flat, y):
    """Minimal L2 distance from x to any decision boundary of the linear net."""
    logits = x_flat @ W + bvec
    dists = []
    for c in range(N_CLASSES):
        if c == y:
            continue
        num = logits[y] - logits[c]
        den = np.linalg.norm(W[:, y] - W[:, c])
        dists.append(num / den)
    return min(dists)


def _correct_sample(net, W, bvec, seed=1):
    """A sample in [0.2, 0.8] classified correctly with a moderate margin."""
    rng = np.random.RandomState(seed)
    for _ in range(100):
        x = rng.rand(*SHAPE).astype(np.float32) * 0.6 + 0.2
        logits = x.reshape(-1) @ W + bvec
        y = int(np.argmax(logits))
        m = margin_distance(W, bvec, x.reshape(-1), y)
        if 0.05 < m < 0.5:
            return x[None], np.array([y], np.int32), m
    raise RuntimeError("no sample found")


def test_projection_l2_matches_torch_reference():
    """Oracle: the reference's projection_l2 (utils.py:22-76), reproduced in
    torch below (test-only)."""

    def torch_projection_l2(t, w, b):
        t, w, b = torch.tensor(t), torch.tensor(w).clone(), torch.tensor(b)
        c = (w * t).sum(dim=1) - b[:, 0]
        ind2 = 2 * (c >= 0) - 1
        w.mul_(ind2.unsqueeze(1))
        c.mul_(ind2)
        r = torch.max(t / w, (t - 1) / w).clamp(min=-1e12, max=1e12)
        r.masked_fill_(w.abs() < 1e-8, 1e12)
        r[r == -1e12] *= -1
        rs, indr = torch.sort(r, dim=1)
        rs2 = torch.nn.functional.pad(rs[:, 1:], (0, 1))
        rs.masked_fill_(rs == 1e12, 0)
        rs2.masked_fill_(rs2 == 1e12, 0)
        w3s = (w ** 2).gather(1, indr)
        w5 = w3s.sum(dim=1, keepdim=True)
        ws = w5 - torch.cumsum(w3s, dim=1)
        d = -(r * w)
        d.mul_((w.abs() > 1e-8).float())
        s = torch.cat((-w5 * rs[:, 0:1],
                       torch.cumsum((-rs2 + rs) * ws, dim=1) - w5 * rs[:, 0:1]), 1)
        c4 = s[:, 0] + c < 0
        c3 = (d * w).sum(dim=1) + c > 0
        c2 = ~(c4 | c3)
        lb = torch.zeros(c2.sum())
        ub = torch.full_like(lb, w.shape[1] - 1)
        nitermax = math.ceil(math.log2(w.shape[1]))
        s_, c_ = s[c2], c[c2]
        for _ in range(nitermax):
            counter4 = torch.floor((lb + ub) / 2)
            counter2 = counter4.long().unsqueeze(1)
            c3_ = s_.gather(1, counter2).squeeze(1) + c_ > 0
            lb = torch.where(c3_, counter4, lb)
            ub = torch.where(c3_, ub, counter4)
        lb = lb.long()
        if c4.any():
            alpha = c[c4] / w5[c4].squeeze(-1)
            d[c4] = -alpha.unsqueeze(-1) * w[c4]
        if c2.any():
            alpha = (s[c2, lb] + c[c2]) / ws[c2, lb] + rs[c2, lb]
            alpha[ws[c2, lb] == 0] = 0
            c5 = (alpha.unsqueeze(-1) > r[c2]).float()
            d[c2] = d[c2] * c5 - alpha.unsqueeze(-1) * w[c2] * (1 - c5)
        return (d * (w.abs() > 1e-8).float()).numpy()

    rng = np.random.RandomState(0)
    for trial in range(5):
        t = rng.rand(6, 20).astype(np.float32)
        w = rng.randn(6, 20).astype(np.float32)
        bb = rng.randn(6, 1).astype(np.float32) * 0.5
        want = torch_projection_l2(t, w, bb)
        got = np.asarray(projection_l2(jnp.asarray(t), jnp.asarray(w), jnp.asarray(bb)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # the projected point satisfies the box constraint
        z = t + got
        assert z.min() >= -1e-5 and z.max() <= 1 + 1e-5


def test_dlr_loss_values():
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0],   # correct pred (label 0)
                          [1.0, 4.0, 2.0, 0.5]])  # wrong pred (label 0)
    labels = jnp.asarray([0, 0])
    out = np.asarray(dlr_loss(logits, labels))
    # row 0: failed attack -> highest wrong = sorted[-2] = 2; num=-(3-2)=-1
    # normalizer: sorted[-3]=1 != 3 -> denom = 3-1=2 -> -0.5
    np.testing.assert_allclose(out[0], -0.5, rtol=1e-6)
    # row 1: success -> highest wrong = 4; num=-(1-4)=3
    # sorted=[0.5,1,2,4]; sorted[-3]=1 == correct(1) -> normalizer=sorted[-4]=0.5
    # denom=4-0.5=3.5 -> 3/3.5
    np.testing.assert_allclose(out[1], 3 / 3.5, rtol=1e-5)
    with pytest.raises(AttributeError):
        dlr_loss(jnp.zeros((1, 3)), jnp.zeros((1,), jnp.int32))


def test_fgsm():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    key = jax.random.PRNGKey(0)
    s, b, adv = fgsm_attack(key, net, jnp.asarray(x), jnp.asarray(y), l2_bound=4.0)
    assert bool(s[0])
    assert float(b[0]) == 4.0
    assert np.asarray(adv).min() >= 0 and np.asarray(adv).max() <= 1
    # early exit: attack the wrong label -> immediately "successful"
    s2, b2, adv2 = fgsm_attack(key, net, jnp.asarray(x), (jnp.asarray(y) + 1) % N_CLASSES, 4.0)
    assert bool(s2[0]) and float(b2[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(adv2), x)


def test_deepfool_near_optimal_on_linear_net():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    s, b, adv = deepfool_attack(jax.random.PRNGKey(0), net, jnp.asarray(x),
                                jnp.asarray(y), num_classes=N_CLASSES,
                                overshoot=0.02, max_iter=50)
    assert bool(s[0])
    # on a linear net DeepFool converges in ~1 step to ~the margin distance
    assert float(b[0]) == pytest.approx(m * 1.02, rel=0.1)
    pred = np.argmax(np.asarray(net(None, adv))[0])
    assert pred != y[0]

    # return_iters exposes the realized while_loop trip count: identical
    # results, and a linear net converges well inside the budget
    s4, b4, adv4, iters = deepfool_attack(
        jax.random.PRNGKey(0), net, jnp.asarray(x), jnp.asarray(y),
        num_classes=N_CLASSES, overshoot=0.02, max_iter=50, return_iters=True)
    np.testing.assert_array_equal(np.asarray(adv4), np.asarray(adv))
    assert 1 <= int(iters) < 50


def test_apgd_ce_and_dlr():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    for ce in (True, False):
        s, b, adv = apgd_attack(jax.random.PRNGKey(1), net, jnp.asarray(x),
                                jnp.asarray(y), n_iter=64, rho=0.75,
                                max_bound=1.0, ce_loss=ce)
        assert bool(s[0]), f"ce_loss={ce}"
        assert float(b[0]) <= 1.0 + 1e-4


def test_cw_finds_small_perturbation():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    s, b, adv = cw_attack(jax.random.PRNGKey(2), net, jnp.asarray(x),
                          jnp.asarray(y), c=1.0, kappa=0.0, steps=128,
                          lr=1e-2, n_restarts=2)
    assert bool(s[0])
    assert float(b[0]) < 5 * m  # small-ish; CW is not margin-optimal on toy nets
    pred = np.argmax(np.asarray(net(None, adv))[0])
    assert pred != y[0]


def test_fab_near_minimal():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    s, b, adv = fab_attack(jax.random.PRNGKey(3), net, jnp.asarray(x),
                           jnp.asarray(y), n_iter=32)
    assert bool(s[0])
    assert float(b[0]) == pytest.approx(m, rel=0.2)


def test_autoattack_ensemble():
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    x2 = np.concatenate([x, x])
    y2 = np.array([y[0], (y[0] + 1) % N_CLASSES], np.int32)  # second already wrong
    s, b, adv = autoattack(jax.random.PRNGKey(4), net, jnp.asarray(x2),
                           jnp.asarray(y2), n_classes=N_CLASSES)
    assert bool(s[0]) and bool(s[1])
    # FAB's minimal-norm result should pull the bound near the margin
    assert float(b[0]) <= 1.5 * m
    assert float(b[1]) == 0.0


def test_attacks_with_stochastic_net():
    """Attacks must thread PRNG keys through stochastic defenses."""
    net, W, bvec = make_linear_net()

    def noisy_net(key, x):
        noise = 0.01 * jax.random.normal(key, x.shape, x.dtype) if key is not None else 0
        return net(None, x + noise)

    x, y, m = _correct_sample(net, W, bvec)
    s, b, adv = apgd_attack(jax.random.PRNGKey(5), noisy_net, jnp.asarray(x),
                            jnp.asarray(y), n_iter=16, rho=0.75,
                            max_bound=1.0, ce_loss=True)
    assert adv.shape == x.shape
    s2, b2, _ = deepfool_attack(jax.random.PRNGKey(6), noisy_net, jnp.asarray(x),
                                jnp.asarray(y), num_classes=N_CLASSES, max_iter=20)
    assert b2.shape == (1,)


def test_staged_autoattack_matches_monolithic():
    """The host-gated staged ensemble (per-stage jit + whole-stage skip +
    traced bound) must produce BIT-IDENTICAL results to the monolithic
    autoattack on the same key."""
    from gen_adversarial_tpu.attacks.autoattack import (
        autoattack, make_staged_autoattack)

    rng = np.random.RandomState(3)
    W = jnp.asarray(rng.randn(8 * 8 * 3, 5).astype(np.float32))
    net = lambda key, x: x.reshape(x.shape[0], -1) @ W
    x = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 4))
    key = jax.random.PRNGKey(9)

    mono = jax.jit(lambda k: autoattack(k, net, x, y, n_classes=5))(key)
    staged = make_staged_autoattack(5, lambda d: net)(None, key, x, y)
    np.testing.assert_array_equal(np.asarray(mono[0]), np.asarray(staged[0]))
    np.testing.assert_allclose(np.asarray(mono[1]), np.asarray(staged[1]),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(mono[2]), np.asarray(staged[2]),
                               rtol=0, atol=0)


def test_class_grads_cotangent_chunking_identical():
    """cotangent_chunk is a memory/throughput knob (FAB's 100-cotangent
    backward capped the batch at 2 on a 16G chip): chunked lax.map blocks
    must reproduce the one-wide-vmap gradients, including the padded
    final block and the chunk >= K degenerate case."""
    from gen_adversarial_tpu.attacks.utils import class_grads

    net, W, bvec = make_linear_net()

    def noisy_net(key, x):
        return net(None, x + 0.01 * jax.random.normal(key, x.shape, x.dtype))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, *SHAPE).astype(np.float32))
    key = jax.random.PRNGKey(7)

    logits_ref, grads_ref = class_grads(noisy_net, key, x)
    for chunk in (1, 3, 4, 16):  # 3 pads (4 classes -> blocks of 3+1)
        logits_c, grads_c = class_grads(noisy_net, key, x,
                                        cotangent_chunk=chunk)
        np.testing.assert_allclose(np.asarray(logits_c),
                                   np.asarray(logits_ref), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(grads_c), np.asarray(grads_ref),
                                   rtol=1e-6, atol=1e-7)

    # selected-class variant (DeepFool's top-k order)
    order = jnp.argsort(-logits_ref, axis=1)[:, :3]
    _, g_sel_ref = class_grads(noisy_net, key, x, order)
    _, g_sel_c = class_grads(noisy_net, key, x, order, cotangent_chunk=2)
    np.testing.assert_allclose(np.asarray(g_sel_c), np.asarray(g_sel_ref),
                               rtol=1e-6, atol=1e-7)


def test_fab_deepfool_chunked_trajectories_match():
    """End-to-end: the chunked attacks walk the same trajectory (same keys,
    same linearizations) as the unchunked ones."""
    net, W, bvec = make_linear_net()
    x, y, m = _correct_sample(net, W, bvec)
    x2 = jnp.concatenate([jnp.asarray(x)] * 2)
    y2 = jnp.asarray(np.array([y[0], y[0]], np.int32))

    ref = fab_attack(jax.random.PRNGKey(3), net, x2, y2, n_iter=16)
    chk = fab_attack(jax.random.PRNGKey(3), net, x2, y2, n_iter=16,
                     cotangent_chunk=3)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(chk[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(chk[1]),
                               rtol=1e-5, atol=1e-6)

    ref = deepfool_attack(jax.random.PRNGKey(4), net, x2, y2,
                          num_classes=N_CLASSES, max_iter=16)
    chk = deepfool_attack(jax.random.PRNGKey(4), net, x2, y2,
                          num_classes=N_CLASSES, max_iter=16,
                          cotangent_chunk=2)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(chk[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(chk[1]),
                               rtol=1e-5, atol=1e-6)
