"""Distributional parity for the stochastic attacks (C&W, APGD-CE/DLR,
AutoAttack) vs the reference implementations on an identical network
(VERDICT round 1, item 9).

DeepFool/FAB are deterministic and matched head-to-head in
tests/test_attack_parity.py; C&W and APGD draw random inits, so exact
per-sample parity is undefined.  Here both sides attack the SAME ~100
samples of the same net and must agree on the population statistics:
success rate (within a few samples) and median minimal-L2 (relative band).
Reference: src/attacks/untargeted.py:37-467."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.attacks import cw_attack, apgd_attack, autoattack

D = 4 * 4 * 3
N_CLASSES = 5
N_SAMPLES = 96


@pytest.fixture(scope="module")
def setup():
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
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1) @ Wj + bj

    # N_SAMPLES correctly-classified samples with non-trivial margins
    xs, ys = [], []
    while len(xs) < N_SAMPLES:
        x = rng.rand(1, 3, 4, 4).astype(np.float32) * 0.6 + 0.2
        logits = x.reshape(-1) @ W + b
        y = int(np.argmax(logits))
        margins = sorted(
            (logits[y] - logits[c]) / np.linalg.norm(W[:, y] - W[:, c])
            for c in range(N_CLASSES) if c != y)
        if 0.02 < margins[0] < 1.0:
            xs.append(x)
            ys.append(y)
    x_np = np.concatenate(xs)            # (N, 3, 4, 4) torch layout
    y_np = np.asarray(ys)
    return TorchNet().eval(), jax_net, x_np, y_np


def _run_reference(ref_attack, torch_net, x_np, y_np):
    succ, bounds = [], []
    for i in range(x_np.shape[0]):
        s, b, _ = ref_attack(torch.tensor(x_np[i:i + 1]),
                             torch.tensor([y_np[i]]), torch_net)
        succ.append(bool(s))
        bounds.append(float(b) if s else np.nan)
    return np.asarray(succ), np.asarray(bounds)


def _compare(succ_t, bounds_t, succ_j, bounds_j, rate_tol, median_rtol):
    rate_t, rate_j = succ_t.mean(), succ_j.mean()
    assert abs(rate_t - rate_j) <= rate_tol, (rate_t, rate_j)
    both = succ_t & succ_j
    assert both.sum() >= 0.5 * max(succ_t.sum(), 1)
    med_t = np.median(bounds_t[both])
    med_j = np.median(bounds_j[both])
    assert abs(med_t - med_j) <= median_rtol * max(med_t, 1e-6), (med_t, med_j)


def test_cw_distributional(setup):
    from src.attacks.untargeted import CW
    torch_net, jax_net, x_np, y_np = setup
    torch.manual_seed(0)
    ref = CW(c=1.0, kappa=0.0, steps=64, lr=1e-2, n_restarts=2,
             early_stopping_steps=16)
    succ_t, bounds_t = _run_reference(ref, torch_net, x_np, y_np)

    s_j, b_j, _ = jax.jit(lambda k, x, y: cw_attack(
        k, jax_net, x, y, c=1.0, kappa=0.0, steps=64, lr=1e-2, n_restarts=2,
        early_stopping_steps=16))(
        jax.random.PRNGKey(0),
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), jnp.asarray(y_np))
    succ_j = np.asarray(s_j)
    bounds_j = np.where(succ_j, np.asarray(b_j), np.nan)
    _compare(succ_t, bounds_t, succ_j, bounds_j,
             rate_tol=0.06, median_rtol=0.10)


@pytest.mark.parametrize("ce_loss,max_bound", [(True, 1.0), (False, 2.0)])
def test_apgd_distributional(setup, ce_loss, max_bound):
    from src.attacks.untargeted import APGDAttack
    torch_net, jax_net, x_np, y_np = setup
    torch.manual_seed(0)
    ref = APGDAttack(n_iter=64, rho=0.75, max_bound=max_bound, ce_loss=ce_loss)
    succ_t, bounds_t = _run_reference(ref, torch_net, x_np, y_np)

    s_j, b_j, _ = jax.jit(lambda k, x, y: apgd_attack(
        k, jax_net, x, y, n_iter=64, rho=0.75, max_bound=max_bound,
        ce_loss=ce_loss))(
        jax.random.PRNGKey(1),
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), jnp.asarray(y_np))
    succ_j = np.asarray(s_j)
    bounds_j = np.where(succ_j, np.asarray(b_j), np.nan)
    _compare(succ_t, bounds_t, succ_j, bounds_j,
             rate_tol=0.08, median_rtol=0.15)


def test_autoattack_distributional(setup):
    """Full ensemble (APGD-CE x3 bounds -> APGD-DLR x3 -> FAB-128) with the
    reference's gated escalation; the harness's strongest attack."""
    from src.attacks.untargeted import AutoAttack
    torch_net, jax_net, x_np, y_np = setup
    torch.manual_seed(0)
    n = 48  # the ensemble is ~10 attacks deep; keep the torch loop bounded
    succ_t, bounds_t = _run_reference(AutoAttack(), torch_net,
                                      x_np[:n], y_np[:n])

    s_j, b_j, _ = jax.jit(lambda k, x, y: autoattack(
        k, jax_net, x, y, n_classes=N_CLASSES))(
        jax.random.PRNGKey(2),
        jnp.asarray(x_np[:n].transpose(0, 2, 3, 1)), jnp.asarray(y_np[:n]))
    succ_j = np.asarray(s_j)
    bounds_j = np.where(succ_j, np.asarray(b_j), np.nan)
    _compare(succ_t, bounds_t, succ_j, bounds_j,
             rate_tol=0.08, median_rtol=0.15)
