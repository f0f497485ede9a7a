"""Head-to-head attack parity vs the reference implementations on an
identical network.  DeepFool and FAB are deterministic (no RNG in the
reference's loops), so their minimal-L2 bounds must agree closely; C&W and
APGD use random inits and are compared behaviorally elsewhere
(tests/test_attacks.py)."""

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
