"""Parity tests: Flax classifiers vs torch reference structures through the
checkpoint converter (eval mode, converted running stats)."""

import numpy as np
import jax.numpy as jnp
import torch

from tests.torch_refs import TVResNet, TVVgg, WrappedClassifier, numpy_state_dict
from gen_adversarial_tpu.models.classifiers import ResNetBackbone, VGG11BN
from gen_adversarial_tpu.core.torch_convert import convert_resnet, convert_vgg


def _randomize_bn_stats(m):
    for mod in m.modules():
        if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)


def _check(torch_model, flax_model, variables, size, atol=2e-4):
    torch_model.eval()
    x = np.random.RandomState(0).rand(2, 3, size, size).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.tensor(x)).numpy()
    got = flax_model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=atol)


def test_resnet50_parity_small():
    torch.manual_seed(0)
    tm = WrappedClassifier(TVResNet((1, 1, 1, 1), n_classes=4))
    _randomize_bn_stats(tm)
    variables = convert_resnet(numpy_state_dict(tm), layers=(1, 1, 1, 1))
    fm = ResNetBackbone(n_classes=4, layers=(1, 1, 1, 1))
    _check(tm, fm, variables, 64)


def test_resnext_parity_small():
    torch.manual_seed(1)
    tm = WrappedClassifier(TVResNet((1, 1, 1, 1), n_classes=3, groups=8, base_width=4))
    _randomize_bn_stats(tm)
    variables = convert_resnet(numpy_state_dict(tm), layers=(1, 1, 1, 1))
    fm = ResNetBackbone(n_classes=3, layers=(1, 1, 1, 1), groups=8, base_width=4)
    _check(tm, fm, variables, 64)


def test_vgg11bn_parity_small():
    torch.manual_seed(2)
    plan = (8, "M", 16, "M", 16, 16, "M", 32, 32, "M", 32, 32, "M")
    tm = WrappedClassifier(TVVgg(plan, n_classes=5))
    _randomize_bn_stats(tm)
    variables = convert_vgg(numpy_state_dict(tm), plan=plan)
    fm = VGG11BN(n_classes=5, plan=plan)
    _check(tm, fm, variables, 64)


def test_full_resnet50_shapes():
    """Full-size ResNet50 initializes and runs (structure smoke test)."""
    import jax
    fm = ResNetBackbone(n_classes=2)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet50 backbone ~23.5M + projector (2048^2 + 2048*2) ~ 27.7M
    assert 27e6 < n_params < 29e6, n_params
    out = fm.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 2)
