"""Attack-level oracle agreement through the full Style-Transformer
(cars-family) defense pipeline - FGSM through 0.5/0.5 normalize ->
letterbox crop/encode/mix/decode/blank purify -> denormalize -> classifier,
ours vs the reference's own MLVGMDefenseModel.__call__ + FGSM.
alphas=0, eps=0: both pipelines deterministic (see
tests/test_oracle_agreement_e4e.py for the E4E twin)."""

from argparse import Namespace
from types import MethodType, SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference, load_reference_defenses

SIZE = 512   # generator size (fixed 16 query tokens in the encoder)
IMG = 128
N_CLASSES = 4
BOUND = 4.0


@pytest.fixture(scope="module")
def trans_defense():
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_Trans.models.style_transformer import (
        StyleTransformer as RefST)
    from tests.torch_refs import TVResNet, WrappedClassifier
    from gen_adversarial_tpu.core.stylegan_convert import convert_style_transformer
    from gen_adversarial_tpu.core.torch_convert import convert_resnet
    from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
    from gen_adversarial_tpu.models.classifiers import ResNetBackbone
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.defenses.purify import make_trans_purify

    torch.manual_seed(27)
    ref = RefST(Namespace(output_size=SIZE, input_nc=3,
                          start_from_latent_avg=True, learn_in_w=False))
    clf_t = WrappedClassifier(TVResNet((1, 1, 1, 1), n_classes=N_CLASSES))
    for m in list(ref.modules()) + list(clf_t.modules()):
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ref.latent_avg = torch.randn(16, 512)
    ref.eval(); clf_t.eval()

    sd = {f"encoder.module.{k}": v.numpy()
          for k, v in ref.encoder.state_dict().items()}
    sd.update({f"decoder.module.{k}": v.numpy()
               for k, v in ref.decoder.state_dict().items()})
    st_vars = jax.tree.map(jnp.asarray, convert_style_transformer(
        {"state_dict": sd, "latent_avg": ref.latent_avg.numpy()},
        output_size=SIZE))
    clf_vars = jax.tree.map(jnp.asarray, convert_resnet(
        {k: v.detach().numpy() for k, v in clf_t.state_dict().items()},
        layers=(1, 1, 1, 1)))

    fm = ResNetBackbone(n_classes=N_CLASSES, layers=(1, 1, 1, 1),
                        groups=1, base_width=64)
    defense = MLVGMDefense(
        purify_variables=st_vars, classifier_variables=clf_vars,
        alphas=jnp.zeros(16),
        purify_apply=make_trans_purify(StyleTransformer(output_size=SIZE)),
        classifier_apply=make_classifier_apply(fm),
        image_size=IMG, initial_noise_eps=0.0,
        normalize_before_purify=True)
    return ref, clf_t, defense


def test_fgsm_agreement_trans_defense(trans_defense):
    from gen_adversarial_tpu.attacks.fgsm import fgsm_attack
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    load_reference()
    from src.attacks.untargeted import FGSM

    ref_st, clf_t, defense = trans_defense
    b = 2
    x = np.random.RandomState(41).rand(b, IMG, IMG, 3).astype(np.float32)
    x = np.round(x * 255.0) / 255.0     # PNG-like 0/1 mass
    x[0, :4] = 1.0

    net = eot_wrap(defense, eot_steps=1)
    key = jax.random.PRNGKey(0)
    y = np.array(jax.jit(net)(key, jnp.asarray(x)).argmax(1))
    succ, bound, adv = jax.jit(
        lambda k, xx, yy: fgsm_attack(k, net, xx, yy, l2_bound=BOUND)
    )(key, jnp.asarray(x), jnp.asarray(y))

    ref_defs = load_reference_defenses()
    MLVGM = ref_defs.MLVGMDefenseModel
    fake = SimpleNamespace(
        blur_input=False, eps=0.0, preprocess=True, postprocess=True,
        mean=torch.tensor((0.5, 0.5, 0.5)), std=torch.tensor((0.5, 0.5, 0.5)),
        autoencoder=ref_st, interpolation_alphas=[0.0] * 16,
        classifier=lambda img: clf_t((img - 0.5) / 0.5))
    fake.apply_gaussian_blur = MethodType(MLVGM.apply_gaussian_blur, fake)
    fake.add_gaussian_noise = MethodType(MLVGM.add_gaussian_noise, fake)
    fake.purify = MethodType(ref_defs.TransStyleGanDefenseModel.purify, fake)

    class RefDefense(torch.nn.Module):
        def forward(self, xx):
            return MLVGM.__call__(fake, xx.contiguous())

    ref_net = RefDefense().eval()
    ref_attack = FGSM(l2_bound=BOUND)
    for i in range(b):
        xt = torch.tensor(np.ascontiguousarray(x[i:i + 1].transpose(0, 3, 1, 2)))
        s_t, b_t, a_t = ref_attack(xt, torch.tensor([int(y[i])]), ref_net)
        assert bool(succ[i]) == bool(s_t), i
        assert float(bound[i]) == pytest.approx(float(b_t)), i
        diff = np.abs(np.asarray(adv[i]).transpose(2, 0, 1) - a_t[0].numpy())
        # see test_oracle_agreement_e4e.py: sign(grad) may flip a trace
        # fraction of pixels under converted-weights numerics
        assert (diff > 5e-3).mean() < 2e-3, (i, (diff > 5e-3).mean())
        assert np.sqrt((diff ** 2).sum()) < 0.05 * BOUND, (i, diff.max())
