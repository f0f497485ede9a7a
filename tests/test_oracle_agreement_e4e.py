"""Attack-level oracle agreement through the full E4E (gender-family)
defense pipeline: FGSM through blur/noise-preprocessing -> 0.5/0.5
normalize -> pSp purify -> denormalize -> classifier, ours vs the
reference's own MLVGMDefenseModel.__call__ + FGSM.

alphas=0 and eps=0 make both pipelines deterministic (every prior sample
is multiplied by alpha), so success flags, bounds, and adversarial images
must agree up to converted-weights numerics.  Complements
tests/test_oracle_agreement_mlvgm.py (NVAE family, results.json level) and
the per-op purify/attack parity suites."""

from argparse import Namespace
from types import MethodType, SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference, load_reference_defenses

SIZE = 64          # stylegan size -> n_codes = 10; defense images are 256px
IMG = 256
N_CLASSES = 2
BOUND = 2.0


@pytest.fixture(scope="module")
def e4e_defense(tmp_path_factory):
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_E4E.encoding.encoder import Encoder4Editing
    from src.mlvgms_autoencoders.StyleGan_E4E.stylegan2.generator import (
        Generator as RefGen)
    from src.mlvgms_autoencoders.StyleGan_E4E.psp import pSp
    from tests.torch_refs import TVResNet, WrappedClassifier
    from gen_adversarial_tpu.core.stylegan_convert import convert_psp
    from gen_adversarial_tpu.core.torch_convert import convert_resnet
    from gen_adversarial_tpu.models.e4e.psp import PSP
    from gen_adversarial_tpu.models.classifiers import ResNetBackbone
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.defenses.purify import make_e4e_purify

    torch.manual_seed(21)
    enc = Encoder4Editing(50, "ir_se", Namespace(stylegan_size=SIZE))
    gen = RefGen(SIZE, 512, 8, channel_multiplier=2)
    clf_t = WrappedClassifier(TVResNet((1, 1, 1, 1), n_classes=N_CLASSES))
    for m in list(enc.modules()) + list(clf_t.modules()):
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in gen.state_dict().items()})
    latent_avg = torch.randn(2 * 6 - 2, 512)
    ckpt_path = tmp_path_factory.mktemp("e4e_oracle") / "e4e.pt"
    torch.save({"state_dict": sd, "latent_avg": latent_avg,
                "opts": {"stylegan_size": SIZE}}, ckpt_path)
    ref_psp = pSp(Namespace(stylegan_size=SIZE, encoder_type="Encoder4Editing",
                            checkpoint_path=str(ckpt_path), device="cpu",
                            start_from_latent_avg=True))
    ref_psp.eval(); clf_t.eval()

    np_ckpt = {"state_dict": {k: v.numpy() for k, v in sd.items()},
               "latent_avg": latent_avg.numpy()}
    psp_vars = jax.tree.map(jnp.asarray, convert_psp(np_ckpt, stylegan_size=SIZE))
    clf_vars = jax.tree.map(jnp.asarray, convert_resnet(
        {k: v.detach().numpy() for k, v in clf_t.state_dict().items()},
        layers=(1, 1, 1, 1)))

    n_codes = ref_psp.decoder.n_latent
    fm = ResNetBackbone(n_classes=N_CLASSES, layers=(1, 1, 1, 1),
                        groups=1, base_width=64)
    defense = MLVGMDefense(
        purify_variables=psp_vars, classifier_variables=clf_vars,
        alphas=jnp.zeros(n_codes),
        purify_apply=make_e4e_purify(PSP(stylegan_size=SIZE)),
        classifier_apply=make_classifier_apply(fm),
        image_size=IMG, initial_noise_eps=0.0,
        normalize_before_purify=True)
    return ref_psp, clf_t, defense, n_codes


def test_fgsm_agreement_e4e_defense(e4e_defense):
    from gen_adversarial_tpu.attacks.fgsm import fgsm_attack
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    load_reference()
    from src.attacks.untargeted import FGSM

    ref_psp, clf_t, defense, n_codes = e4e_defense
    b = 3
    x = np.random.RandomState(31).rand(b, IMG, IMG, 3).astype(np.float32)
    # quantize like PNG-decoded data (exact-0/1 mass exercises the clamp
    # tie-gradient convention, ops/image.py clamp01)
    x = np.round(x * 255.0) / 255.0
    x[0, :8] = 0.0
    x[1, :8] = 1.0

    # ours: batched jitted FGSM through the EoT-1 wrapped defense
    net = eot_wrap(defense, eot_steps=1)
    key = jax.random.PRNGKey(0)
    y = np.array(jax.jit(net)(key, jnp.asarray(x)).argmax(1))
    y[0] = 1 - y[0]  # one already-misclassified sample (early-exit path)
    succ, bound, adv = jax.jit(
        lambda k, xx, yy: fgsm_attack(k, net, xx, yy, l2_bound=BOUND)
    )(key, jnp.asarray(x), jnp.asarray(y))

    # reference: its own pipeline + per-image FGSM
    ref_defs = load_reference_defenses()
    MLVGM = ref_defs.MLVGMDefenseModel
    fake = SimpleNamespace(
        blur_input=False, eps=0.0, preprocess=True, postprocess=True,
        mean=torch.tensor((0.5, 0.5, 0.5)), std=torch.tensor((0.5, 0.5, 0.5)),
        autoencoder=ref_psp, interpolation_alphas=[0.0] * n_codes,
        classifier=lambda img: clf_t((img - 0.5) / 0.5))
    fake.apply_gaussian_blur = MethodType(MLVGM.apply_gaussian_blur, fake)
    fake.add_gaussian_noise = MethodType(MLVGM.add_gaussian_noise, fake)
    fake.purify = MethodType(ref_defs.E4EStyleGanDefenseModel.purify, fake)

    class RefDefense(torch.nn.Module):
        def forward(self, xx):
            return MLVGM.__call__(fake, xx.contiguous())

    ref_net = RefDefense().eval()
    ref_attack = FGSM(l2_bound=BOUND)
    for i in range(b):
        # ascontiguousarray: the reference FGSM .view()s the leaf's grad,
        # whose layout follows the leaf (torch gradient layout contract)
        xt = torch.tensor(np.ascontiguousarray(x[i:i + 1].transpose(0, 3, 1, 2)))
        s_t, b_t, a_t = ref_attack(xt, torch.tensor([int(y[i])]), ref_net)
        assert bool(succ[i]) == bool(s_t), i
        assert float(bound[i]) == pytest.approx(float(b_t)), i
        a_ours = np.asarray(adv[i]).transpose(2, 0, 1)
        # sign(grad) amplifies near-zero gradient components to +-1, so a
        # handful of pixels may flip under converted-weights numerics; the
        # criterion is agreement of all but a trace fraction of pixels and
        # a negligible L2 gap relative to the attack bound
        diff = np.abs(a_ours - a_t[0].numpy())
        assert (diff > 5e-3).mean() < 1e-3, (i, (diff > 5e-3).mean())
        assert np.sqrt((diff ** 2).sum()) < 0.05 * BOUND, (i, diff.max())
