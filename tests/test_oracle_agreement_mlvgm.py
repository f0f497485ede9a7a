"""End-to-end results.json agreement with the reference oracle through a
REAL MLVGM defense (extends tests/test_oracle_agreement.py, which covers
the bare-classifier path): a jointly-converted NVAE + VGG defense with all
interpolation alphas at ZERO - the reference's deterministic
reconstruction-only configuration (ours/models.py purify multiplies every
prior sample by alpha, so alpha=0 removes all stochasticity from both
frameworks identically) - run through OUR full harness (batched jitted
DeepFool through purify+classifier, results.json writer) vs the
REFERENCE's per-image attack loop (test_defense.py:123-199 semantics with
its own NVAEDefenseModel.purify / MLVGMDefenseModel.__call__).

DeepFool is deterministic, so per-image minimal-L2 bounds and derived
robust accuracies must agree up to converted-weights numerics."""

import json
from types import MethodType, SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference, load_reference_defenses

N_CLASSES = 4
SIZE = 32
MAX_ITER = 20


@pytest.fixture(scope="module")
def converted_defense():
    """Reference NVAE + VGG pair and the converted JAX defense pytree."""
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder
    from tests.torch_refs import TVVgg, WrappedClassifier, numpy_state_dict
    from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
    from gen_adversarial_tpu.core.torch_convert import convert_nvae, convert_vgg
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.defenses.purify import make_nvae_purify

    ae_args = {
        "initial_channels": 8, "num_pre-post_process_blocks": 1,
        "num_pre-post_process_cells": 2, "num_logistic_mixtures": 5,
        "num_scales": 2, "min_groups_per_scale": 1,
        "num_groups_per_scale": 2, "is_adaptive": True,
        "num_cells_per_group": 1, "num_latent_per_group": 4,
        "num_nf_cells": 1,
    }
    torch.manual_seed(11)
    ae = AutoEncoder(ae_args, resolution=(3, SIZE, SIZE))
    plan = (8, "M", 16, "M", 16, 16, "M", 32, 32, "M", 32, 32, "M")
    clf_t = WrappedClassifier(TVVgg(plan, n_classes=N_CLASSES))
    for m in list(ae.modules()) + list(clf_t.modules()):
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ae.eval(); clf_t.eval()

    cfg = NVAEConfig.from_reference_dict(ae_args, (3, SIZE, SIZE))
    nvae_vars = jax.tree.map(jnp.asarray, convert_nvae(
        {k: v.detach().numpy() for k, v in ae.state_dict().items()}, cfg))
    clf_vars = jax.tree.map(jnp.asarray,
                            convert_vgg(numpy_state_dict(clf_t), plan=plan))

    n_groups = sum(cfg.groups_per_scale)
    defense = MLVGMDefense(
        purify_variables=nvae_vars, classifier_variables=clf_vars,
        alphas=jnp.zeros(n_groups),
        purify_apply=make_nvae_purify(NVAE(cfg), temperature=0.6),
        classifier_apply=make_classifier_apply(
            VGG11BN(n_classes=N_CLASSES, plan=plan)),
        image_size=SIZE, initial_noise_eps=0.0, apply_blur=False,
        normalize_before_purify=False)
    return ae, clf_t, defense, n_groups


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("oracle_mlvgm_ds")
    rng = np.random.RandomState(5)
    for c in range(2):
        d = root / f"cls{c}"
        d.mkdir()
        for i in range(4):
            arr = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return root


def test_results_json_agreement_nvae_defense(converted_defense, dataset_dir,
                                             tmp_path):
    from functools import partial
    from src.attacks.untargeted import DeepFool
    from gen_adversarial_tpu.attacks import deepfool_attack
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.eval.factory import LoadedDefense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    ae, clf_t, defense, n_groups = converted_defense

    loaded = LoadedDefense(
        experiment="ids", defense_type="ours", image_size=SIZE,
        n_classes=N_CLASSES, defense=defense, eot_steps=1, eot_chunk=None,
        attacks={"deepfool": partial(deepfool_attack, num_classes=N_CLASSES,
                                     overshoot=0.02, max_iter=MAX_ITER)})
    results = run_benchmark(loaded, str(dataset_dir), str(tmp_path / "res"),
                            batch_size=4, attack_filter="deepfool",
                            plots=False, log_fn=lambda *a: None)
    written = json.loads((tmp_path / "res" / "results.json").read_text())
    assert written["DeepFool"] == results["DeepFool"]

    # ---- reference oracle: its own defense pipeline + per-image DeepFool
    ref_defs = load_reference_defenses()
    MLVGM = ref_defs.MLVGMDefenseModel
    fake = SimpleNamespace(
        blur_input=False, eps=0.0, preprocess=False, postprocess=False,
        mean=None, std=None, temperature=0.6, autoencoder=ae,
        interpolation_alphas=[0.0] * n_groups,
        classifier=lambda img: clf_t((img - 0.5) / 0.5))
    fake.apply_gaussian_blur = MethodType(MLVGM.apply_gaussian_blur, fake)
    fake.add_gaussian_noise = MethodType(MLVGM.add_gaussian_noise, fake)
    fake.purify = MethodType(ref_defs.NVAEDefenseModel.purify, fake)

    class RefDefense(torch.nn.Module):
        def forward(self, x):
            # the reference's add_gaussian_noise uses .view(), which
            # requires contiguous input; its own harness always passes
            # contiguous tensors (contiguity never changes values)
            return MLVGM.__call__(fake, x.contiguous())

    ref_net = RefDefense().eval()
    ref_attack = DeepFool(num_classes=N_CLASSES, overshoot=0.02,
                          max_iter=MAX_ITER)

    ds = ImageLabelDataset(str(dataset_dir), SIZE)
    clean, bounds = [], []
    for batch in iterate_batches(ds, 4, drop_last=False):
        for i in range(batch["image"].shape[0]):
            x = np.clip(np.asarray(batch["image"][i:i + 1]), 0, 1)
            y = int(batch["label"][i])
            xt = torch.tensor(x.transpose(0, 3, 1, 2))
            with torch.no_grad():
                pred = int(ref_net(xt).argmax())
            clean.append(pred == y)
            s, b, _ = ref_attack(xt, torch.tensor([y]), ref_net)
            bounds.append(float(b) if s else 100.0)

    assert results["Clean"] == pytest.approx(np.mean(clean))
    got = np.asarray(results["DeepFool"])
    want = np.asarray(bounds)
    assert got.shape == want.shape
    # DeepFool iterates to a decision-boundary crossing; converted-weights
    # numerics through the deep purify can flip near-boundary iteration
    # counts, so allow one disagreement in the fail markers and a modest
    # relative band on the agreeing bounds.
    same_fail = (got == 100.0) == (want == 100.0)
    assert same_fail.mean() >= 7 / 8, (got, want)
    ok = (got != 100.0) & (want != 100.0) & same_fail
    assert ok.sum() >= len(got) // 2
    np.testing.assert_allclose(got[ok], want[ok], rtol=0.1, atol=1e-3)

    # the headline derived metric: robust accuracy at an L2 budget
    for eps in (0.25, 0.5, 1.0):
        ra_ours = np.mean((got > eps) | (got == 100.0))
        ra_ref = np.mean((want > eps) | (want == 100.0))
        assert abs(ra_ours - ra_ref) <= 1 / 8, (eps, ra_ours, ra_ref)
