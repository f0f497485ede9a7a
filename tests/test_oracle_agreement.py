"""End-to-end robust-accuracy agreement with the reference oracle on a
jointly-converted model (VERDICT round 1, Missing #3: the strongest
available proxy for real-artifact validation, since no pretrained paper
artifacts can enter this environment - see BASELINE.md).

One torch classifier -> converted weights -> OUR full harness
(ClassifierDefense + jitted batched DeepFool + results.json writer) vs the
REFERENCE attack loop (per-image DeepFool exactly as test_defense.py:123-199
runs it, same 0.5/0.5 normalization).  DeepFool is deterministic, so this
checks per-image minimal-L2 bounds and the derived clean/robust accuracies,
not just distributions."""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from tests.torch_refs import TVResNet, WrappedClassifier

N_CLASSES = 4
SIZE = 32


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(3)
    model = WrappedClassifier(TVResNet((1, 1, 1, 1), n_classes=N_CLASSES))
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    model.eval()

    from gen_adversarial_tpu.core.torch_convert import convert_resnet
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_resnet(sd, layers=(1, 1, 1, 1)))
    return model, variables


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("oracle_ds")
    rng = np.random.RandomState(7)
    for c in range(2):
        d = root / f"cls{c}"
        d.mkdir()
        for i in range(6):
            arr = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return root


def test_results_json_agreement(converted, dataset_dir, tmp_path):
    load_reference()
    from src.attacks.untargeted import DeepFool
    from functools import partial
    from gen_adversarial_tpu.attacks import deepfool_attack
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.defenses.base import ClassifierDefense, make_classifier_apply
    from gen_adversarial_tpu.eval.factory import LoadedDefense
    from gen_adversarial_tpu.eval.harness import run_benchmark
    from gen_adversarial_tpu.models.classifiers import ResNetBackbone

    torch_model, variables = converted
    fm = ResNetBackbone(n_classes=N_CLASSES, layers=(1, 1, 1, 1),
                        groups=1, base_width=64)
    defense = ClassifierDefense(variables, make_classifier_apply(fm))

    loaded = LoadedDefense(
        experiment="ids", defense_type="base", image_size=SIZE,
        n_classes=N_CLASSES, defense=defense, eot_steps=1, eot_chunk=None,
        attacks={"deepfool": partial(deepfool_attack, num_classes=N_CLASSES,
                                     overshoot=0.02, max_iter=50)})

    results = run_benchmark(loaded, str(dataset_dir), str(tmp_path / "res"),
                            batch_size=4, attack_filter="deepfool",
                            plots=False, log_fn=lambda *a: None)
    written = json.loads((tmp_path / "res" / "results.json").read_text())
    assert written["DeepFool"] == results["DeepFool"]

    # reference oracle: the same per-image loop test_defense.py runs, same
    # sorted dataset order, same normalization wrapper
    class RefDefense(torch.nn.Module):
        def forward(self, x):
            return torch_model((x - 0.5) / 0.5)

    ref_net = RefDefense().eval()
    ref_attack = DeepFool(num_classes=N_CLASSES, overshoot=0.02, max_iter=50)

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

    # clean accuracy: exact agreement
    assert results["Clean"] == pytest.approx(np.mean(clean))
    # per-image minimal-L2: DeepFool is deterministic; converted-weights
    # numerics allow a small relative band
    got = np.asarray(results["DeepFool"])
    want = np.asarray(bounds)
    assert got.shape == want.shape
    same_fail = (got == 100.0) == (want == 100.0)
    assert same_fail.mean() >= 11 / 12
    ok = (got != 100.0) & (want != 100.0)
    np.testing.assert_allclose(got[ok], want[ok], rtol=0.05, atol=1e-3)

    # the derived headline metric: robust accuracy at any L2 budget eps
    for eps in (0.25, 0.5, 1.0):
        ra_ours = np.mean((got > eps) | (got == 100.0))
        ra_ref = np.mean((want > eps) | (want == 100.0))
        assert abs(ra_ours - ra_ref) <= 1 / 12, (eps, ra_ours, ra_ref)
