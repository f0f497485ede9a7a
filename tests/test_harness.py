"""End-to-end factory + harness tests on synthetic data with tiny models,
plus the A-VAE full-model conversion parity test."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from tests.reference_oracle import load_reference
from gen_adversarial_tpu.core.checkpoint import save_variables, load_variables


TINY_PLAN = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")


@pytest.fixture()
def tiny_world(tmp_path, monkeypatch):
    """Synthetic 2-class dataset + tiny trained-ish classifier checkpoint +
    patched factory that builds the tiny model."""
    from PIL import Image
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    import gen_adversarial_tpu.eval.factory as factory

    rng = np.random.RandomState(0)
    data_dir = tmp_path / "images"
    for cls in ("a", "b"):
        (data_dir / cls).mkdir(parents=True)
        base = 60 if cls == "a" else 190
        for i in range(6):
            arr = (rng.rand(64, 64, 3) * 40 + base).clip(0, 255).astype(np.uint8)
            Image.fromarray(arr).save(data_dir / cls / f"{i}.png")

    model = VGG11BN(n_classes=100, plan=TINY_PLAN)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    ckpt = tmp_path / "classifier.msgpack"
    save_variables(ckpt, variables, {"model_type": "vgg"})

    monkeypatch.setattr(factory, "make_classifier",
                        lambda t, n: VGG11BN(n_classes=100, plan=TINY_PLAN))
    return data_dir, ckpt, tmp_path


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_variables(tmp_path / "t.msgpack", tree, {"kind": "test"})
    loaded, meta = load_variables(tmp_path / "t.msgpack")
    np.testing.assert_array_equal(loaded["params"]["a"], tree["params"]["a"])
    assert meta["kind"] == "test"


def test_no_defense_benchmark(tiny_world):
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    data_dir, ckpt, tmp = tiny_world
    config = tmp / "no_defense_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\n")

    loaded = load_defense(str(config))
    assert loaded.experiment == "ids" and loaded.defense_type == "base"

    results = run_benchmark(loaded, str(data_dir), str(tmp / "results"),
                            batch_size=4, max_images=4,
                            attack_filter="deepfool", log_fn=lambda s: None)
    assert "Clean" in results and "DeepFool" in results
    assert len(results["DeepFool"]) == 4
    written = json.loads((tmp / "results" / "results.json").read_text())
    assert written["Clean"] == results["Clean"]
    # every distortion is either a positive L2 or the 100.0 failure marker
    assert all(v == 100.0 or v >= 0 for v in written["DeepFool"])
    # qualitative plot dumped for the first batch
    plots = list((tmp / "results" / "plots").glob("*.png"))
    assert plots


def test_benchmark_sharded_over_mesh(tiny_world):
    """Multi-device eval: batch sharded over the 8-device CPU mesh."""
    import jax as _jax
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    data_dir, ckpt, tmp = tiny_world
    config = tmp / "no_defense_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\n")
    loaded = load_defense(str(config))
    results = run_benchmark(loaded, str(data_dir), str(tmp / "results_mesh"),
                            batch_size=8, max_images=8,
                            attack_filter="deepfool", plots=False,
                            log_fn=lambda s: None, n_devices=8)
    assert len(results["DeepFool"]) == 8


def test_ablation_noise_defense_via_factory(tiny_world):
    from gen_adversarial_tpu.eval.factory import load_defense

    data_dir, ckpt, tmp = tiny_world
    config = tmp / "ablation_noise_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\ntype: noise\n")
    loaded = load_defense(str(config), eot_steps=4)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32))
    logits = loaded.net(jax.random.PRNGKey(0), x)
    assert logits.shape == (2, 100)
    purified = loaded.get_purified(jax.random.PRNGKey(1), x)
    assert not np.allclose(np.asarray(purified), np.asarray(x))


def test_avae_full_conversion_parity():
    """Full StyledGenerator inference parity vs the reference, with eps and
    noise pinned on both sides."""
    load_reference()
    from src.defenses.competitors.a_vae.model import StyledGenerator as RefSG
    from gen_adversarial_tpu.models.avae.model import StyledGenerator
    from gen_adversarial_tpu.core.avae_convert import convert_avae

    torch.manual_seed(0)
    ref = RefSG(64).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_avae(sd, 64))
    ours = StyledGenerator(64)

    x = np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    n_prog = 5
    noises = [np.random.RandomState(10 + i).randn(2, 1, 4 * 2 ** i, 4 * 2 ** i)
              .astype(np.float32) for i in range(n_prog)]

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        with torch.no_grad():
            want = ref(torch.tensor(x),
                       noise=[torch.tensor(n) for n in noises],
                       inference=True).numpy()
    finally:
        torch.randn_like = orig_randn_like

    orig_normal = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    try:
        got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jax.random.PRNGKey(0),
                         noise=[jnp.asarray(n.transpose(0, 2, 3, 1)) for n in noises],
                         inference=True)
    finally:
        jax.random.normal = orig_normal

    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


def test_create_adversarial_dataset(tiny_world):
    """FGSM adversarial-set generation (defense passed as a jit argument,
    never a closure): successful bound>0 adversaries land as PNGs in their
    source class folders (reference create_adversarial_dataset.py:91-112).

    The classifier is a differentiable brightness threshold that is CORRECT
    on the clean set (class a dark, class b bright) — an untrained net
    misclassifies everything, FGSM then reports bound-0 successes, and the
    bound>0 filter keeps nothing."""
    from types import SimpleNamespace
    from PIL import Image
    from gen_adversarial_tpu.defenses.base import ClassifierDefense
    from gen_adversarial_tpu.search.grid import create_adversarial_dataset

    data_dir, _, tmp = tiny_world

    def brightness_apply(variables, x):
        m = jnp.mean(x, axis=(1, 2, 3))
        return jnp.stack([variables["w"] * (0.57 - m),
                          variables["w"] * (m - 0.57)], axis=1)

    loaded = SimpleNamespace(
        image_size=64, eot_chunk=None,
        defense=ClassifierDefense(classifier_variables={"w": jnp.float32(20.0)},
                                  classifier_apply=brightness_apply))

    out = tmp / "adv"
    kept = create_adversarial_dataset(loaded, str(data_dir), str(out),
                                      l2_bound=60.0, n_samples=4,
                                      eot_steps=2, batch_size=4,
                                      log_fn=lambda s: None)
    files = sorted(out.rglob("*.png"))
    assert kept == len(files) > 0
    # class folders preserved and adversaries differ from their sources
    for f in files:
        assert f.parent.name in ("a", "b")
        src = data_dir / f.parent.name / f.name
        assert src.exists()
        assert not np.array_equal(np.asarray(Image.open(f)),
                                  np.asarray(Image.open(src)))


def test_benchmark_resume_after_crash(tiny_world):
    """Per-batch progress checkpointing: a run killed mid-eval resumes from
    the first unfinished batch and produces results EXACTLY equal to an
    uninterrupted run (the skipped batches' PRNG splits are replayed, so on
    a stochastic defense any stream drift would change the numbers)."""
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    data_dir, ckpt, tmp = tiny_world
    config = tmp / "ablation_noise_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\ntype: noise\n")
    loaded = load_defense(str(config), eot_steps=2)

    kw = dict(batch_size=2, max_images=6, attack_filter="deepfool",
              plots=False)
    want = run_benchmark(loaded, str(data_dir), str(tmp / "full"),
                         log_fn=lambda s: None, **kw)

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def crashing_log(msg):
        if msg.startswith("[deepfool]"):
            calls["n"] += 1
            if calls["n"] == 2:  # batch 0 checkpointed; die inside batch 1
                raise Boom()

    with pytest.raises(Boom):
        run_benchmark(loaded, str(data_dir), str(tmp / "res"),
                      log_fn=crashing_log, **kw)
    assert (tmp / "res" / "progress_p0.json").exists()

    logs = []
    got = run_benchmark(loaded, str(data_dir), str(tmp / "res"),
                        log_fn=logs.append, **kw)
    assert any(l.startswith("[resume] continuing from image 2") for l in logs)
    # only the two unfinished batches were recomputed
    assert sum(l.startswith("[deepfool]") for l in logs) == 2
    assert not (tmp / "res" / "progress_p0.json").exists()

    assert got["Clean"] == want["Clean"]
    assert got["DeepFool"] == want["DeepFool"]
    full = json.loads((tmp / "full" / "results.json").read_text())
    res = json.loads((tmp / "res" / "results.json").read_text())
    assert full == res


def test_benchmark_resume_rejects_mismatched_setup(tiny_world):
    """A progress file from a different run setup (fingerprint mismatch)
    is ignored, not silently merged."""
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    data_dir, ckpt, tmp = tiny_world
    config = tmp / "no_defense_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\n")
    loaded = load_defense(str(config), eot_steps=2)

    out = tmp / "mismatch"
    out.mkdir()
    (out / "progress_p0.json").write_text(json.dumps(
        {"fingerprint": {"seed": 999}, "n_seen": 4,
         "clean_correct": [True] * 4, "distortions": {"deepfool": [1.0] * 4}}))
    logs = []
    got = run_benchmark(loaded, str(data_dir), str(out), batch_size=2,
                        max_images=4, attack_filter="deepfool", plots=False,
                        log_fn=logs.append)
    assert any("does not match" in l for l in logs)
    assert len(got["DeepFool"]) == 4
    assert sum(l.startswith("[deepfool]") for l in logs) == 2
