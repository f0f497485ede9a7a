"""Multi-host readiness: REAL 2-process jax.distributed CPU runs of the
eval harness AND the classifier trainer produce the same results as their
single-process runs.

(The reference's multi-process paths: torchrun/mp.spawn + DistributedSampler
+ all_gather for eval, test_defense.py:88-103,239-253; torchrun DDP for
training, classifier/train.py:334-348.)
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_harness import tiny_world, TINY_PLAN  # noqa: F401 (fixture)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_allgather_lists_single_process_identity():
    from gen_adversarial_tpu.core.distributed import allgather_lists
    vals = [1.0, 2.5, 100.0]
    assert allgather_lists(vals, 1) == vals


def test_two_process_run_matches_single_process(tiny_world):  # noqa: F811
    data_dir, ckpt, tmp = tiny_world
    config = tmp / "no_defense_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\n")

    # single-process reference result (in-process; tiny model)
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark
    loaded = load_defense(str(config))
    single = run_benchmark(loaded, str(data_dir), str(tmp / "res_1proc"),
                           batch_size=2, attack_filter="deepfool",
                           plots=False, log_fn=lambda s: None)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_distributed_worker.py", str(port),
             str(pid), "2", str(data_dir), str(config), str(tmp / "res_2proc")],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    two = json.loads((tmp / "res_2proc" / "results.json").read_text())
    assert two["Clean"] == pytest.approx(single["Clean"])
    # gathered order is process-major (like the reference's all_gather+cat),
    # so compare as multisets
    assert sorted(two["DeepFool"]) == pytest.approx(sorted(single["DeepFool"]))
    assert len(two["DeepFool"]) == len(single["DeepFool"])


def test_two_process_training_matches_single_process(tmp_path):
    """REAL 2-process jax.distributed CPU training run: identical epoch
    losses/accuracies across both workers and final params matching the
    single-process trajectory (same global batches: every process walks the
    same shuffled order and takes its contiguous slice).  The multi-host
    equivalent of the reference's torchrun DDP trainer
    (classifier/train.py:334-348)."""
    from PIL import Image

    data_dir = tmp_path / "data"
    rng = np.random.RandomState(5)
    for split, n in (("train", 8), ("validation", 4)):
        for c in range(2):
            d = data_dir / split / f"cls{c}"
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

    # single-process reference trajectory on a TWO-device mesh (same batch
    # sharding as the 2-process run).  Cross-process collectives reduce in a
    # different order than the intra-process ones, so agreement is to fp
    # tolerance; the low lr keeps the short trajectory non-chaotic.
    import gen_adversarial_tpu.train.classifier as tc
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    TINY = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")
    orig = tc.make_classifier
    tc.make_classifier = lambda t, n: VGG11BN(n_classes=n, plan=TINY)
    try:
        from gen_adversarial_tpu.data.datasets import ImageLabelDataset
        tds = ImageLabelDataset(str(data_dir / "train"), 32)
        vds = ImageLabelDataset(str(data_dir / "validation"), 32)
        state, history = tc.fit("vgg", 2, 32, tds, vds, epochs=1, lr=1e-3,
                                batch_size=4, seed=7, n_devices=2,
                                log_fn=lambda s: None)
    finally:
        tc.make_classifier = orig
    want = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(
                jax.device_get(state.params))}

    port = _free_port()
    out_npz = tmp_path / "params_2proc.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_distributed_train_worker.py", str(port),
             str(pid), "2", str(data_dir), str(out_npz)],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # both workers observed the same replicated metrics
    lines0 = [l.split("]")[1] for l in outs[0].splitlines() if "epoch=" in l]
    lines1 = [l.split("]")[1] for l in outs[1].splitlines() if "epoch=" in l]
    assert lines0 and lines0 == lines1, (outs[0], outs[1])

    got = np.load(out_npz)
    assert set(got.files) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=1e-4,
                                   err_msg=k)


def test_two_process_trades_cli_matches_single_process(tmp_path):
    """REAL 2-process run of the TRADES fine-tune CLI (--distributed):
    final fine-tuned params match the single-process trajectory (same
    global batches; the reference's TRADES fine-tuner is the same torchrun
    DDP skeleton, trades/fine_tune_classifier.py:82,239)."""
    from PIL import Image
    import jax.numpy as jnp
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    from gen_adversarial_tpu.core.checkpoint import save_variables, load_variables

    data_dir = tmp_path / "data"
    rng = np.random.RandomState(9)
    for c in range(2):
        d = data_dir / "train" / f"cls{c}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    TINY = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")
    model = VGG11BN(n_classes=2, plan=TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    ckpt = tmp_path / "clf.msgpack"
    save_variables(ckpt, {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}, {})

    def run(pcount: int, out_dir: Path):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "tests/_distributed_trades_worker.py",
                 str(port), str(pid), str(pcount), str(data_dir), str(ckpt),
                 str(out_dir)],
                cwd="/root/repo", stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for pid in range(pcount)]
        outs = [p.communicate(timeout=420)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
        got, _ = load_variables(out_dir / "last.msgpack")
        return {jax.tree_util.keystr(k): np.asarray(v)
                for k, v in jax.tree_util.tree_leaves_with_path(got["params"])}

    want = run(1, tmp_path / "out_1proc")
    got = run(2, tmp_path / "out_2proc")
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=1e-4,
                                   err_msg=k)


def test_two_process_two_device_training_matches_four_device(tmp_path):
    """The real pod shape: 2 processes x 2 local devices each (process-major
    4-device global mesh) must reproduce the single-process 4-device
    trajectory.  Exercises make_array_from_process_local_data with local
    slices spanning MULTIPLE shards per process, which the 1-device-per-
    process tests never hit."""
    from PIL import Image

    data_dir = tmp_path / "data"
    rng = np.random.RandomState(11)
    for split, n in (("train", 8), ("validation", 5)):
        for c in range(2):
            d = data_dir / split / f"cls{c}"
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

    # single-process 4-device reference trajectory (also exercises the
    # ragged 5-image validation tail: pad 3 on a 4-device mesh)
    import gen_adversarial_tpu.train.classifier as tc
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    TINY = (4, "M", 8, "M", 8, 8, "M", 8, 8, "M", 8, 8, "M")
    orig = tc.make_classifier
    tc.make_classifier = lambda t, n: VGG11BN(n_classes=n, plan=TINY)
    try:
        from gen_adversarial_tpu.data.datasets import ImageLabelDataset
        tds = ImageLabelDataset(str(data_dir / "train"), 32)
        vds = ImageLabelDataset(str(data_dir / "validation"), 32)
        state, history = tc.fit("vgg", 2, 32, tds, vds, epochs=1, lr=1e-3,
                                batch_size=4, seed=7, n_devices=4,
                                log_fn=lambda s: None)
    finally:
        tc.make_classifier = orig
    want = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(
                jax.device_get(state.params))}

    port = _free_port()
    out_npz = tmp_path / "params_2x2.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_distributed_train_worker.py", str(port),
             str(pid), "2", str(data_dir), str(out_npz), "2"],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    got = np.load(out_npz)
    assert set(got.files) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=1e-4,
                                   err_msg=k)


def test_two_process_eval_with_local_mesh(tiny_world):  # noqa: F811
    """Distributed eval sharding BATCHES over each process's LOCAL devices
    (2 procs x 2 local devices, --distributed --n-devices 2): a global mesh
    would hand process 1 non-addressable devices and crash device_put; the
    results must equal the single-process run."""
    data_dir, ckpt, tmp = tiny_world
    config = tmp / "no_defense_ids.yaml"
    config.write_text(f"classifier_path: {ckpt}\n")

    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark
    loaded = load_defense(str(config))
    single = run_benchmark(loaded, str(data_dir), str(tmp / "res_1p"),
                           batch_size=2, attack_filter="deepfool",
                           plots=False, log_fn=lambda s: None)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_distributed_worker.py", str(port),
             str(pid), "2", str(data_dir), str(config),
             str(tmp / "res_2p_mesh"), "2", "2"],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    two = json.loads((tmp / "res_2p_mesh" / "results.json").read_text())
    assert two["Clean"] == pytest.approx(single["Clean"])
    assert sorted(two["DeepFool"]) == pytest.approx(sorted(single["DeepFool"]))
