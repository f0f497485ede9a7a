"""Multi-host readiness: a REAL 2-process jax.distributed CPU run of the
eval harness produces the same results as the single-process run.

(The reference's multi-process path: torchrun/mp.spawn + DistributedSampler
+ all_gather, test_defense.py:88-103,239-253.)
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
