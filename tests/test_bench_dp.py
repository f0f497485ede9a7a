"""bench.py's data-parallel forward mode: the batch axis shards over the
mesh, the defense replicates, and the timed step runs - validated on the
8-device CPU mesh with a toy NVAE defense (the real flagship is TPU-only)."""

import sys
from pathlib import Path

import jax
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_precision import _small_nvae_defense  # noqa: E402


def test_forward_bench_dp_mesh():
    import bench
    from gen_adversarial_tpu.core.mesh import make_mesh

    defense = _small_nvae_defense()
    mesh = make_mesh()
    assert mesh.size == 8
    v, perf = bench._forward_bench(defense, batch=16, size=16, iters=2,
                                    mesh=mesh)
    assert np.isfinite(v) and v > 0
    assert isinstance(perf, dict)  # MFU fields, when cost analysis is exposed


def test_forward_bench_dp_batch_divisibility():
    import bench
    from gen_adversarial_tpu.core.mesh import make_mesh

    defense = _small_nvae_defense()
    try:
        bench._forward_bench(defense, batch=9, size=16, iters=1,
                             mesh=make_mesh())
        assert False, "expected divisibility assert"
    except AssertionError as e:
        assert "9" in str(e)


def test_apgd_remat_policy_env(monkeypatch):
    import bench

    monkeypatch.delenv("GAT_APGD_REMAT", raising=False)
    assert bench._apgd_remat_policy("bfloat16") == \
        "dots_with_no_batch_dims_saveable"
    assert bench._apgd_remat_policy("float32") is None
    monkeypatch.setenv("GAT_APGD_REMAT", "full")
    assert bench._apgd_remat_policy("bfloat16") is None
    monkeypatch.setenv("GAT_APGD_REMAT", "dots_saveable")
    assert bench._apgd_remat_policy("float32") == "dots_saveable"
