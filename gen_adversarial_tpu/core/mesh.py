"""Device mesh and sharding setup.

The reference's only parallelism is data-parallelism over NCCL
(classifier/train.py:257, test_defense.py:103 in SerezD/gen_adversarial).
On TPU this becomes a 1-D `jax.sharding.Mesh` over the 'data' axis; XLA
inserts the all-reduces (grads) and all-gathers (metrics) that the torch
code issued by hand, and they ride ICI.

All models here fit on one chip (<500M params), so no tensor/pipeline axes
are created; the mesh helper still accepts an arbitrary axis layout for
forward-compatibility.
"""

from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              local: bool = False) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices.

    local=True builds the mesh from this PROCESS's addressable devices
    (for per-process independent work like the eval harness's dataset
    shards); the default spans all global devices (for lockstep training
    where every process participates in one program)."""
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a pytree of host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


@contextmanager
def use_cpu_mesh(n: int = 8):
    """Testing helper: documents the XLA host-platform trick. Tests set
    XLA_FLAGS=--xla_force_host_platform_device_count=N in conftest before
    importing jax; this context manager just builds the mesh."""
    mesh = make_mesh(n)
    with mesh:
        yield mesh
