"""Multi-host (multi-process) entry and metric gathering.

The reference launches one process per GPU via torchrun/mpirun and detects
rank from env vars (classifier/train.py:334-348), synchronizing with NCCL
all_reduce/all_gather.  The JAX equivalent is one process per HOST:
`jax.distributed.initialize()` wires the hosts together (over DCN between
slices, ICI inside a slice), after which collectives and
`multihost_utils.process_allgather` span all processes.

Evaluation keeps the reference's embarrassingly-parallel structure
(test_defense.py:116,239-253): each process runs its round-robin shard of
the dataset independently and only the final metric lists are gathered,
process-major, exactly like the reference's `all_gather` + `torch.cat`.
"""

import os

import numpy as np
import jax


def maybe_initialize(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize jax.distributed when multi-process is configured.

    Explicit arguments win; otherwise standard env vars are honored
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), and with
    neither, the runtime's automatic discovery (TPU pod / GKE / Slurm) is
    attempted — an undetectable environment exits with an error rather than
    silently duplicating work across workers.  Returns True when a
    multi-process runtime was initialized; False when the (auto-discovered)
    world is a single process (the reference's single-GPU 'debugging mode',
    classifier/train.py:344-348)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # No manual wiring: try the runtime's automatic discovery (TPU pod /
        # GKE / Slurm / MPI cluster environments).  The caller asked for
        # multi-process explicitly (--distributed), so an undetectable
        # environment is an ERROR, not a silent single-process fallback:
        # falling back would make every pod worker train/eval the full
        # dataset independently and race on checkpoints/results.json.
        try:
            jax.distributed.initialize()
        except Exception as e:
            raise SystemExit(
                "--distributed requested but no cluster environment could "
                "be auto-discovered; set JAX_COORDINATOR_ADDRESS / "
                "JAX_NUM_PROCESSES / JAX_PROCESS_ID for manual wiring "
                f"(auto-discovery said: {type(e).__name__}: {e})")
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    return jax.process_count() > 1


def process_shard():
    """(process_index, process_count) for round-robin dataset sharding
    (the DistributedSampler equivalent, test_defense.py:116)."""
    return jax.process_index(), jax.process_count()


def allgather_lists(values: list, n_processes: int | None = None) -> list:
    """Gather a per-process python list of floats across processes,
    concatenated process-major (like the reference's all_gather +
    torch.cat, test_defense.py:239-253).  Handles unequal lengths by
    NaN-padding to the global max.  Identity when single-process."""
    if n_processes is None:
        n_processes = jax.process_count()
    if n_processes <= 1:
        return list(values)
    from jax.experimental import multihost_utils

    local = np.asarray(values, dtype=np.float64)
    # lengths may differ by one between shards
    n = np.zeros((1,), np.int32) + len(local)
    lengths = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_len = int(lengths.max())
    padded = np.full((max_len,), np.nan, np.float64)
    padded[: len(local)] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(n_processes, max_len)
    out: list = []
    for p in range(n_processes):
        out.extend(gathered[p, : int(lengths[p])].tolist())
    return out
