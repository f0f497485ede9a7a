"""Checkpoint IO for converted models.

Converted checkpoints are stored as flax msgpack files (+ a small JSON
meta); tools/convert_checkpoints.py produces them from the reference's
torch artifacts (loading_utils.py formats).  Training code can also use
orbax for async checkpointing of full train states.
"""

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def save_variables(path: str | Path, variables: dict, meta: dict | None = None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    variables = jax.tree.map(np.asarray, variables)
    path.write_bytes(serialization.msgpack_serialize(variables))
    if meta is not None:
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2))


def load_variables(path: str | Path) -> tuple:
    path = Path(path)
    variables = serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return variables, meta


def save_train_state(ckpt_dir: str | Path, state, step: int):
    """Periodic training checkpoints via orbax (replaces torch.save dicts,
    classifier/train.py:292-312)."""
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir / f"step_{step:08d}", state)
    ckptr.wait_until_finished()


def load_train_state(ckpt_dir: str | Path, step: int, target):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(ckpt_dir).absolute() / f"step_{step:08d}", target)


def latest_step(ckpt_dir: str | Path) -> int | None:
    """Highest step_NNNNNNNN checkpoint in ckpt_dir, or None if empty."""
    steps = sorted(int(p.name.split("_")[1])
                   for p in Path(ckpt_dir).glob("step_*") if p.is_dir())
    return steps[-1] if steps else None
