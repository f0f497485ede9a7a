"""Precision utilities: bf16 casting for HBM-bound inference paths.

The purifier forward is memory-bound on v5e (BASELINE.md decomposition:
bf16 purify is 1.77x faster than f32).  `cast_floating` converts every
float32 leaf of a pytree (defense, variables, batch) to the target dtype;
robust-accuracy parity of a bf16 defense vs f32 must be validated per
checkpoint before use in reported results.
"""

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def defense_astype(defense, dtype=jnp.bfloat16):
    """Return the defense with all floating weights cast to `dtype` and
    `compute_dtype` set, so the model forward/backward runs in `dtype`
    while the defense's external contract (logits, purified images, attack
    math) stays float32 (see defenses/base.py boundary casts).  Weights are
    cast ONCE here - casting per call would re-stream every parameter
    through HBM on each attack step.

    Defense dataclasses without a compute_dtype field (noise/blur ablations,
    competitor wrappers) only get their weights cast; inputs stay f32 and
    promotion keeps their pipeline f32-dominant, which is correct but not a
    fast path."""
    cast = cast_floating(defense, dtype)
    if "compute_dtype" in getattr(type(defense), "__dataclass_fields__", {}):
        cast = cast.replace(compute_dtype=dtype)
    return cast
