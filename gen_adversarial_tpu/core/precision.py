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
