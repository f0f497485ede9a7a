"""Expectation over Transformation (reference wrappers.py:4-24 in
SerezD/gen_adversarial): average logits over eot_steps stochastic forward
passes.

The torch version repeats a batch-1 input 32x; here the defense is already
batched, so EoT is a vmap over 32 PRNG keys (optionally chunked with
lax.map to bound activation memory at high resolution).  The result is
differentiable-in-expectation exactly like the reference.
"""

import jax
import jax.numpy as jnp
from jax import lax


def eot_wrap(defense, eot_steps: int = 32, chunk: int | None = None):
    """defense: callable(key, x) -> logits.  Returns net(key, x) -> mean
    logits over eot_steps draws."""
    if chunk is not None:
        if chunk >= eot_steps:
            chunk = None  # chunking <= one chunk's worth of steps is a no-op
        elif eot_steps % chunk:
            raise ValueError(f"eot_steps={eot_steps} is not divisible by "
                             f"chunk={chunk}")

    def net(key, x):
        keys = jax.random.split(key, eot_steps)
        if chunk is None:
            logits = jax.vmap(lambda k: defense(k, x))(keys)
        else:
            keys = keys.reshape(eot_steps // chunk, chunk, *keys.shape[1:])
            logits = lax.map(lambda ks: jax.vmap(lambda k: defense(k, x))(ks), keys)
            logits = logits.reshape(eot_steps, *logits.shape[2:])
        return jnp.mean(logits, axis=0)

    return net
