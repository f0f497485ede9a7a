"""Expectation over Transformation (reference wrappers.py:4-24 in
SerezD/gen_adversarial): average logits over eot_steps stochastic forward
passes.

The torch version repeats a batch-1 input 32x; here the defense is already
batched, so EoT is a vmap over 32 PRNG keys (optionally chunked with
lax.map to bound activation memory at high resolution).  The result is
differentiable-in-expectation exactly like the reference.

Shared-encode fast path: defenses whose purify splits into a deterministic
encode + stochastic decode (defenses/base.py supports_shared_encode) run
the encode ONCE per image and vmap only the decode+classify over the draw
keys — the per-draw math is unchanged (same ops, same keys), so results
match the naive wrapper; the encoder tower (20-30% of the pipeline,
BASELINE.md) stops being recomputed eot_steps times, forward AND backward
(the attack gradient then flows through one encode with summed cotangents).
The reference recomputes everything per repeat (wrappers.py:14-16)."""

import os

import jax
import jax.numpy as jnp
from jax import lax


def eot_wrap(defense, eot_steps: int = 32, chunk: int | None = None,
             shared_encode: bool = True, unroll: int | None = None):
    """defense: callable(key, x) -> logits.  Returns net(key, x) -> mean
    logits over eot_steps draws.  shared_encode=False forces the naive
    per-draw recompute (A/B and parity testing).

    unroll (default 1, GAT_EOT_UNROLL overrides): chunked EoT runs the
    chunk loop as lax.scan with this unroll factor.  unroll=1 is the
    memory-bounding sequential loop; unroll=2 holds two chunks' activations
    live so XLA's scheduler can interleave one chunk's VPU-heavy phases
    (NVAE decoder depthwise/BN-SiLU segments, 8.7% MXU — BASELINE.md stage
    roofline) with the other's MXU-heavy ones, at 2x the chunk's activation
    footprint.  Result-identical at any factor (same per-chunk programs,
    same stacking order)."""
    if chunk is not None:
        if chunk >= eot_steps:
            chunk = None  # chunking <= one chunk's worth of steps is a no-op
        elif eot_steps % chunk:
            raise ValueError(f"eot_steps={eot_steps} is not divisible by "
                             f"chunk={chunk}")
    if unroll is None:
        unroll = int(os.environ.get("GAT_EOT_UNROLL", "1"))

    def net(key, x):
        keys = jax.random.split(key, eot_steps)
        if shared_encode and getattr(defense, "supports_shared_encode", False):
            state = defense.purify_state(x)
            one = lambda k: defense.state_call(k, state)
        else:
            one = lambda k: defense(k, x)
        if chunk is None:
            logits = jax.vmap(one)(keys)
        else:
            keys = keys.reshape(eot_steps // chunk, chunk, *keys.shape[1:])
            _, logits = lax.scan(lambda _, ks: (None, jax.vmap(one)(ks)),
                                 None, keys, unroll=unroll)
            logits = logits.reshape(eot_steps, *logits.shape[2:])
        return jnp.mean(logits, axis=0)

    return net
