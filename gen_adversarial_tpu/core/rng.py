"""PRNG plumbing.

Every stochastic site in the reference (torch.randn_like in NoiseInjection,
prior sampling, EoT noise, attack inits) becomes an explicit jax PRNG key
here.  `KeyChain` is a tiny convenience for threading keys through
imperative-looking model code at trace time.
"""

import jax


class KeyChain:
    """Deterministically splits a root key on demand.

    Usage:
        kc = KeyChain(key)
        eps = jax.random.normal(kc.next(), shape)

    Splitting happens at trace time in a fixed order, so the same root key
    always yields the same stream regardless of jit.
    """

    def __init__(self, key: jax.Array):
        self._key = key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return list(keys[1:])
