"""Stage-level timing of the gender defense (E4E purify at 1024px +
resnet50 classify): where does the time per EoT-32 image actually go?

Times, at the bench operating point (batch 1 x EoT-chunk N => effective
batch N through the purifier):
  - E4E encoder (256^2 -> 18 styles)
  - StyleGAN2-1024 decode (18 styles -> 1024^2 image, pooled to 256^2)
  - classifier (256^2 -> logits)
  - full purify+classify chunk for reference
Each stage is its own jitted program, so per-program overhead matches the
production dispatch pattern (the eval harness also runs one program per
step).

Measurement-integrity notes (this backend is lazy — see bench.py):
  - every stage fn reduces to an f32 SCALAR inside jit (bf16 sums over a
    1024^2 decode overflow; host-side reductions on lazy buffers have been
    observed to re-run the producing graph per fetch);
  - every call gets a rotated key mixed into its input, exactly like
    bench._timed, so identical-input results cannot be memoized away;
  - the timed loop keeps all scalars and forces once via one stacked fetch
    (verified linear in iteration count by bench.py).
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, iters=5):
    """fn(*args, key) must be jitted and return a finite f32 scalar.

    Two forced warmup calls, then two timed windows; report the min — a
    single warmup systematically inflated the FIRST stage timed in a
    process ~10x (gender encode read 473ms standalone vs <=132ms for the
    whole purify+classify chunk containing it, 2026-08-19): the first
    dispatches of a fresh program through this remote backend carry
    one-time costs one forced call does not flush."""
    for k in (0, 2):
        float(fn(*args, jax.random.PRNGKey(k)))  # compile + force
    key = jax.random.PRNGKey(1)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        acc = []
        for _ in range(iters):
            key, sub = jax.random.split(key)
            acc.append(fn(*args, sub))
        s = float(jnp.sum(jnp.stack(acc)))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(s), s
        best = dt if best is None else min(best, dt)
    return best


def _scalar(x):
    return jnp.mean(jnp.abs(x).astype(jnp.float32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    b = args.chunk

    import bench as benchmod
    defense = benchmod._synth_mlvgm_defense("gender")
    if args.dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)

    from gen_adversarial_tpu.models.e4e.psp import PSP
    model = PSP(stylegan_size=1024)
    variables = defense.purify_variables

    rng = np.random.RandomState(0)
    x256 = jnp.asarray(rng.rand(b, 256, 256, 3) - 0.5, dtype)

    print(f"backend={jax.default_backend()} chunk={b} dtype={args.dtype}")

    def jitter(x, key):
        # new input per call (defeats result memoization), epsilon-cheap
        return x + jax.random.uniform(key, (), x.dtype, 0, 1e-6)

    enc = jax.jit(lambda v, x, k: _scalar(
        model.apply(v, jitter(x, k), method=PSP.encode)))
    t_enc = timed(enc, (variables, x256), args.iters)
    import math
    n_latent = int(math.log2(model.stylegan_size)) * 2 - 2  # 18 at 1024
    codes_shape = (b, n_latent, 512)
    print(f"encode   (256^2 -> {codes_shape}): {t_enc*1e3:8.2f}ms", flush=True)

    codes = jnp.asarray(rng.randn(*codes_shape) * 0.02, dtype)
    dec = jax.jit(lambda v, c, k: _scalar(
        model.apply(v, jitter(c, k), method=PSP.decode)))
    t_dec = timed(dec, (variables, codes), args.iters)
    print(f"decode   ({codes_shape} -> (b,256,256,3)): {t_dec*1e3:8.2f}ms",
          flush=True)

    img = jnp.asarray(rng.rand(b, 256, 256, 3) * 2 - 1, dtype)
    cls = jax.jit(lambda cv, y, k: _scalar(
        defense.classifier_apply(cv, (jitter(y, k) + 1) / 2)))
    t_cls = timed(cls, (defense.classifier_variables, img), args.iters)
    print(f"classify ((b,256,256,3) -> logits):   {t_cls*1e3:8.2f}ms",
          flush=True)

    x01 = jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32)
    full = jax.jit(lambda d, x, k: _scalar(d(k, x)))
    t_full = timed(full, (defense, x01), args.iters)
    print(f"full purify+classify chunk:         {t_full*1e3:8.2f}ms "
          f"(stages sum {1e3*(t_enc+t_dec+t_cls):.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
