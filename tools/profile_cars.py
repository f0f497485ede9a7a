"""Stage-level timing of the cars defense (Style-Transformer purify at
512px + resnext50 classify): where does the time per EoT-32 image go?

Times, at the bench operating point (batch B x EoT-chunk N => effective
batch B*N through the purifier):
  - pre (resize 128 -> 256 + letterbox crop to 192x256)
  - Style-Transformer encode (192x256 -> 16 query-token codes)
  - StyleGAN2-512 decode (16 codes -> 512^2, pooled to 256^2)
  - post (letterbox blank + resize 256 -> 128)
  - classifier (resnext50, 128^2 -> logits)
  - full purify+classify chunk for reference
Each stage is its own jitted program, so per-program overhead matches the
production dispatch pattern.

Measurement-integrity notes identical to tools/profile_gender.py: scalar
reduction inside jit, rotated key mixed into the input per call, two
forced warmups + two timed windows (min) to flush the backend's
first-program dispatch costs.
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
    Two forced warmups, two timed windows, report the min (see
    tools/profile_gender.py for the measured first-program artifact)."""
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
    p.add_argument("--chunk", type=int, default=8,
                   help="effective purifier batch = --batch x --chunk")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    b = args.batch * args.chunk  # one EoT chunk's worth through the purifier

    import bench as benchmod
    defense = benchmod._synth_mlvgm_defense("cars")
    if args.dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)

    from gen_adversarial_tpu.models.style_transformer.model import (
        StyleTransformer)
    from gen_adversarial_tpu.ops.image import resize_bilinear
    model = StyleTransformer(output_size=512)
    variables = defense.purify_variables

    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} eff_batch={b} "
          f"dtype={args.dtype}")

    def jitter(x, key):
        return x + jax.random.uniform(key, (), x.dtype, 0, 1e-6)

    x128 = jnp.asarray(rng.rand(b, 128, 128, 3), dtype)
    pre = jax.jit(lambda x, k: _scalar(
        resize_bilinear(jitter(x, k), 256, 256)[:, 32:-32, :, :]))
    t_pre = timed(pre, (x128,), args.iters)
    print(f"pre      (128^2 -> 192x256):          {t_pre*1e3:8.2f}ms",
          flush=True)

    x192 = jnp.asarray(rng.rand(b, 192, 256, 3) - 0.5, dtype)
    enc = jax.jit(lambda v, x, k: _scalar(
        model.apply(v, jitter(x, k), method=StyleTransformer.encode)))
    t_enc = timed(enc, (variables, x192), args.iters)
    print(f"encode   (192x256 -> (b,16,512)):     {t_enc*1e3:8.2f}ms",
          flush=True)

    codes = jnp.asarray(rng.randn(b, 16, 512) * 0.02, dtype)
    dec = jax.jit(lambda v, c, k: _scalar(
        model.apply(v, jitter(c, k), method=StyleTransformer.decode)))
    t_dec = timed(dec, (variables, codes), args.iters)
    print(f"decode   ((b,16,512) -> (b,256,256,3)): {t_dec*1e3:6.2f}ms",
          flush=True)

    img256 = jnp.asarray(rng.rand(b, 256, 256, 3) * 2 - 1, dtype)

    def post_fn(y, k):
        y = jitter(y, k)
        y = y.at[:, :32].set(-1.0).at[:, -32:].set(-1.0)
        return _scalar(resize_bilinear(y, 128, 128))

    post = jax.jit(post_fn)
    t_post = timed(post, (img256,), args.iters)
    print(f"post     (blank + 256^2 -> 128^2):    {t_post*1e3:8.2f}ms",
          flush=True)

    img128 = jnp.asarray(rng.rand(b, 128, 128, 3), dtype)
    cls = jax.jit(lambda cv, y, k: _scalar(
        defense.classifier_apply(cv, jitter(y, k))))
    t_cls = timed(cls, (defense.classifier_variables, img128), args.iters)
    print(f"classify ((b,128,128,3) -> logits):   {t_cls*1e3:8.2f}ms",
          flush=True)

    x01 = jnp.asarray(rng.rand(b, 128, 128, 3), jnp.float32)
    full = jax.jit(lambda d, x, k: _scalar(d(k, x)))
    t_full = timed(full, (defense, x01), args.iters)
    stages = t_pre + t_enc + t_dec + t_post + t_cls
    print(f"full purify+classify chunk:           {t_full*1e3:8.2f}ms "
          f"(stages sum {stages*1e3:.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
