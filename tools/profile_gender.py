"""Stage-level timing of the gender defense (E4E purify at 1024px +
resnet50 classify): where does the 1/3.5s per EoT-32 image actually go?

Times, at the bench operating point (batch 1 x EoT-chunk 8 => effective
batch 8 through the purifier):
  - E4E encoder (256^2 -> 18 styles)
  - StyleGAN2-1024 decode (18 styles -> 1024^2 image)
  - decode resized + classifier (1024^2 -> 256^2 -> logits)
  - full purify+classify chunk for reference
Each stage is its own jitted program, so per-program overhead matches the
production dispatch pattern (the eval harness also runs one program per
step).
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


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = []
    for _ in range(iters):
        acc.append(fn(*args))
    s = float(sum(jnp.sum(jax.tree.leaves(a)[0]) for a in acc))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
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

    enc = jax.jit(lambda v, x: model.apply(v, x, method=PSP.encode))
    t_enc = timed(enc, variables, x256)
    codes = enc(variables, x256)
    print(f"encode  (256^2 -> {codes.shape}): {t_enc*1e3:8.2f}ms", flush=True)

    dec = jax.jit(lambda v, c: model.apply(
        v, c, input_is_latent=True, randomize_noise=False,
        method=PSP.decode))
    t_dec = timed(dec, variables, codes)
    img = dec(variables, codes)
    print(f"decode  ({codes.shape} -> {img.shape}): {t_dec*1e3:8.2f}ms",
          flush=True)

    def classify(cv, y):
        return defense.classifier_apply(cv, (y + 1) / 2)
    cls = jax.jit(classify)
    t_cls = timed(cls, defense.classifier_variables, img)
    print(f"classify ({img.shape} -> logits):   {t_cls*1e3:8.2f}ms",
          flush=True)

    key = jax.random.PRNGKey(0)
    full = jax.jit(lambda d, k, x: d(k, x))
    x01 = jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32)
    t_full = timed(full, defense, key, x01)
    print(f"full purify+classify chunk:         {t_full*1e3:8.2f}ms "
          f"(stages sum {1e3*(t_enc+t_dec+t_cls):.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
