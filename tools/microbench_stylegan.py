"""Per-resolution microbenchmarks of the StyleGAN2-1024 decode (the gender
defense's cost center: EoT-32 purify decodes 1024^2 images through the
generator trunk, reference StyleGan_E4E/stylegan2/generator.py:403-479).

Times, per resolution of the synthesis pyramid at the EoT-chunk batch (8):
  - StyledConv upsample (conv_transpose via lhs_dilation + blur)
  - StyledConv plain 3x3
  - ToRGB (1x1 modulated to C=3) + skip upsample_fir (depthwise on C=3)
so the optimization target is chosen by measurement, not guess.  Also
times one full generator forward for the end-to-end anchor.

Usage: python tools/microbench_stylegan.py [--batch 8] [--dtype bfloat16]
"""

import argparse
import os
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

from gen_adversarial_tpu.models.stylegan2.generator import generator_channels
from gen_adversarial_tpu.models.stylegan2.layers import (
    StyledConv, ToRGB, upsample_fir)


def timed(fn, *args, iters=10):
    """fn(*args) -> array(s); the LAST positional arg must be something the
    caller is happy to have perturbed per call (a key or an input tensor) —
    each iteration adds a unique epsilon so identical-input results cannot
    be memoized by the lazy backend.  Two forced warmups + two timed
    windows (min) flush the first-program dispatch overhead this backend
    charges (measured 2026-08-19: an 18.5s reading for a ~5ms block when
    timed first in the process)."""
    def force(res):
        s = float(jnp.sum(jnp.stack(
            [jnp.sum(jax.tree.leaves(a)[0].astype(jnp.float32)) for a in res])))
        assert np.isfinite(s)

    def vary(i):
        last = args[-1]
        if last.dtype == jnp.uint32:  # a PRNG key
            return args[:-1] + (jax.random.fold_in(last, i),)
        # perturbation must survive bf16 rounding (eps ~8e-3 at data of
        # order 1; 1e-12 rounds away and every call would be bit-identical
        # — same class as the ADVICE r03 vpu_roofline finding)
        return args[:-1] + (last + jnp.asarray(i * 1e-2, last.dtype),)

    force([fn(*vary(0))])
    force([fn(*vary(1))])
    best = None
    n = 2
    for w in range(2):
        t0 = time.perf_counter()
        acc = [fn(*vary(n + w * iters + i)) for i in range(iters)]
        force(acc)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--min-res", type=int, default=8,
                   help="skip blocks below this resolution (run the "
                        "1024 block in a fresh process: a full sweep's "
                        "residual buffers OOM'd its compile 2026-08-19)")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    b = args.batch

    print(f"backend={jax.default_backend()} batch={b} dtype={args.dtype}")
    ch = generator_channels(2)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    import math
    total = 0.0
    for i in range(3, int(math.log2(args.size)) + 1):
        res = 2 ** i
        if res < args.min_res:
            continue
        in_ch, out_ch = ch[res // 2], ch[res]
        x = jnp.asarray(rng.rand(b, res // 2, res // 2, in_ch), dtype)
        style = jnp.asarray(rng.rand(b, 512), dtype)

        up = StyledConv(out_ch, 3, upsample=True)
        os.environ["GAT_SG2_UP"] = "dilated"
        vu = up.init(key, x, style, key=key)
        vu = jax.tree.map(lambda a: a.astype(dtype), vu)
        f_up = jax.jit(lambda v, x, s, k: up.apply(v, x, s, key=k))
        t_up = timed(f_up, vu, x, style, key)
        os.environ["GAT_SG2_UP"] = "phase"
        f_upp = jax.jit(lambda v, x, s, k: up.apply(v, x, s, key=k) + 0.0)
        t_upp = timed(f_upp, vu, x, style, key)
        os.environ["GAT_SG2_UP"] = "dilated"

        x2 = jnp.asarray(rng.rand(b, res, res, out_ch), dtype)
        pl = StyledConv(out_ch, 3)
        vp = pl.init(key, x2, style, key=key)
        vp = jax.tree.map(lambda a: a.astype(dtype), vp)
        f_pl = jax.jit(lambda v, x, s, k: pl.apply(v, x, s, key=k))
        t_pl = timed(f_pl, vp, x2, style, key)

        rgb = ToRGB()
        skip = jnp.asarray(rng.rand(b, res // 2, res // 2, 3), dtype)
        vr = rgb.init(key, x2, style, skip)
        vr = jax.tree.map(lambda a: a.astype(dtype), vr)
        f_rgb = jax.jit(lambda v, x, s, sk: rgb.apply(v, x, s, sk))
        t_rgb = timed(f_rgb, vr, x2, style, skip)

        total += t_up + t_pl + t_rgb
        print(f"res {res:5d} ({in_ch:3d}->{out_ch:3d}ch): "
              f"up-conv {t_up*1e3:8.3f}ms (phase {t_upp*1e3:8.3f}ms)  "
              f"plain-conv {t_pl*1e3:8.3f}ms  "
              f"to_rgb+skip {t_rgb*1e3:8.3f}ms", flush=True)

    print(f"sum of blocks: {total*1e3:.1f}ms "
          f"({b/total:.2f} img/s equivalent)", flush=True)


if __name__ == "__main__":
    main()
