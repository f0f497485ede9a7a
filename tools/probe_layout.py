"""Layout/lane-padding probe for the StyleGAN2 top-resolution shapes.

Hypothesis under test (BASELINE.md "where the MFU gap goes", gender): at
1024^2 the channel count is 32 (cm=2), i.e. 32/128 lanes — if XLA keeps C
minor and pads to the 128-lane tile, HBM traffic and VPU work are amplified
4x, which would explain why the measured gender decode sits at 225 GB/s
"unpadded" bandwidth (27.5% of peak) while every blur A/B regresses (the
path would already be saturated in PADDED bytes).

Probes (bf16, batch like the gender chunk):
  1. elementwise scale on (B,1024,1024,32)  vs same-byte (B,512,512,128)
  2. separable 4-tap blur (production site) on both layouts
  3. conv 3x3 32->32 @1024^2 (normal) vs phase-dense 128->128 @512^2
  4. up-conv (dilated 64->32 @512->1024 + blur) vs fused phase conv
     (3,3,64,128) @512^2 (no depth-to-space)
Each timing uses the bench methodology: jitted scalar force, rotated-key
input jitter, two warmups + two windows (min).
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, iters=5):
    for k in (0, 2):
        float(fn(*args, jax.random.PRNGKey(k)))
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


def jitter(x, key):
    return x + jax.random.uniform(key, (), x.dtype, 0, 1e-6)


def report(name, dt, gbytes=None, gflop=None):
    line = f"{name:46s} {dt*1e3:9.3f}ms"
    if gbytes is not None:
        line += f"  {gbytes/dt:7.1f} GB/s"
    if gflop is not None:
        line += f"  {gflop/dt/1e3:7.2f} TF/s"
    print(line, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    b = args.batch
    bs = dtype.itemsize
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} batch={b} dtype={args.dtype}")

    x_tall = jnp.asarray(rng.rand(b, 1024, 1024, 32) - 0.5, dtype)
    x_wide = jnp.asarray(rng.rand(b, 512, 512, 128) - 0.5, dtype)
    logical_gb = b * 1024 * 1024 * 32 * bs / 1e9  # same for both

    # --- 1. elementwise (R+W of the whole tensor)
    ew = jax.jit(lambda x, k: _scalar(jitter(x, k) * 1.0001 + 0.1))
    report("elementwise (B,1024,1024,32)", timed(ew, (x_tall,), args.iters),
           gbytes=2 * logical_gb)
    report("elementwise (B,512,512,128)", timed(ew, (x_wide,), args.iters),
           gbytes=2 * logical_gb)

    # --- 2. separable blur, production site (up=1 pad (2,1))
    from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d
    k1 = jnp.asarray([1., 3., 3., 1.]) / 8.0

    blur = jax.jit(lambda x, k: _scalar(
        upfirdn2d(jitter(x, k), k1.astype(x.dtype), up=1, down=1, pad=(2, 1))))
    report("sep blur (B,1024,1024,32)", timed(blur, (x_tall,), args.iters),
           gbytes=4 * logical_gb)
    report("sep blur (B,512,512,128)", timed(blur, (x_wide,), args.iters),
           gbytes=4 * logical_gb)

    # --- 3. conv2 site: 3x3 32->32 @1024 vs dense phase 128->128 @512
    w32 = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.05, dtype)
    w128 = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, dtype)
    conv = jax.jit(lambda x, w, k: _scalar(lax.conv_general_dilated(
        jitter(x, k), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))))
    gf32 = b * 1024 * 1024 * 9 * 32 * 32 * 2 / 1e9
    gf128 = b * 512 * 512 * 9 * 128 * 128 * 2 / 1e9
    report("conv3x3 32->32 @1024^2", timed(partial(conv), (x_tall, w32),
                                           args.iters),
           gbytes=2 * logical_gb, gflop=gf32)
    report("conv3x3 128->128 @512^2 (=phase dense 4x)",
           timed(partial(conv), (x_wide, w128), args.iters),
           gbytes=2 * logical_gb, gflop=gf128)

    # --- 4. upsample site: dilated conv 64->32 @->1024 + blur  vs
    #        fused phase conv (3,3,64,128) @512 (no D2S)
    x_in = jnp.asarray(rng.rand(b, 512, 512, 64) - 0.5, dtype)
    wt = jnp.asarray(rng.randn(3, 3, 64, 32) * 0.05, dtype)

    def up_dilated(x, k):
        xj = jitter(x, k)
        y = lax.conv_general_dilated(
            xj, jnp.flip(wt, (0, 1)), (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = upfirdn2d(y, (k1 * 2).astype(x.dtype), up=1, down=1, pad=(1, 1))
        return _scalar(y)

    from gen_adversarial_tpu.ops.phase_upsample import fused_upsample_kernel
    pk = fused_upsample_kernel(wt, (1., 3., 3., 1.)).astype(dtype)

    def up_phase(x, k):
        xj = jitter(x, k)
        y = lax.conv_general_dilated(
            xj, pk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _scalar(y)  # stays (B,512,512,128) phase layout

    gf_up = b * 512 * 512 * 9 * 64 * 32 * 2 / 1e9
    gf_ph = b * 512 * 512 * 9 * 64 * 128 * 2 / 1e9
    report("up: dilated 64->32 @1024 + blur",
           timed(jax.jit(up_dilated), (x_in,), args.iters), gflop=gf_up)
    report("up: fused phase (3,3,64,128) @512",
           timed(jax.jit(up_phase), (x_in,), args.iters), gflop=gf_ph)


if __name__ == "__main__":
    main()
