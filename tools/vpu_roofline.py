"""Measured VPU roofline for the flagship NVAE decode (BASELINE.md's
"where the MFU gap goes").

The stage profile (tools/profile_flagship.py, 2026-08-19) shows decode at
8.7% MXU and 33% HBM — neither roof explains why it is 70% of purify time.
The hypothesis: the MBConv cells' BN-SiLU-DW5x5-BN-SiLU segments are pure
VPU stencil/transcendental work (a 5x5 DEPTHWISE conv has no channel
contraction, so the MXU cannot help; reference cell:
NVAE/modules/architecture.py:139-186).

This tool MEASURES that floor instead of asserting it: it times, in
isolation at the exact flagship decoder shapes (batch 96 to match the
stage profile), (a) each BN-SiLU-DW-BN-SiLU segment as XLA compiles it and
(b) the bare depthwise conv, multiplies by the cell count of each shape,
and prints the summed segment floor next to the measured whole-decode
time.  If the segments alone are most of the decode, the decode is at its
VPU roofline and further kernel work there is wasted (consistent with both
hand-written replacements REGRESSING: shiftsum 22.28, Pallas segment
30.54 vs 59.78 img/s — BASELINE.md).

Usage: python tools/vpu_roofline.py [--batch 96] [--dtype bfloat16]
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


# flagship decoder hidden shapes: (count, H, hidden) — NVAEConfig 3 scales x
# 8 groups non-adaptive, base 32, top_mult 8, MBConv hidden_mul 6 (decoder) /
# 3 (postprocess).  Counts: scale0 has 7 non-(0,0) groups x 2 cells; each
# s_up cell upsamples BEFORE its segment (hidden at the doubled res).
SEGMENTS = [
    ("scale0 8x8x1536", 14, 8, 1536),
    ("0_up 16x16x1536", 1, 16, 1536),
    ("scale1 16x16x768", 16, 16, 768),
    ("1_up 32x32x768", 1, 32, 768),
    ("scale2 32x32x384", 16, 32, 384),
    ("post0 64x64x192", 1, 64, 192),
    ("post1 64x64x96", 1, 64, 96),
]


def timed(fn, x, iters=20):
    """Two forced warmups + two timed windows, min (the first program timed
    in a fresh process through this backend reads ~10-1000x slow —
    BASELINE.md methodology note).  Each call perturbs the input so the
    lazy backend cannot memoize, and the perturbation is large enough to
    survive rounding in bf16 (eps ~8e-3 at data of order 1 — a 1e-12 shift
    rounds away and every call would see a bit-identical input); the
    scalar fetch sums over ALL outputs in the window so the backend cannot
    cancel any of the iters-1 calls whose buffers would otherwise be
    dropped (bench.py measurement-integrity rule)."""
    def force(res):
        total = float(jnp.sum(jnp.stack(
            [jnp.sum(o.astype(jnp.float32)) for o in res])))
        assert np.isfinite(total)

    force([fn(x)])
    force([fn(x + jnp.asarray(1e-2, x.dtype))])
    best = None
    for w in range(2):
        t0 = time.perf_counter()
        acc = [fn(x + jnp.asarray((2 + w * iters + i) * 1e-2, x.dtype))
               for i in range(iters)]
        force(acc)
        best_w = (time.perf_counter() - t0) / iters
        best = best_w if best is None else min(best, best_w)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    total_seg = 0.0
    total_dw = 0.0
    rows = []
    for name, count, h, c in SEGMENTS:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(args.batch, h, h, c), dtype)
        taps = jnp.asarray(rng.rand(5, 5, 1, c) * 0.1, dtype)
        s1 = jnp.asarray(rng.rand(c) + 0.5, dtype)
        b1 = jnp.asarray(rng.rand(c) - 0.5, dtype)
        s2 = jnp.asarray(rng.rand(c) + 0.5, dtype)
        b2 = jnp.asarray(rng.rand(c) - 0.5, dtype)

        def dw(x, taps=taps, c=c):
            return jax.lax.conv_general_dilated(
                x, taps, (1, 1), ((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def segment(x, dw=dw, s1=s1, b1=b1, s2=s2, b2=b2):
            r = jax.nn.silu(x * s1 + b1)
            r = dw(r)
            return jax.nn.silu(r * s2 + b2)

        t_seg = timed(jax.jit(segment), x)
        t_dw = timed(jax.jit(dw), x)
        total_seg += count * t_seg
        total_dw += count * t_dw
        elems = args.batch * h * h * c
        # 25 madds/elem = 50 flop-equivalent VPU ops for the stencil alone
        vpu_gops = elems * 50 / t_dw / 1e9
        rows.append((name, count, t_seg * 1e3, t_dw * 1e3, vpu_gops))
        print(f"{name:18s} x{count:2d}  segment {t_seg*1e3:7.3f} ms   "
              f"bare DW {t_dw*1e3:7.3f} ms   DW stencil {vpu_gops:7.1f} Gop/s")

    print(f"\nsummed over cells (batch {args.batch}, {args.dtype}):")
    print(f"  BN-SiLU-DW-BN-SiLU segments: {total_seg*1e3:8.2f} ms")
    print(f"  bare depthwise convs:        {total_dw*1e3:8.2f} ms")
    print("  (stage profile 2026-08-19: whole decode 38.7 ms, "
          "whole defense 49.4 ms at batch 96 bf16)")


if __name__ == "__main__":
    main()
