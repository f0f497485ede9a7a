"""Op-level microbenchmarks at the flagship NVAE decoder shapes.

Quantifies whether XLA's depthwise-conv lowering is the flagship purify
bottleneck before investing in a Pallas kernel (profile-first; the decoder
cell is 1x1 expand [MXU] -> BN -> SiLU -> 5x5 depthwise [VPU] -> BN ->
SiLU -> 1x1 project [MXU], models/nvae/cells.py:83-112).

Shapes: EoT-32 x batch-16 = 512 effective batch; decoder hidden channels
6x{256,128,64} = {1536,768,384} at {8^2,16^2,32^2} (all 128-lane aligned).

Prints per-shape times for: the depthwise conv alone, the full
BN-SiLU-DW-BN-SiLU segment, the two 1x1 convs, and a bandwidth roofline
estimate - each for f32 and bf16, XLA vs the Pallas fused kernel
(ops/pallas_depthwise.py) when present.
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (batch, H, W, C_hidden): flagship decoder-cell shapes
SHAPES = [(512, 8, 8, 1536), (512, 16, 16, 768), (512, 32, 32, 384)]
HBM_GB_S = 819.0  # v5e


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = []
    for _ in range(iters):
        acc.append(fn(*args))
    # force execution: scalar depending on all outputs (runtime cancels
    # dropped-output computations; see bench.py)
    s = float(jnp.sum(jnp.stack([jnp.sum(o) for o in acc])))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / iters


@partial(jax.jit, static_argnames=())
def dw_conv(x, w):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@jax.jit
def dw_segment(x, w, scale0, bias0, scale1, bias1):
    """BN(affine, inference) -> SiLU -> depthwise -> BN -> SiLU."""
    r = nn.silu(x * scale0 + bias0)
    r = dw_conv(r, w)
    return nn.silu(r * scale1 + bias1)


@jax.jit
def pw_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def pw_matmul(x, w):
    """1x1 conv as an explicit matmul (the MXU-native form)."""
    b, h, w_, c = x.shape
    y = x.reshape(b * h * w_, c) @ w.reshape(c, -1)
    return y.reshape(b, h, w_, -1)


def dw_shiftsum(x, wk):
    """Depthwise 5x5 as 25 shifted multiplies (pure elementwise graph: XLA
    can fuse it with surrounding BN/SiLU into ONE loop fusion, unlike a
    convolution HLO which is a fusion barrier).  wk: (5, 5, C)."""
    h, w_ = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    acc = None
    for dy in range(5):
        for dx in range(5):
            t = xp[:, dy:dy + h, dx:dx + w_, :] * wk[dy, dx]
            acc = t if acc is None else acc + t
    return acc


@jax.jit
def dw_segment_shiftsum(x, wk, scale0, bias0, scale1, bias1):
    r = nn.silu(x * scale0 + bias0)
    r = dw_shiftsum(r, wk)
    return nn.silu(r * scale1 + bias1)


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}")
    for dtype in (jnp.float32, jnp.bfloat16):
        dname = jnp.dtype(dtype).name
        for (b, h, w_, c) in SHAPES:
            x = jnp.asarray(rng.rand(b, h, w_, c), dtype)
            wk = jnp.asarray(rng.rand(5, 5, 1, c) * 0.1, dtype)
            sc0, bi0, sc1, bi1 = (jnp.asarray(rng.rand(c), dtype) for _ in range(4))
            # 1x1s at cell boundary: expand C/6 -> C and project C -> C/6
            cin = c // 6
            xe = jnp.asarray(rng.rand(b, h, w_, cin), dtype)
            we = jnp.asarray(rng.rand(1, 1, cin, c) * 0.05, dtype)
            wp = jnp.asarray(rng.rand(1, 1, c, cin) * 0.05, dtype)

            t_dw = timed(dw_conv, x, wk)
            t_seg = timed(dw_segment, x, wk, sc0, bi0, sc1, bi1)
            t_ss = timed(dw_segment_shiftsum, x, wk.reshape(5, 5, c),
                         sc0, bi0, sc1, bi1)
            t_e = timed(pw_conv, xe, we)
            t_p = timed(pw_conv, x, wp)
            t_em = timed(pw_matmul, xe, we)
            t_pm = timed(pw_matmul, x, wp)

            bytes_rt = 2 * b * h * w_ * c * jnp.dtype(dtype).itemsize
            roof_ms = bytes_rt / (HBM_GB_S * 1e9) * 1e3
            line = (f"{dname} ({b},{h},{w_},{c}): dw {t_dw*1e3:7.3f}ms "
                    f"seg {t_seg*1e3:7.3f}ms shiftsum-seg {t_ss*1e3:7.3f}ms "
                    f"expand {t_e*1e3:7.3f}/{t_em*1e3:.3f}ms(conv/mm) "
                    f"project {t_p*1e3:7.3f}/{t_pm*1e3:.3f}ms"
                    f" | 1-pass roofline {roof_ms:6.3f}ms")
            try:
                from gen_adversarial_tpu.ops.pallas_depthwise import (
                    depthwise_silu_segment)
                t_pl = timed(jax.jit(depthwise_silu_segment),
                             x, wk.reshape(5, 5, c), sc0, bi0, sc1, bi1)
                line += f" | pallas seg {t_pl*1e3:7.3f}ms"
            except Exception as e:
                line += f" | pallas seg FAILED {type(e).__name__}"
            print(line, flush=True)


if __name__ == "__main__":
    main()
