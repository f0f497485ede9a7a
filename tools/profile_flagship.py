"""Stage-level roofline of the flagship ids defense (NVAE c32/24-group
purify at 64px + vgg11_bn/100 classify): which segment holds the headline
at ~17% of bf16 peak?

Times each stage as its own jitted program at the headline's effective
purifier batch (EoT-chunked production runs see batch x chunk samples per
purifier call), and prints measured time + XLA cost analysis per stage:
FLOPs, bytes accessed, achieved TFLOP/s / %bf16-peak, GB/s / %HBM-peak.

Stages:
  - encode    (_preprocess + _encode_tower)
  - decode    (prior sample: decoder towers + postprocess + DiscMix)
  - purify    (full encode+interpolate+decode)
  - classify  (vgg11_bn on the purified batch)
  - full      (defense __call__: preprocess + purify + classify)

Measurement integrity follows bench.py: every stage reduces to an f32
scalar inside jit, every call mixes a rotated key into its input, and the
timed loop forces all outputs with one stacked fetch.
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


def _scalar(x):
    """NaN-safe forcing scalar: synthesized weights can overflow through the
    prior-sample decode; timing only needs the full data dependency."""
    leaves = jax.tree.leaves(x)
    return sum(jnp.mean(jnp.where(jnp.isfinite(l.astype(jnp.float32)),
                                  jnp.abs(l.astype(jnp.float32)), 0.0))
               for l in leaves)


def timed(fn, args, iters=5):
    """Two forced warmup calls, then two timed windows; report the min.

    One warmup + one window systematically inflated the FIRST stage timed
    in a process ~10x (flagship encode read 548ms standalone vs ~13ms
    implied inside the fused purify program, 2026-08-19): the first
    dispatches of a fresh program through this remote backend carry
    one-time costs the single forced warmup does not flush."""
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


def cost(fn, *args):
    try:
        ca = fn.lower(*args, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def report(name, dt, flops, bytes_, batch):
    import bench as benchmod
    peak_t = benchmod._peak_tflops("bfloat16") or 0
    peak_b = benchmod._peak_hbm_gbps() or 0
    tflops = flops / dt / 1e12
    gbps = bytes_ / dt / 1e9
    print(f"{name:9s} {dt*1e3:8.2f}ms  {flops/1e9/batch:8.2f} GF/img  "
          f"{tflops:7.2f} TF/s ({100*tflops/peak_t if peak_t else 0:4.1f}%)  "
          f"{gbps:7.1f} GB/s ({100*gbps/peak_b if peak_b else 0:4.1f}%)",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96,
                   help="purifier-effective batch (headline: 96 unchunked)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke-testing the tool; "
                        "set BEFORE any backend init, per verify SKILL)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    b = args.batch
    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig

    defense = _flagship()
    if args.dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    variables = defense.purify_variables
    cfg = NVAEConfig(resolution=64, initial_channels=32, n_pre_post_blocks=1,
                     n_pre_post_cells=2, num_scales=3, num_groups_per_scale=8,
                     is_adaptive=False, num_cells_per_group=2,
                     num_latent_per_group=20, num_nf_cells=None)
    model = NVAE(cfg)
    alphas = defense.alphas

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, 64, 64, 3), dt_)

    print(f"backend={jax.default_backend()} batch={b} dtype={args.dtype}",
          flush=True)
    print(f"{'stage':9s} {'time':>8s}    {'GF/img':>8s}      "
          f"{'TFLOP/s':>7s}         {'HBM':>7s}", flush=True)

    def jitter(t, key):
        return t + jax.random.uniform(key, (), t.dtype, 0, 1e-6)

    enc = jax.jit(lambda v, x, k: _scalar(model.apply(
        v, method=lambda m: m._encode_tower(
            m._preprocess(jitter(x, k), False), False))))
    t = timed(enc, (variables, x), args.iters)
    report("encode", t, *cost(enc, variables, x), b)

    dec = jax.jit(lambda v, k: _scalar(model.apply(
        v, k, b, 0.6, False, dt_, method=NVAE.sample)))
    t = timed(dec, (variables,), args.iters)
    report("decode", t, *cost(dec, variables), b)

    pur = jax.jit(lambda v, x, a, k: _scalar(model.apply(
        v, jitter(x, k), k, a, 0.6, method=NVAE.purify)))
    t = timed(pur, (variables, x, alphas), args.iters)
    report("purify", t, *cost(pur, variables, x, alphas), b)

    cls = jax.jit(lambda cv, y, k: _scalar(
        defense.classifier_apply(cv, jitter(y, k))))
    t = timed(cls, (defense.classifier_variables, x), args.iters)
    report("classify", t, *cost(cls, defense.classifier_variables, x), b)

    x01 = jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32)
    full = jax.jit(lambda d, y, k: _scalar(d(k, jitter(y, k))))
    t = timed(full, (defense, x01), args.iters)
    report("full", t, *cost(full, defense, x01), b)


if __name__ == "__main__":
    main()
