"""Sweep jax.checkpoint policies for the attack-step backward.

The APGD bench (bench.py bench_apgd) remats the purifier because the
attack backward otherwise holds EoT-32 x batch purifier activations
(OOM on a 16G chip).  Plain jax.checkpoint saves NOTHING and recomputes
the whole purifier in the backward; `dots_saveable` keeps matmul/conv
outputs on HBM and only recomputes the elementwise chain - less
recompute, more memory.  This sweep measures the trade on hardware:

    python tools/tune_remat.py --dtype bfloat16 --batches 8,16,24

Prints one JSON line per (policy, batch); OOM/compile failures are
reported, not fatal.

Measured verdict (v5e-1, 2026-08-17, APGD-CE 16 iters EoT-32 flagship):
  full_remat        bf16  b8 11.40 | b16 14.90 | b24 12.05
  dots_saveable     bf16  b8/b16: remote-compile HTTP 500 (helper dies;
                          saving every dot of the EoT-32 purifier backward
                          is beyond the compiler on a 16G chip)
  dots_with_no_batch_dims_saveable
                    bf16  b4 14.80 | b8 16.39 | b12 13.02 | b16 14.91
                    f32   b8: remote-compile HTTP 500
Winner: dots_with_no_batch_dims_saveable @ batch 8 bf16 (+10% over the
full-remat peak) - promoted as bench.py's apgd_bf16 operating point and
exposed via cli/test_defense.py --remat-policy.  f32 stays full remat.
"""

import argparse
import json
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

POLICIES = [None, "dots_saveable", "dots_with_no_batch_dims_saveable"]


def run_one(policy, batch, dtype, n_iter=16, eot_chunk=8, iters=3):
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    from gen_adversarial_tpu.attacks.apgd import apgd_attack

    defense = _flagship().replace(remat=True, remat_policy=policy)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)

    @jax.jit
    def step(defense, x, y, key):
        net = eot_wrap(defense, eot_steps=32, chunk=eot_chunk)
        succ, bound, adv = apgd_attack(key, net, x, y, n_iter=n_iter,
                                       rho=0.75, max_bound=4.0, ce_loss=True)
        return jnp.sum(bound) + jnp.sum(adv)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 100, batch))
    float(step(defense, x, y, jax.random.PRNGKey(0)))  # compile + force

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        key, sub = jax.random.split(key)
        outs.append(step(defense, x, y, sub))
    total = float(jnp.sum(jnp.stack(outs)))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    return batch * n_iter / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batches", default="8,16")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    for policy in POLICIES:
        for batch in batches:
            rec = {"policy": policy or "full_remat", "batch": batch,
                   "dtype": args.dtype}
            try:
                rec["img_iters_per_sec"] = round(
                    run_one(policy, batch, args.dtype), 2)
            except Exception as e:
                rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
