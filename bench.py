"""Benchmark: purified-images/sec/chip through the flagship NVAE defense.

Measures the hot inner loop of the evaluation harness - the EoT-32
stochastic purification + classification forward (SURVEY.md 3.1: the
dominant cost of every attack iteration) - on one TPU chip, and prints ONE
JSON line.

Measurement integrity note: this runtime lazily cancels computations whose
output buffers are dropped, and block_until_ready alone has been observed
not to force execution - so the timed loop keeps every output and forces
execution with a single scalar fetch that depends on all of them
(verified linear in iteration count).

The reference never measures throughput (BASELINE.md); `vs_baseline`
compares against a provisional A100 estimate for the same torch pipeline
(BASELINE_A100_IMG_S below) until a reference GPU run can be taken.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# optional: GAT_BENCH_DTYPE=bfloat16 benchmarks the bf16 defense path (see
# core/precision.py; ~1.8x on the purifier, accuracy parity unvalidated)
BENCH_DTYPE = os.environ.get("GAT_BENCH_DTYPE", "float32")

# Provisional torch/A100 estimate for EoT-32 NVAE purify+classify at 64px
# (batch-1 harness images/sec; see BASELINE.md - the reference publishes no
# number, so both sides must be measured; this anchors vs_baseline until
# then).
BASELINE_A100_IMG_S = 15.0

BATCH = 16
EOT = 32
ITERS = 5


def main():
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    defense = _flagship()
    if BENCH_DTYPE == "bfloat16":
        from gen_adversarial_tpu.core.precision import cast_floating
        defense = cast_floating(defense)

    @jax.jit
    def step(defense, key, x):
        # scalar result: one tiny fetch forces the whole step
        return jnp.sum(eot_wrap(defense, eot_steps=EOT)(key, x))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 64, 64, 3).astype(np.float32))
    if BENCH_DTYPE == "bfloat16":
        x = x.astype(jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    # warmup (compile + one forced execution)
    float(step(defense, key, x))

    t0 = time.perf_counter()
    outs = []
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        outs.append(step(defense, sub, x))
    total = float(jnp.sum(jnp.stack(outs)))  # forces every step
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(total)

    img_s = BATCH / dt
    print(json.dumps({
        "metric": "eot32_nvae_defense_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_A100_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
