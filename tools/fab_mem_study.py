"""FAB backward-residency study (VERDICT r4 weak#2/#3): WHAT holds the
memory when the 100-cotangent class jacobian runs at batch > 2?

Round 4 measured: FAB b8/b16 fault the TPU worker even with cotangent
chunking, and chunking is slightly negative at b2 — but no artifact says
WHY.  This tool compiles (never runs) the FAB attack step and an isolated
class_grads program at a grid of (batch, cotangent_chunk, remat_policy)
points and prints XLA's memory_analysis — peak temp allocation tells us
whether chunking actually reduces live backward memory, and the policy
axis tells us whether the defense-level jax.checkpoint policy (the
r4-suggested lever) moves it.

Usage:  python tools/fab_mem_study.py          # full grid (TPU compiles)
        GAT_MEM_POINTS=b2c0,b8c10 python ...   # subset
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

EOT = 32


def _defense(policy):
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.core.precision import defense_astype
    d = _flagship().replace(remat=True, remat_policy=policy)
    return defense_astype(d)


def _mem(compiled):
    ma = compiled.memory_analysis()
    return {k: round(getattr(ma, k) / 2**30, 3)
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes")}


def study_point(tag, batch, cot, policy, program):
    from gen_adversarial_tpu.defenses.eot import eot_wrap
    from gen_adversarial_tpu.attacks.fab import fab_attack
    from gen_adversarial_tpu.attacks.utils import class_grads

    defense = _defense(policy)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 64, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 100, batch))

    if program == "fab":
        def step(defense, x, y, key):
            net = eot_wrap(defense, eot_steps=EOT, chunk=8)
            succ, bound, adv = fab_attack(key, net, x, y, n_iter=2,
                                          cotangent_chunk=cot)
            return jnp.sum(jnp.where(jnp.isfinite(bound), bound, 0.0)) \
                + jnp.sum(adv)
    else:  # isolated class_grads: one 100-cotangent jacobian, no FAB loop
        def step(defense, x, y, key):
            net = eot_wrap(defense, eot_steps=EOT, chunk=8)
            logits, grads = class_grads(net, key, x, cotangent_chunk=cot)
            return jnp.sum(logits) + jnp.sum(grads)

    t0 = time.time()
    compiled = jax.jit(step).lower(defense, x, y,
                                   jax.random.PRNGKey(0)).compile()
    mem = _mem(compiled)
    print(f"[{tag}] {program} batch={batch} cot={cot} policy={policy}: "
          f"temp {mem['temp_size_in_bytes']:.2f}G "
          f"args {mem['argument_size_in_bytes']:.2f}G "
          f"out {mem['output_size_in_bytes']:.3f}G "
          f"(compile {time.time() - t0:.0f}s)", flush=True)
    return mem


POINTS = {
    # tag: (batch, cotangent_chunk, remat_policy, program)
    "b2c0": (2, None, None, "fab"),                    # r4 operating point
    "b8c0": (8, None, None, "fab"),                    # the faulting point
    "b8c10": (8, 10, None, "fab"),                     # chunked (still bad?)
    "b8c10_dots": (8, 10, "dots_with_no_batch_dims_saveable", "fab"),
    "cg_b8c0": (8, None, None, "class_grads"),         # isolate from loop
    "cg_b8c10": (8, 10, None, "class_grads"),
    "cg_b8c10_dots": (8, 10, "dots_with_no_batch_dims_saveable",
                      "class_grads"),
}


def main():
    sel = os.environ.get("GAT_MEM_POINTS")
    names = sel.split(",") if sel else list(POINTS)
    results = {}
    for name in names:
        try:
            results[name] = study_point(name, *POINTS[name])
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    import json
    out = Path("/root/repo/.efficacy") / "fab_mem_study.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
