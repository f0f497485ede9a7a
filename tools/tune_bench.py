"""Sweep bench knobs (batch, EoT chunk, dtype) for one pipeline and print
an img/s table — the measurement tool behind the operating points hardcoded
in bench.py (batch/chunk per task were chosen by earlier manual runs; this
makes the search repeatable).

Usage:
  python tools/tune_bench.py --task flagship --dtypes bfloat16 \
      --batches 8,16,32 --chunks none
  python tools/tune_bench.py --task gender --dtypes float32,bfloat16 \
      --batches 1,2 --chunks 2,4,8

Each point times the EoT-32 defense forward exactly like bench.py (scalar
fetch over all outputs to defeat dropped-output cancellation); OOMs are
caught and reported as "oom" so a sweep survives infeasible corners.
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(task: str, dtype: str):
    import bench

    if task == "flagship":
        from __graft_entry__ import _flagship
        defense = _flagship()
    else:
        defense = bench._synth_mlvgm_defense(task)
    if dtype == "bfloat16":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense)
    return defense


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="flagship",
                   choices=["flagship", "gender", "cars"])
    p.add_argument("--dtypes", default="bfloat16")
    p.add_argument("--batches", default="8,16")
    p.add_argument("--chunks", default="none",
                   help="comma list; 'none' = unchunked EoT vmap")
    p.add_argument("--scan", default="8",
                   help="comma list of scan_steps (1 = no scan)")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import bench

    size = {"flagship": 64, "gender": 256, "cars": 128}[args.task]
    rows = []
    for dtype in args.dtypes.split(","):
        defense = build(args.task, dtype)
        for b in (int(x) for x in args.batches.split(",")):
            for ch in args.chunks.split(","):
                chunk = None if ch == "none" else int(ch)
                for sc in (int(x) for x in args.scan.split(",")):
                    try:
                        v, _ = bench._forward_bench(defense, batch=b,
                                                    size=size,
                                                    iters=args.iters,
                                                    eot_chunk=chunk,
                                                    scan_steps=sc,
                                                    dtype=dtype)
                        rows.append((dtype, b, ch, sc, f"{v:.2f}"))
                    except Exception as e:
                        # HBM exhaustion surfaces two ways on this backend:
                        # RESOURCE_EXHAUSTED at alloc, or an INTERNAL
                        # remote-compile 500 whose text carries the
                        # "Total hbm usage" breakdown.
                        kind = ("oom" if ("RESOURCE_EXHAUSTED" in str(e)
                                          or "hbm usage" in str(e))
                                else f"{type(e).__name__}")
                        rows.append((dtype, b, ch, sc, kind))
                    print(f"{args.task:9s} {rows[-1][0]:9s} "
                          f"batch={rows[-1][1]:<3} chunk={rows[-1][2]:4s} "
                          f"scan={rows[-1][3]:<2} -> {rows[-1][4]} img/s",
                          flush=True)

    print("\ndtype     batch chunk scan img/s")
    for d, b, ch, sc, v in rows:
        print(f"{d:9s} {b:<5} {ch:5s} {sc:<4} {v}")


if __name__ == "__main__":
    main()
