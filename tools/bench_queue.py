"""Serialized TPU bench queue: run GAT_BENCH modes one process at a time,
probing tunnel health between items (big attack-graph compiles have killed
the remote-compile relay before — see .claude/skills/verify/SKILL.md), and
append each outcome to tools/bench_queue_results.jsonl.

Usage: python tools/bench_queue.py [mode ...]    (defaults to the round-3
measurement queue).  Env knobs (GAT_BLUR_2D_MIN_H etc.) can be passed per
item as mode@KEY=V,KEY=V.
"""

import json
import os
import subprocess
import sys
import time

OUT = os.path.join(os.path.dirname(__file__), "bench_queue_results.jsonl")


def probe(timeout_s: int = 90) -> bool:
    try:
        return subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    modes = sys.argv[1:] or ["apgd_bf16", "deepfool_bf16", "gender_bf16",
                             "cars_bf16", "cw_bf16", "fab_bf16"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for item in modes:
        mode, _, knobs = item.partition("@")
        extra = dict(kv.split("=", 1) for kv in knobs.split(",") if kv)
        for i in range(30):  # wait out a dead tunnel, up to ~30 min
            if probe():
                break
            print(f"[queue] tunnel down, waiting ({i})", flush=True)
            time.sleep(60)
        else:
            print(f"[queue] tunnel never came back; stopping before {item}",
                  flush=True)
            break
        env = dict(os.environ, GAT_BENCH_WORKER="1", GAT_BENCH=mode,
                   GAT_BENCH_NO_LAST_GOOD="1", **extra)
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "bench.py"], env=env,
                               timeout=3600, capture_output=True, text=True,
                               cwd=repo)
            lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            rec = {"item": item, "rc": r.returncode,
                   "secs": round(time.time() - t0),
                   "result": json.loads(lines[-1]) if lines else None}
            if r.returncode != 0:
                rec["err_tail"] = r.stderr[-500:]
        except subprocess.TimeoutExpired:
            rec = {"item": item, "rc": "timeout",
                   "secs": round(time.time() - t0)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
