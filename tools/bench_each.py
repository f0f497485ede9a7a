"""Run every bench.py mode in its OWN subprocess with a per-mode timeout,
then merge the results into the headline JSON shape (flagship_bf16 head +
`extra` per mode) and refresh BENCH_LAST_GOOD.json.

Why not `GAT_BENCH=all`?  One process running 11 modes back-to-back is an
all-or-nothing bet: the 2026-08-18 queued run hit the outer 3600s timeout
(fresh compiles for the reworked attack programs) and lost EVERY
measurement.  Here each mode is isolated — a timeout or OOM costs only that
mode, every completed mode is durably logged, and the merge runs over
whatever finished.

Usage:
  python tools/bench_each.py                       # all modes
  python tools/bench_each.py --modes apgd_bf16,cw_bf16
  python tools/bench_each.py --timeout 1800 --out /tmp/bench_each
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

DEFAULT_MODES = [
    # headline first so a mid-run death still refreshes it
    "flagship_bf16", "flagship_f32",
    "apgd_bf16", "apgd_f32", "cw_bf16", "deepfool_bf16", "fab_bf16",
    "cars_bf16", "cars_f32", "gender_bf16", "gender_f32",
]

BASELINE_A100_IMG_S = 25.0  # keep in sync with bench.py


def run_mode(mode: str, timeout: int, outdir: Path):
    env = dict(os.environ, GAT_BENCH=mode, GAT_BENCH_NO_LAST_GOOD="1")
    log = outdir / f"{mode}.log"
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        log.write_text(f"TIMEOUT after {timeout}s\n")
        return {"error": f"timeout after {timeout}s"}
    log.write_text(r.stdout + "\n--- stderr ---\n" + r.stderr)
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                d["wall_s"] = round(time.time() - t0, 1)
                return d
            except json.JSONDecodeError:
                continue
    return {"error": f"no JSON line (rc={r.returncode}); see {log}"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default=",".join(DEFAULT_MODES))
    p.add_argument("--timeout", type=int, default=1500)
    p.add_argument("--out", default="/tmp/bench_each")
    p.add_argument("--no-last-good", action="store_true",
                   help="don't refresh BENCH_LAST_GOOD.json")
    args = p.parse_args()

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    results = {}
    for mode in args.modes.split(","):
        print(f"=== {mode} ({time.strftime('%H:%M:%S')}) ===", flush=True)
        results[mode] = run_mode(mode, args.timeout, outdir)
        print(json.dumps(results[mode]), flush=True)
        (outdir / "merged.json").write_text(json.dumps(results, indent=1))

    head = results.get("flagship_bf16", {})
    if head.get("value") is not None:
        extra = {k: v for k, v in results.items() if k != "flagship_bf16"}
        merged = dict(head,
                      vs_baseline=round(head["value"] / BASELINE_A100_IMG_S, 2),
                      extra=extra,
                      measured_at=time.strftime("%Y-%m-%d %H:%M"),
                      provenance="tools/bench_each.py per-mode subprocesses")
        print(json.dumps(merged))
        if not args.no_last_good:
            (REPO / "BENCH_LAST_GOOD.json").write_text(
                json.dumps(merged, indent=1))
            print("BENCH_LAST_GOOD.json refreshed", file=sys.stderr)
    else:
        print(json.dumps(results))
        print("flagship_bf16 missing; BENCH_LAST_GOOD.json NOT refreshed",
              file=sys.stderr)


if __name__ == "__main__":
    main()
