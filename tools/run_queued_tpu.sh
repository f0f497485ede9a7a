#!/bin/bash
# Runbook for the measurements queued while the TPU tunnel was down
# (ROADMAP.md "Queued TPU experiments").  Run with NOTHING else on the
# host (one process holds the TPU; concurrent CPU compiles contaminate
# timings - both observed, see ROADMAP "Known environment quirks").
#
#   bash tools/run_queued_tpu.sh          # logs to /tmp/tpu_queue/
#
# Steps are ordered most-valuable-first so a tunnel that dies mid-run
# still yields the headline refresh; each step is bounded by `timeout`
# so a hang cannot wedge the queue.  After it finishes: update
# BASELINE.md / README tables from the logs and commit (BENCH_LAST_GOOD
# is refreshed automatically by bench.py on the GAT_BENCH=all step).
set -u
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

if ! probe; then
  echo "TPU tunnel still down (backend init timed out); aborting." >&2
  exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" 2>&1 | tee "$LOG/$name.log" | tail -3
  echo "=== $name done rc=${PIPESTATUS[0]} ==="  # rc of the command, not tail
}

# 1. Full measured matrix incl. first cw_bf16 / deepfool_bf16 / fab_bf16
#    numbers and the apgd re-measure on a quiet host; refreshes
#    BENCH_LAST_GOOD.json with provenance.  Per-mode subprocesses with
#    per-mode timeouts (one GAT_BENCH=all process lost everything to the
#    outer timeout on 2026-08-18 — see tools/bench_each.py).
run bench_all 14400 python tools/bench_each.py

# 2. Gender eot-chunk-16 point (queued sweep extension; current peak is
#    b1 chunk-8 = 3.53 img/s bf16).
run gender_chunk16 1800 python tools/tune_bench.py --task gender \
    --batches 1 --chunks 8,16 --dtypes bfloat16

# 3. Gender blur-routing A/B: one-pass 2-D depthwise blur at high res
#    (GAT_BLUR_2D_MIN_H) vs the default separable path.  Equivalence is
#    test-pinned; this decides whether the knob becomes the default.
for h in 128 256 512; do
  run gender_blur2d_h$h 1800 env GAT_BLUR_2D_MIN_H=$h \
      python tools/tune_bench.py --task gender --batches 1 --chunks 8 \
      --dtypes bfloat16
done

# 4. Cars + flagship blur-2d spot checks (blur sites exist at 64-512px in
#    the cars path; flagship has none - control point).
run cars_blur2d_h128 1800 env GAT_BLUR_2D_MIN_H=128 \
    python tools/tune_bench.py --task cars --batches 16 --chunks 8 \
    --dtypes bfloat16

# 5. Clean apgd remat-policy re-measure (first attempt was contaminated
#    by a concurrent CPU compile; tools/tune_remat.py has the matrix).
run apgd_remat 2400 python tools/tune_remat.py --dtype bfloat16 --batches 8,16

echo "All queued steps attempted; logs in $LOG.  Next: refresh"
echo "BASELINE.md/README numbers from the logs and commit."
