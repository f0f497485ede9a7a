#!/bin/bash
# Retry wrapper for tools/efficacy_run.py: the C&W/AutoAttack programs
# through the EoT purifier intermittently kernel-fault the TPU worker
# (2026-08-21); every stage is checkpointed (per-attack, per-batch), so
# re-running loses at most one batch per fault.  Bounded retries; a short
# cool-down lets the TPU worker restart cleanly.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 "${GAT_EFFICACY_RETRIES:-8}"); do
  echo "=== efficacy attempt $i ($(date -u +%H:%M:%SZ)) ==="
  python tools/efficacy_run.py && { echo "=== efficacy complete ==="; exit 0; }
  echo "=== attempt $i failed (rc=$?); cooling down 60s ==="
  sleep 60
done
echo "=== efficacy exhausted retries ===" >&2
exit 1
