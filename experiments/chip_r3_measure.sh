#!/bin/bash
# One-shot round-3 measurement sweep for a healthy-chip window.
# Runs the post-change numbers in priority order; each stage is
# timeout-bounded so a re-wedge doesn't hang the sweep.
# Usage: bash experiments/chip_r3_measure.sh [logfile]
set -u
LOG=${1:-/tmp/r3_measure.log}
cd "$(dirname "$0")/.."

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$LOG"
  return $rc
}

# health gate
run health 120 python -c \
  "import jax, jax.numpy as jnp; print(float(jax.device_get(jnp.ones(())+1.0)))" \
  || { echo "chip unhealthy, aborting" | tee -a "$LOG"; exit 1; }

# 1. kNN after the compacted backfill + at-cap certificate (was ~150 ms)
run knn 1500 python experiments/chip_hier_parts.py knn
# 2. full hierarchy (was ~750 ms)
run hier 1500 python experiments/chip_hier_parts.py hier
# 3. ScanNet-scale train step (was 3.06 s) — merged gather + kNN changes
run train 2400 env PART=train python experiments/chip_step_breakdown.py
# 4. headline bench (cache warm; program unchanged)
run bench 600 python bench.py
# 5. PCA part cost: gather oracle vs payload-carried components path
run pca 1500 python experiments/chip_hier_parts.py pca
run pcac 1500 python experiments/chip_hier_parts.py pcac
# 6. subsample part cost
run subsample 1500 python experiments/chip_hier_parts.py subsample
echo "SWEEP DONE $(date +%H:%M:%S)" | tee -a "$LOG"
