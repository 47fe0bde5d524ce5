#!/bin/bash
# bf16 ScanNet-scale compile blowup bisect (VERDICT r4 #2).
# r3 measured: f32 165 s compile, bf16 >9 min at N=131072 (einsum-path
# era note; re-measured under the fused path here).  Each config runs in
# its own process so a wedged compile can't take the rest down.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/bf16_bisect.log}
echo "=== bf16 compile bisect $(date) ===" | tee -a "$LOG"
run() {
  desc="$1"; shift
  echo "--- $desc" | tee -a "$LOG"
  timeout 1500 env "$@" python experiments/chip_scannet_compile.py 2>&1 |
    tail -3 | tee -a "$LOG"
  echo "rc=$? ($desc)" | tee -a "$LOG"
}
# size scaling first (cheap), then the full-size pair
run "bf16 N=16k"   CDT=bfloat16 N=16384
run "f32  N=131k"  N=131072
run "bf16 N=131k"  CDT=bfloat16 N=131072
run "bf16 N=131k no-remat" CDT=bfloat16 N=131072 REMAT=0
