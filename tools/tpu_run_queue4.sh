#!/bin/bash
# Round-4 TPU measurement queue, part 4 (after tpu_run_queue3.sh):
#   - bn_stat_micro with the FIXED tool (queue3 ran the pre-9ddf91f wall-
#     timing version whose output was dispatch-bound nonsense)
#   - host-path diagnostics: queue3 measured produce at 13.7-30.9 s/batch
#     (vs round 3's 95 ms) with the box burning ~90% SYSTEM time; these
#     legs separate disk-backed page faults (tmpfs cache + a dd read-rate
#     probe + the new MADV_WILLNEED readahead) from transport contention
#   - learning-run part 2 (DETR/RLS/captions driver-level TPU evidence;
#     needs the SimCLR checkpoint queue3's learning run produces)
# Same contract as tpu_run_queue.sh.
#
# Usage: bash tools/tpu_run_queue4.sh [OUT]  (default /tmp/tpu_queue4_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue4_results.txt}
: > "$OUT"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout -k 30 "$tmo" env "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# 0. connectivity gate
leg connectivity 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. BN-stat micro-bench, device-time edition
leg bn_stat_micro 1800 python tools/bn_stat_bench.py --iters 30

# 2. host-path diagnostics (no TPU contention in 2a/2b)
echo "=== disk_read_probe ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
U8=$(ls /root/data/bench_cache/*.u8 2>/dev/null | head -1)
if [ -n "$U8" ]; then
  # drop nothing; measure a cold-ish large sequential read rate
  timeout 120 dd if="$U8" of=/dev/null bs=1M count=512 >> "$OUT" 2>&1
fi
echo "--- disk_read_probe rc=$? ---" | tee -a "$OUT"

# 2b. pure-host produce probe: cache gather rate WITHOUT any TPU client
leg host_gather_probe 900 python - <<'EOF'
import numpy as np, time, glob, json, os
from multimodal_active_ai_tpu.data.loader import HostLoader
files = sorted(glob.glob("/tmp/maai_bench_jpegs_640px_1408/*.jpg"))
if not files:
    print("no corpus; skip"); raise SystemExit
ld = HostLoader(files, batch_size=128, canvas_size=640, prefetch=0,
                cache_dir="/root/data/bench_cache")
for _ in iter(ld):   # epoch over the (possibly partial) cache
    pass
print("gather-only epoch:", ld.stats_line())
EOF

# 2c. host path, cache on tmpfs (page-fault cost removed entirely)
leg bench_host_shm 3000 BENCH_INPUT=host \
    BENCH_CACHE=/dev/shm/bench_cache BENCH_DEV_PREFETCH=0 \
    BENCH_VERBOSE=1 python bench.py

# 2d. host path on disk again, now with the MADV_WILLNEED readahead
leg bench_host_willneed 3000 BENCH_INPUT=host \
    BENCH_CACHE=/root/data/bench_cache BENCH_DEV_PREFETCH=0 \
    BENCH_VERBOSE=1 python bench.py

# 3. learning-run part 3: a contrastive trajectory that CLIMBS (ResNet-18,
#    hue-preserving augs, temp 0.5 — the tuned convergence-test recipe
#    through the production driver + host path). Runs before part 2 because
#    it answers the round-4 verdict's "must climb above chance" directly.
echo "=== learning_run3 ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
timeout -k 30 16000 bash tools/tpu_learning_run3.sh >> "$OUT" 2>&1
echo "--- learning_run3 rc=$? ---" | tee -a "$OUT"

# 4. learning-run part 2: DETR / RLS / captions on the real TPU
echo "=== learning_run2 ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
timeout -k 30 18000 bash tools/tpu_learning_run2.sh >> "$OUT" 2>&1
echo "--- learning_run2 rc=$? ---" | tee -a "$OUT"

echo "QUEUE4 DONE $(date -u)" | tee -a "$OUT"
