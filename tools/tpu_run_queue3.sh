#!/bin/bash
# Round-4 TPU measurement queue, part 3 (resume): part 2 re-measured the
# headline clean (8,794.33 img/s/chip, logged in bench_logs_r04_part2.txt)
# then died at bench_adam_mu_bf16 when the driving session ended. This
# script runs the remaining legs only. Same contract as tpu_run_queue.sh.
#
# Usage: bash tools/tpu_run_queue3.sh [OUT]  (default /tmp/tpu_queue3_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue3_results.txt}
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

# 1. bf16 Adam first moment (killed mid-leg twice now)
leg bench_adam_mu_bf16 2400 BENCH_ADAM_MU=bfloat16 python bench.py

# 2. BN-stat micro-bench at the hot shapes
leg bn_stat_micro 1800 python tools/bn_stat_bench.py --iters 30

# 3. host path with decode-once cache, with and without 2-deep device prefetch
leg bench_host_prefetch 3000 BENCH_INPUT=host \
    BENCH_CACHE=/root/data/bench_cache BENCH_DEV_PREFETCH=2 \
    BENCH_VERBOSE=1 python bench.py
leg bench_host_noprefetch 3000 BENCH_INPUT=host \
    BENCH_CACHE=/root/data/bench_cache BENCH_DEV_PREFETCH=0 \
    BENCH_VERBOSE=1 python bench.py

# 4-7. per-driver throughput rows (PERF.md five-row table)
leg bench_mode_detr 2400 BENCH_MODE=detr python bench.py
leg bench_mode_probe 2400 BENCH_MODE=probe python bench.py
leg bench_mode_rls 3600 BENCH_MODE=rls python bench.py
leg bench_mode_captions 2400 BENCH_MODE=captions python bench.py

echo "QUEUE3 BENCHES DONE $(date -u)" | tee -a "$OUT"

# 8. driver-level learning run (verdict #2): SimCLR pretrain + linear probe
# over the structured JPEG corpus, through the production host path.
echo "=== learning_run ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
timeout -k 30 10800 bash tools/tpu_learning_run.sh >> "$OUT" 2>&1
echo "--- learning_run rc=$? ---" | tee -a "$OUT"

echo "QUEUE3 DONE $(date -u)" | tee -a "$OUT"
