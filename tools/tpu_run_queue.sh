#!/bin/bash
# Round-4 TPU measurement queue. Runs the pending TPU benches sequentially
# (ONE client at a time — CLAUDE.md) and appends one labeled JSON/log line
# per run to $OUT. Each leg gets its own timeout so a wedged tunnel can't
# eat the whole queue; a leg that times out is recorded as such.
#
# Usage: bash tools/tpu_run_queue.sh [OUT]   (default /tmp/tpu_queue_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue_results.txt}
: > "$OUT"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  # -k: a wedged TPU client can ignore SIGTERM; force SIGKILL so one hung
  # leg can't eat the queue
  timeout -k 30 "$tmo" env "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# ONE TPU client at a time (CLAUDE.md): surface any candidate stray clients
# for the operator — never auto-kill by pattern.
strays=$(ps -eo pid,etime,cmd | grep -E "python" | grep -vE "grep|$$") || true
if [ -n "$strays" ]; then
  echo "WARNING: python processes running — a stray TPU client will wedge every leg:" | tee -a "$OUT"
  echo "$strays" | tee -a "$OUT"
fi

# 0. connectivity gate: a trivial program must run before anything long
leg connectivity 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. default-mode headline (post-round-4-changes regression check)
leg bench_default 2400 BENCH_VERBOSE=1 BENCH_MFU=1 python bench.py

# 2-3. the BN-stat lever, both implementations
leg bench_stats_pallas 2400 BENCH_STATS=pallas BENCH_VERBOSE=1 python bench.py
leg bench_stats_gram 2400 BENCH_STATS=gram BENCH_VERBOSE=1 python bench.py

# 4. the one-pass stat kernel swap (measured-or-rejected entry)
leg bench_norm_bn_fused 2400 BENCH_NORM=bn_fused python bench.py

# 4b. combined: 1x1 stats from the conv epilogue + 3x3 stats one-pass
leg bench_stats_pallas_norm_fused 2400 BENCH_STATS=pallas \
    BENCH_NORM=bn_fused python bench.py

# 4c. bf16 Adam first moment (the 12.3 ms/step optimizer-update HBM stream)
leg bench_adam_mu_bf16 2400 BENCH_ADAM_MU=bfloat16 python bench.py

# 5. BN-stat micro-bench at the hot shapes
leg bn_stat_micro 1800 python tools/bn_stat_bench.py --iters 30

# 5b. end-to-end host path with the decode-once cache + 2-deep device
# prefetch (verdict #7 done-when: does H2D overlap help on this box?)
leg bench_host_prefetch 3000 BENCH_INPUT=host \
    BENCH_CACHE=/root/data/bench_cache BENCH_DEV_PREFETCH=2 \
    BENCH_VERBOSE=1 python bench.py
leg bench_host_noprefetch 3000 BENCH_INPUT=host \
    BENCH_CACHE=/root/data/bench_cache BENCH_DEV_PREFETCH=0 \
    BENCH_VERBOSE=1 python bench.py

# 6-9. per-driver throughput rows (PERF.md five-row table; detr re-run so
# all five rows come from the same session)
leg bench_mode_detr 2400 BENCH_MODE=detr python bench.py
leg bench_mode_probe 2400 BENCH_MODE=probe python bench.py
leg bench_mode_rls 3600 BENCH_MODE=rls python bench.py
leg bench_mode_captions 2400 BENCH_MODE=captions python bench.py

echo "QUEUE DONE $(date -u)" | tee -a "$OUT"
