#!/bin/bash
# Round-5 TPU measurement queue, part 11: per-op device profiles for the two
# bench paths that had numbers but no op-level understanding (VERDICT r4
# weak #4) — captions (6,725 img/s/chip in r4, slowest non-RL mode) and RLS
# (2,960, architectural justification but no profile) — plus a flagship
# re-run confirming the driver-default unroll=5 headline (VERDICT r4 #4).
#
# Each profile leg is ONE TPU client: bench.py emits the throughput JSON and
# (BENCH_TRACE) captures a jax.profiler trace of its first timing window;
# the summarize step parses the trace on the host afterwards (no TPU
# client). Results land in PERF.md per-op tables.
#
# Usage: bash tools/tpu_run_queue11.sh [OUT] (default /tmp/tpu_queue11_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue11_results.txt}
: > "$OUT"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  # 60 s grace: back-to-back TPU client attach deadlocks on a futex (CLAUDE.md)
  sleep 60
  timeout -k 30 "$tmo" env PYTHONUNBUFFERED=1 "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# no-TPU helper (trace parsing on host; no client, no grace gap needed)
host_leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout -k 30 "$tmo" env PYTHONUNBUFFERED=1 JAX_PLATFORMS=cpu "$@" >> "$OUT" 2>&1
  echo "--- $name rc=$? ---" | tee -a "$OUT"
}

# 0. connectivity gate (first compile on a fresh box measured up to ~540 s)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. captions profile: bench JSON + trace of window 1 (10 steps)
leg captions_bench_trace 2500 env BENCH_MODE=captions \
    BENCH_TRACE=/tmp/tr_captions python bench.py
host_leg captions_profile 600 python tools/profile_step.py \
    --summarize /tmp/tr_captions --steps 10 --top 25

# 2. RLS profile
leg rls_bench_trace 2500 env BENCH_MODE=rls \
    BENCH_TRACE=/tmp/tr_rls python bench.py
host_leg rls_profile 600 python tools/profile_step.py \
    --summarize /tmp/tr_rls --steps 10 --top 25

# 3. flagship confirmation with driver defaults (unroll=5 is now the
#    make_train_step TPU default — the bench measures what a driver user gets)
leg flagship_bench 2500 python bench.py

echo "QUEUE11 DONE $(date -u)" | tee -a "$OUT"
grep -E '"metric"|ms/step' "$OUT" | head -80
