#!/bin/bash
# Round-4/5 TPU measurement queue, part 10: the RLS learned-saccade question,
# attempt 4 — the queue9 recipe with the two postmortem fixes actually
# implemented (queue9's were written up but not coded):
#
#   1. from-scratch runs (`load_backbone_into_detr` finds no checkpoint) now
#      label EVERY parameter 'head' — full --lr everywhere. Queue9 leg 1 and
#      both from-init diagnostics trained a transformer readout on a FROZEN
#      RANDOM-INIT CNN (stem+layer1 at zero lr, layer2-4 at 1e-5) because
#      make_detr_optimizer applied the pretrained param groups
#      unconditionally; descending exactly TO the ln(4) floor and stopping
#      was the expected behavior of that program.
#   2. --backbone-norm group: GroupNorm backbone for from-scratch runs —
#      stats-less FrozenBN on a random init normalizes nothing.
#
# Pre-spend gate (already run on CPU, 2026-08-20, bench_logs_r04_part10):
# tools/cue_linear_probe.py on the wide-stripe corpus shows the label IS
# linearly decodable from random-fixation production glimpses (val per-fix
# 0.70, val img-mean 0.94, oracle ~1.0 vs 0.25 chance) — signal strength is
# sufficient; any remaining failure is the model/optimizer, which is what
# this queue now tests with the fixes in place.
#
# Leg 1 (rls_attempt4): from-init + --backbone-norm group on the wide-stripe
#   corpus, full 500 updates. Success = CE below the ln(4)=1.386 floor and
#   ##Top-1 above 25; the scientific payoff is ##Policy Top-1 vs ##Top-1
#   once the classifier is off the floor.
#
# Usage: bash tools/tpu_run_queue10.sh [OUT] (default /tmp/tpu_queue10_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue10_results.txt}
: > "$OUT"
DATAW=/root/data/cue9w
WORK=/root/data/cue10_rls_a4
CACHEW=/dev/shm/cue9w_cache
mkdir -p "$WORK"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  # sleep 60 first: attaching a new TPU client the same second the previous
  # one exits deadlocks on a futex (CLAUDE.md); PYTHONUNBUFFERED so epoch
  # lines land live.
  sleep 60
  timeout -k 30 "$tmo" env PYTHONUNBUFFERED=1 "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# 0. connectivity gate (first compile on a fresh box measured up to ~540 s)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. wide-stripe corpus (regenerate if the box was recycled)
[ -d "$DATAW/train" ] || leg make_corpus_wide 1800 python \
    tools/make_tiny_imagefolder.py "$DATAW" \
    --classes 4 --per-class 120 --val-per-class 24 --size 640 \
    --cue wide-stripe

# 2. leg 1: attempt 4 — from-init, GroupNorm backbone, wide-stripe corpus
leg rls_attempt4 10000 python detr_image_classification_rls.py none "$DATAW" \
    --dataset imagenet --backbone ResNet18 --backbone-norm group \
    --num-classes 4 -b 48 -f 3 \
    --epochs 50 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHEW" --checkpoint-dir "$WORK" -p 4

echo "QUEUE10 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Policy Top-1|##Best" "$OUT" | tail -60
