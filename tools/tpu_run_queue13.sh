#!/bin/bash
# Round-5 TPU queue, part 13: the isolating control for the queue10/12
# learned-saccade negatives — the PLAIN DETR driver (random saccades, no
# RL machinery at all) on the same wide-stripe corpus, from-init +
# GroupNorm, same lr/budget as the RLS attempts.
#
# Interpretation matrix (with tools/cue_linear_probe.py's result that a
# LINEAR model on the same random-fixation glimpses reaches 0.94 img-mean
# top-1):
#   - plain DETR learns  -> the blocker is specific to the RLS driver.
#   - plain DETR also floors -> the blocker is the DETR pathway
#     (from-scratch CNN + transformer readout) on sparse-cue images,
#     shared by both drivers and upstream of the learned-saccade science.
#
# Usage: bash tools/tpu_run_queue13.sh [OUT]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue13_results.txt}
: > "$OUT"
DATA_W=/root/data/cue9w
CACHE_W=/dev/shm/cue9w_cache
WORK=/root/data/cue13
mkdir -p "$WORK"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  sleep 60   # back-to-back TPU client attach deadlocks on a futex (CLAUDE.md)
  timeout -k 30 "$tmo" env PYTHONUNBUFFERED=1 "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

leg detr_control 4000 python detr_image_classification.py none "$DATA_W" \
    --dataset imagenet --backbone ResNet18 --backbone-norm group \
    --num-classes 4 -b 48 -f 3 --epochs 50 --lr 5e-4 \
    --canvas-cache "$CACHE_W" --checkpoint-dir "$WORK" -p 4

echo "QUEUE13 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Best" "$OUT" | tail -20
