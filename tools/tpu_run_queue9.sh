#!/bin/bash
# Round-4/5 TPU measurement queue, part 9: the RLS learned-saccade question,
# attempt 3 — queue8's geometry/curriculum (which were validated) with the
# variable the queue8 postmortem isolated: the pretrained frozen backbone.
#
# Evidence chain (PARITY.md "RLS learned-saccade question on hardware"):
# queue7 failed on geometry (cue un-foveatable at A=10); queue8 fixed the
# geometry and curriculum and STILL pinned CE at ln(4) for 500 updates; the
# two-arm CPU diagnostic (tools/rls_cue_diag.py) isolates whether the
# pretrained-frozen backbone (frozen stem/layer1 + FrozenBatchNorm +
# lr_backbone=1e-5, fit to full-canvas hue) is what blocks learning on the
# stripe-cued corpus. CHECK ITS VERDICT LINE BEFORE SPENDING THIS QUEUE —
# if "neither arm learns", redesign instead of rerunning.
#
# UPDATE after the round-4-close from-init runs (PARITY.md): a 30-step
# diag arm AND a 9-epoch (~90-update) driver slice from-init BOTH hovered
# at the ln(4) floor — the backbone is likely not the (only) blocker; raw
# cue signal strength at random fixations is the new prime suspect
# (~4.5 px hue sliver in the coarse glimpse, ~42% visibility, JPEG).
#
# Leg 1 (rls_wide_stripe): from-init on the 2×-wider cue ([480, 600):
#   ~9 px in the coarse glimpse, ~67% random visibility, still
#   A=10-foveatable) — the signal-strength knob. Run this FIRST.
# Leg 2 (rls_from_init): queue8 recipe, NO pretrained backbone, full 500
#   updates on the original fovea-stripe corpus — decides whether the
#   part-7 slice was just budget-starved.
# Leg 3 (rls_hot_backbone): queue8 recipe, pretrained backbone kept but
#   --lr_backbone 5e-4 (vs the 1e-5 ImageNet-scale default) so layer2-4
#   can adapt the full-hue features to the stripe task. Runs only if the
#   queue6 encoder checkpoint still exists on this box; lowest priority.
#
# Usage: bash tools/tpu_run_queue9.sh [OUT]  (default /tmp/tpu_queue9_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue9_results.txt}
: > "$OUT"
DATA=/root/data/cue8
DATAW=/root/data/cue9w
WORK0=/root/data/cue9_rls_wide
WORK1=/root/data/cue9_rls_init
WORK2=/root/data/cue9_rls_hotbb
CACHE=/dev/shm/cue8_cache
CACHEW=/dev/shm/cue9w_cache
BB=/root/data/i96/simclr/model_best.msgpack
mkdir -p "$WORK0" "$WORK1" "$WORK2"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  # PYTHONUNBUFFERED: epoch lines must land in $OUT live (block-buffered
  # stdout hid a 30-min hang entirely). sleep 60 first: attaching a new
  # TPU client the same second the previous one exits deadlocked on a
  # futex with zero tunnel traffic (stale client slot on the server) —
  # observed on this box 2026-08-19; a ~60 s grace gap avoids it.
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

# 1. corpus (regenerate if the box was recycled)
[ -d "$DATA/train" ] || leg make_corpus 1800 python \
    tools/make_tiny_imagefolder.py "$DATA" \
    --classes 4 --per-class 120 --val-per-class 24 --size 640 \
    --cue fovea-stripe

# 1b. wide-stripe corpus for leg 1
[ -d "$DATAW/train" ] || leg make_corpus_wide 1800 python \
    tools/make_tiny_imagefolder.py "$DATAW" \
    --classes 4 --per-class 120 --val-per-class 24 --size 640 \
    --cue wide-stripe

# 2. leg 1: signal-strength test — from-init on the 2×-wider cue
leg rls_wide_stripe 10000 python detr_image_classification_rls.py none "$DATAW" \
    --dataset imagenet --backbone ResNet18 --num-classes 4 -b 48 -f 3 \
    --epochs 50 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHEW" --checkpoint-dir "$WORK0" -p 4

# 3. leg 2: from-init on the original fovea-stripe corpus, full budget
#    (backbone path 'none' falls through in load_backbone_into_detr with a
#    printed notice)
leg rls_from_init 10000 python detr_image_classification_rls.py none "$DATA" \
    --dataset imagenet --backbone ResNet18 --num-classes 4 -b 48 -f 3 \
    --epochs 50 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK1" -p 4

# 4. leg 3: pretrained backbone with a hot backbone lr (only if the queue6
#    encoder survived on this box — rerun tools/tpu_run_queue6.sh otherwise)
if [ -f "$BB" ]; then
  leg rls_hot_backbone 10000 python detr_image_classification_rls.py "$BB" "$DATA" \
      --dataset imagenet --backbone ResNet18 --num-classes 4 -b 48 -f 3 \
      --epochs 50 --lr 5e-4 --lr_backbone 5e-4 --gamma 0.0 \
      --num-of-actions 10 -dqnb 48 \
      --canvas-cache "$CACHE" --checkpoint-dir "$WORK2" -p 4
else
  echo "skipping rls_hot_backbone: no $BB on this box" | tee -a "$OUT"
fi

echo "QUEUE9 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Policy Top-1|##Best" "$OUT" | tail -90
