#!/bin/bash
# Round-5 TPU queue, part 12: RLS learned-saccade attempt 5 — two legs
# attacking the two hypotheses queue10's clean negative leaves open.
#
# Context: queue10 (attempt 4) ran the CORRECT from-init configuration for
# the first time (full-lr everywhere + GroupNorm backbone — the queue9
# optimizer bug is fixed and tests/test_frozen_params_guard.py proves every
# parameter trains) on the wide-stripe corpus, and CE still settled at the
# ln(4) floor over 500 updates. tools/cue_linear_probe.py proved the label
# IS linearly decodable from random-fixation glimpses (val per-fix 0.70,
# img-mean 0.94), so the remaining suspects are:
#   (1) DATA/BUDGET: 480 train images × 500 updates is too little for a
#       from-scratch DETR (the probe that worked was a linear model on
#       standardized features, full-batch, 400 steps).
#   (2) FEATURES: a from-scratch CNN never develops stripe-hue-sensitive
#       features from CE-at-chance gradients; the reference's operating
#       mode is a PRETRAINED encoder — but queue8's encoder was pretrained
#       on the full-canvas hue corpus (out of distribution for the stripe).
#
# Leg 1 -> (1): 4x the corpus (4 classes × 480 train), 35 epochs = 1400
#   updates, from-init + GroupNorm.
# Leg 2 -> (2): SimCLR-pretrain the encoder ON the cued corpus itself
#   (hue-preserving recipe that climbed on the hue corpora), then RLS with
#   the pretrained frozen-BN backbone at --lr_backbone 5e-4 (queue9 leg-3's
#   never-spent configuration, now with in-distribution features).
#
# Success for either leg = CE below 1.386 and ##Top-1 > 25; then compare
# ##Policy Top-1 vs ##Top-1 (the learned-saccade question itself).
#
# Usage: bash tools/tpu_run_queue12.sh [OUT]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue12_results.txt}
: > "$OUT"
DATA_BIG=/root/data/cue12big
DATA_W=/root/data/cue9w
CACHE_BIG=/dev/shm/cue12big_cache
CACHE_W=/dev/shm/cue9w_cache
WORK=/root/data/cue12
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

# 0. connectivity gate
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 0b. re-bench the captions + probe paths after the batched fixation
#     collection (extract_features/collect_glimpse_sequence now run all F
#     fixations as ONE retina invocation + ONE F·B encoder forward; the
#     queue11 profile showed the old lax.map spent 24.8% of the captions
#     step in scan copies)
leg captions_rebench 2000 env BENCH_MODE=captions python bench.py
leg probe_rebench 2000 env BENCH_MODE=probe python bench.py

# 1. big wide-stripe corpus (host-side generation, no TPU client needed,
#    but serialized here anyway for the 1-core box)
[ -d "$DATA_BIG/train" ] || leg make_corpus_big 3600 env JAX_PLATFORMS=cpu \
    python tools/make_tiny_imagefolder.py "$DATA_BIG" \
    --classes 4 --per-class 480 --val-per-class 24 --size 640 \
    --cue wide-stripe

# 2. leg 1: from-init + GroupNorm on 4x data, 1400 updates
leg rls_attempt5_bigdata 10000 python detr_image_classification_rls.py \
    none "$DATA_BIG" \
    --dataset imagenet --backbone ResNet18 --backbone-norm group \
    --num-classes 4 -b 48 -f 3 \
    --epochs 35 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHE_BIG" --checkpoint-dir "$WORK/bigdata" -p 4

# 3. leg 2a: SimCLR pretrain ON the cued corpus (hue-preserving recipe)
mkdir -p "$WORK/simclr"
leg cued_simclr 3600 python contrastive_learning.py "$DATA_W" \
    --dataset imagenet -a ResNet18 -b 96 -f 2 --epochs 30 \
    --optimizer adam --lr 1e-3 --warmup-epochs 2 --temperature 0.5 \
    --color-augmentation 0 --gaussian-noise-augmentation 0 \
    --canvas-cache "$CACHE_W" --checkpoint-dir "$WORK/simclr" -p 2

# 4. leg 2b: RLS with the cued-pretrained frozen backbone, hot backbone lr
leg rls_attempt5_cued_pretrain 8000 python detr_image_classification_rls.py \
    "$WORK/simclr/model_best.msgpack" "$DATA_W" \
    --dataset imagenet --backbone ResNet18 \
    --num-classes 4 -b 48 -f 3 --lr_backbone 5e-4 \
    --epochs 50 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHE_W" --checkpoint-dir "$WORK/cued" -p 4

echo "QUEUE12 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Policy Top-1|##Best" "$OUT" | tail -40
