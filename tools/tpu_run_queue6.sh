#!/bin/bash
# Round-4 TPU measurement queue, part 6: a contrastive trajectory that can
# climb HIGH — instance-discrimination corpus.
#
# Parts 3/5 proved the tuned-recipe SimCLR leg learns (2-13x above chance,
# probe to 77.1%), but on the 10-class corpus contrastive top-1 is bounded
# by design: ~9.6 of every 96 batch negatives share the positive's hue
# class, capping batch-level instance discrimination near ~10%. This queue
# regenerates the SAME structured-JPEG family with 96 hue identities
# (--classes 96 --per-class 10): a 96-pair batch then has ~1 image per
# identity, so positive-pair retrieval among 2B views is genuinely
# learnable and ##Top-1 (contrastive) must climb far above the
# 1/(2*96) = 0.52% chance line if the framework learns instance
# discrimination — the reference's core SimCLR claim
# (/root/reference/Contrastive_Learning.py:867-868 computes exactly this
# metric from logits_ab).
#
# Then a 96-way linear probe on the frozen encoder (chance 1.04%).
#
# Usage: bash tools/tpu_run_queue6.sh [OUT]  (default /tmp/tpu_queue6_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue6_results.txt}
: > "$OUT"
DATA=/root/data/tiny96
WORK=/root/data/i96
CACHE=/dev/shm/i96_cache
mkdir -p "$WORK"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout -k 30 "$tmo" env "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# 0. connectivity gate (first compile on a fresh box measured 101 s)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. corpus: 96 hue identities x 10 train + 2 val structured JPEGs
[ -d "$DATA/train" ] || leg make_corpus 1800 python \
    tools/make_tiny_imagefolder.py "$DATA" \
    --classes 96 --per-class 10 --val-per-class 2 --size 640

# 2. SimCLR: the tuned recipe (hue-preserving augs, temp 0.5) on the
#    instance corpus — the leg whose ##Top-1 trajectory is the deliverable
leg simclr_instance 10000 python contrastive_learning.py "$DATA" \
    --dataset imagenet -a ResNet18 -b 96 -f 2 --epochs 40 \
    --optimizer adam --lr 0.001 --warmup-epochs 2 --temperature 0.5 \
    --color-augmentation 0 --gaussian-noise-augmentation 0 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK/simclr" -p 4
[ -f "$WORK/simclr/model_best.msgpack" ] || {
    echo "pretrain produced no checkpoint — aborting" | tee -a "$OUT"; exit 1; }

# 3. 96-way linear probe on the frozen encoder (chance 1.04%)
leg probe96 6000 python representation_evaluation.py \
    "$WORK/simclr/model_best.msgpack" "$DATA" --dataset imagenet \
    -a ResNet18 --num-classes 96 -b 96 -f 2 --epochs 15 --optimizer adam \
    --lr 0.001 --canvas-cache "$CACHE" --checkpoint-dir "$WORK/probe" -p 4

echo "QUEUE6 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Top-5|##Best|Saving" "$OUT" | tail -80
