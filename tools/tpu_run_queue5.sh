#!/bin/bash
# Round-4 TPU measurement queue, part 5: the captions-probe learning leg,
# re-run on CORRELATED image/caption pairs (--dataset imagefolder).
#
# Queue4's captions leg ran --dataset synthetic, whose labels are drawn
# independently of pixel content — retrieval was unlearnable by construction
# and pinned at exact chance (postmortem in PARITY.md). This queue closes
# that recorded promise: captions templated from the class directories of
# the real JPEG corpus, fed through the production host path.
#
# The box was recycled between sessions (corpus + checkpoints under
# /root/data are gone), so the queue regenerates the corpus and a
# tuned-recipe ResNet-18 encoder (the part-3 recipe, shortened — the
# captions probe freezes the encoder; its own learning signal is the
# retrieval trajectory) before the captions leg.
#
# Usage: bash tools/tpu_run_queue5.sh [OUT]  (default /tmp/tpu_queue5_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue5_results.txt}
: > "$OUT"
DATA=/root/data/tiny10
WORK=/root/data/lr18
CACHE=/dev/shm/lr18_cache
mkdir -p "$WORK"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout -k 30 "$tmo" env "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

# 0. connectivity gate (first compile on a fresh box measured 101 s —
#    the tunnel warms up slowly; 180 s false-negatived once)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. corpus (CPU-only; 10 hue classes x 96 train + 16 val structured JPEGs)
[ -d "$DATA/train" ] || leg make_corpus 1800 python \
    tools/make_tiny_imagefolder.py "$DATA" \
    --classes 10 --per-class 96 --val-per-class 16 --size 640

# 2. encoder: the part-3 tuned recipe (hue-preserving augs, temp 0.5),
#    shortened to 20 epochs — enough for a well-above-chance encoder
leg simclr_pretrain 6000 python contrastive_learning.py "$DATA" \
    --dataset imagenet -a ResNet18 -b 96 -f 2 --epochs 20 \
    --optimizer adam --lr 0.001 --warmup-epochs 2 --temperature 0.5 \
    --color-augmentation 0 --gaussian-noise-augmentation 0 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK/simclr" -p 4
[ -f "$WORK/simclr/model_best.msgpack" ] || {
    echo "pretrain produced no checkpoint — aborting" | tee -a "$OUT"; exit 1; }

# 3. the captions leg: imagefolder captions, real JPEGs, frozen encoder
leg captions_imagefolder 5400 python coco_captions_probe.py \
    "$WORK/simclr/model_best.msgpack" "$DATA" \
    --dataset imagefolder -a ResNet18 -b 64 -f 2 --epochs 12 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK/captions" -p 4

echo "QUEUE5 DONE $(date -u)" | tee -a "$OUT"
grep -E "##I2T|##T2I|##Vocab|caption vocabulary" "$OUT" | tail -60
