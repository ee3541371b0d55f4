#!/bin/bash
# Round-4 TPU measurement queue, part 8: the RLS learned-saccade question on
# REAL JPEGs, attempt 2 — queue7's negative result re-run with the postmortem
# fixes (PARITY.md "attempt 1"):
#
#   1. A=10 action grid (--num-of-actions 10, the proven CPU test's scale)
#      instead of the 100-way default: each Q-head isolates 1-of-10 bins
#      from the Bernoulli reward instead of 1-of-100.
#   2. Cue moved to where the A=10 grid can foveate: --cue fovea-stripe puts
#      the class hue at x in [540, 600) of the 640 canvas, centered on the
#      fovea of fix = 9/10 (x in [549, 579]). Random-fixation visibility:
#      the coarsest 400px window sees the stripe iff fix_x > 0.583 (~42%/
#      glimpse), so random saccades cap near 0.66*100+0.34*25 ~ 74% top-1
#      at F=3/num_fixs=2 while a learned fix_x -> 0.9 policy foveates every
#      sample -> expected ##Policy Top-1 > ##Top-1 separation ~25 pts.
#   3. Curriculum restored: default eps decay (0.9 -> 0.05, tau 10 epochs)
#      keeps exploration high while the classifier learns (queue7's
#      --eps-decay 2.0 went ~82% greedy-on-an-untrained-Q-net by epoch 4,
#      collapsing cue visibility); 4 classes x 120 train images and 50
#      epochs x 10 steps = 500 DETR updates (3.3x queue7's 150).
#
# Recipe otherwise matched to the proven CPU test
# (tests/test_convergence.py::test_rls_policy_eval_beats_random_eval):
# F=3 pins num_fixs=2 (fix0 random, fix1 = the policy action — clean credit
# assignment), gamma 0 (reward immediate). Uses the queue6 ResNet-18 SimCLR
# encoder (hue features transfer).
#
# Deliverable: CE off the ln(4) floor, random ##Top-1 climbing toward its
# ~74% visibility ceiling, and ##Policy Top-1 separating ABOVE it.
#
# Usage: bash tools/tpu_run_queue8.sh [OUT]  (default /tmp/tpu_queue8_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue8_results.txt}
: > "$OUT"
DATA=/root/data/cue8
WORK=/root/data/cue8_rls
CACHE=/dev/shm/cue8_cache
BB=/root/data/i96/simclr/model_best.msgpack
mkdir -p "$WORK"

leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout -k 30 "$tmo" env "$@" >> "$OUT" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" | tee -a "$OUT"
  return $rc
}

[ -f "$BB" ] || { echo "missing backbone $BB — run tools/tpu_run_queue6.sh first" | tee -a "$OUT"; exit 1; }

# 0. connectivity gate (first compile on a fresh box measured up to ~540 s)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. location-cued corpus: 4 hue classes x 120 train + 24 val, cue centered
#    on the A=10 max-fixation fovea
[ -d "$DATA/train" ] || leg make_corpus 1800 python \
    tools/make_tiny_imagefolder.py "$DATA" \
    --classes 4 --per-class 120 --val-per-class 24 --size 640 \
    --cue fovea-stripe

# 2. RLS driver: DETR classifier + DQN saccade policy. 50 epochs x 10 steps;
#    ~350 Bellman updates (p=0.7/step) of batch 48 on the final-pair replay.
leg rls_cue 10000 python detr_image_classification_rls.py "$BB" "$DATA" \
    --dataset imagenet --backbone ResNet18 --num-classes 4 -b 48 -f 3 \
    --epochs 50 --lr 5e-4 --gamma 0.0 --num-of-actions 10 -dqnb 48 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK" -p 4

echo "QUEUE8 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Policy Top-1|##Best" "$OUT" | tail -90
