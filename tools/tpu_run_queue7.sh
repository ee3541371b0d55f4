#!/bin/bash
# Round-4 TPU measurement queue, part 7: the RLS learned-saccade question on
# REAL JPEGs through the production driver.
#
# Queue4's RLS leg ran on the hue corpus, where the class cue is visible in
# every glimpse by construction, so ##Policy Top-1 tracking ##Top-1 was the
# expected (and observed) outcome; the policy-beats-random separation was
# proven only by the CPU synthetic test
# (tests/test_convergence.py::test_rls_policy_eval_beats_random_eval).
# This queue closes that gap on hardware: a location-cued JPEG corpus
# (--cue right-stripe: class hue ONLY in the right 10% of the canvas,
# class-uninformative gray background) where a random fixation sees the cue
# ~27% of the time per glimpse while a learned policy (fix_x -> 1) always
# does. Recipe matched to the proven test: F=3 pins num_fixs=2 (fix0
# random, fix1 = the policy action — clean credit assignment), gamma 0
# (reward is immediate; isolates policy improvement from bootstrap noise),
# fast eps decay. Deliverable: per-epoch ##Policy Top-1 separating upward
# from the random-saccade ##Top-1.
#
# The ##Top-1 control is budget-matched (make_policy_eval_step
# greedy=False): both evals run the same rollout machinery with the same
# keys, so num_fixs and fixation 0 are identical per pair and only the
# post-initial saccades differ — at F=3 both always get 2 glimpses
# (control sees the cue ~47% of the time via either random fixation;
# a learned policy ~100%).
#
# Uses the queue6 ResNet-18 SimCLR encoder (hue features transfer).
#
# Usage: bash tools/tpu_run_queue7.sh [OUT]  (default /tmp/tpu_queue7_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue7_results.txt}
: > "$OUT"
DATA=/root/data/cue4
WORK=/root/data/cue4_rls
CACHE=/dev/shm/cue4_cache
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

# 0. connectivity gate (first compile on a fresh box measured 101 s)
leg connectivity 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((128,128)); print(float((x@x).sum()))
" || { echo "TPU unreachable; aborting queue" | tee -a "$OUT"; exit 1; }

# 1. location-cued corpus: 4 hue classes x 60 train + 24 val, cue in the
#    right-edge stripe only
[ -d "$DATA/train" ] || leg make_corpus 1800 python \
    tools/make_tiny_imagefolder.py "$DATA" \
    --classes 4 --per-class 60 --val-per-class 24 --size 640 \
    --cue right-stripe

# 2. RLS driver: DETR classifier + DQN saccade policy. 30 epochs x 5 steps;
#    ~105 Bellman updates (p=0.7/step) of batch 48 on the final-pair replay.
leg rls_cue 10000 python detr_image_classification_rls.py "$BB" "$DATA" \
    --dataset imagenet --backbone ResNet18 --num-classes 4 -b 48 -f 3 \
    --epochs 30 --lr 5e-4 --gamma 0.0 --eps-decay 2.0 -dqnb 48 \
    --canvas-cache "$CACHE" --checkpoint-dir "$WORK" -p 2

echo "QUEUE7 DONE $(date -u)" | tee -a "$OUT"
grep -E "##Top-1|##Policy Top-1|##Best" "$OUT" | tail -80
