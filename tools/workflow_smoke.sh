#!/usr/bin/env bash
# Five-driver workflow smoke: pretrain -> probe -> DETR -> RLS -> captions,
# synthetic data, CPU — exercising every cross-stage checkpoint contract AND
# each driver's resume path (one extra epoch from its own checkpoint).
# ~30-40 min on one CPU core (XLA compiles dominate). Used by the verify
# skill (.claude/skills/verify/SKILL.md §1b).
set -euo pipefail
cd "$(dirname "$0")/.."

export MAAI_PLATFORM=cpu JAX_PLATFORMS=cpu
WORK="${WORK:-/tmp/maai_workflow_smoke}"
rm -rf "$WORK" && mkdir -p "$WORK"
COMMON=(--dataset synthetic --canvas-size 64 -b 4 --num-examples 16 -p 1)
# synthetic labels span 0..999, so heads keep the default 1000 classes
DETR_DIMS=(--enc_layers 1 --dec_layers 1 --hidden_dim 32 --nheads 2
           --dim_feedforward 64 --backbone ResNet18)

echo "=== [1/5] SimCLR pretrain (+resume) ==="
python contrastive_learning.py /tmp/unused "${COMMON[@]}" --arch ResNet18 \
  -f 2 --epochs 1 -t --checkpoint-dir "$WORK"
test -f "$WORK/checkpoint.msgpack"
python contrastive_learning.py /tmp/unused "${COMMON[@]}" --arch ResNet18 \
  -f 2 --epochs 2 -t --checkpoint-dir "$WORK" \
  --resume "$WORK/checkpoint.msgpack"
CKPT="$WORK/checkpoint.msgpack"

echo "=== [2/5] Linear probe (+resume) ==="
python representation_evaluation.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  --arch ResNet18 -f 2 --epochs 1 -t --checkpoint-dir "$WORK"
test -f "$WORK/classifier_checkpoint.msgpack"
python representation_evaluation.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  --arch ResNet18 -f 2 --epochs 2 -t --checkpoint-dir "$WORK" \
  --resume "$WORK/classifier_checkpoint.msgpack"

echo "=== [3/5] DETR classifier (+resume) ==="
python detr_image_classification.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  "${DETR_DIMS[@]}" -f 2 --epochs 1 -t --checkpoint-dir "$WORK"
test -f "$WORK/detr_classifier_checkpoint.msgpack"
python detr_image_classification.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  "${DETR_DIMS[@]}" -f 2 --epochs 2 -t --checkpoint-dir "$WORK" \
  --resume "$WORK/detr_classifier_checkpoint.msgpack"

echo "=== [4/5] RLS (DETR + DQN policy, +resume) ==="
RLS="$WORK/rls" && mkdir -p "$RLS"
python detr_image_classification_rls.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  "${DETR_DIMS[@]}" -f 3 --epochs 1 -t -dqnb 8 --checkpoint-dir "$RLS"
test -f "$RLS/dqn_checkpoint.msgpack"
python detr_image_classification_rls.py "$CKPT" /tmp/unused "${COMMON[@]}" \
  "${DETR_DIMS[@]}" -f 3 --epochs 2 -t -dqnb 8 --checkpoint-dir "$RLS" \
  --resume "$RLS/detr_classifier_checkpoint.msgpack" \
  --dqn-resume "$RLS/dqn_checkpoint.msgpack"

echo "=== [5/5] COCO captions probe ==="
python coco_captions_probe.py "$CKPT" /tmp/unused --dataset synthetic \
  --canvas-size 64 -b 4 --num-examples 16 --arch ResNet18 -f 2 --epochs 1 -t \
  --checkpoint-dir "$WORK"
test -f "$WORK/caption_probe_checkpoint.msgpack"

echo "WORKFLOW SMOKE: ALL FIVE DRIVERS + RESUME PATHS PASSED"

if [ -z "${SKIP_CONVERGENCE:-}" ]; then
  echo "=== [6] Convergence suite (the framework LEARNS; ~10 min) ==="
  # -rP prints each test's final metrics (top-1s, losses, greedy reward)
  python -m pytest tests/test_convergence.py -q -rP
  echo "WORKFLOW SMOKE: CONVERGENCE METRICS ABOVE"
fi
