#!/bin/bash
# Round-4 "capability parity plus": extend the driver-level TPU learning
# evidence beyond SimCLR+probe (tools/tpu_learning_run.sh) to the remaining
# three drivers — DETR classifier, RLS, and the captions probe — so every
# production driver has a real-hardware learning trajectory recorded in
# PARITY.md, not just CPU/synthetic convergence tests.
#
#   - DETR: hue corpus through the production host path; ##Top-1 must climb
#     well above 10% chance.
#   - RLS: same corpus; both ##Top-1 (random saccades) and ##Policy Top-1
#     (greedy learned saccades) printed per epoch. The hue cue is visible in
#     every glimpse by construction, so the two are expected to track each
#     other — the policy-beats-random separation on a location-cued task is
#     proven by tests/test_convergence.py::test_rls_policy_eval_beats_random_eval.
#   - captions: synthetic mode (templated captions); retrieval ##Top-1 must
#     climb above 1/B chance.
#
# Requires the SimCLR checkpoint from tools/tpu_learning_run.sh.
# Usage: bash tools/tpu_learning_run2.sh [DATA] [WORK]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/root/data/tiny10}
WORK=${2:-/root/data/lr50}
CACHE=${CACHE:-/dev/shm/lr50_cache}   # tmpfs: see tpu_learning_run.sh
BB="$WORK/simclr/model_best.msgpack"
[ -f "$BB" ] || { echo "missing $BB — run tools/tpu_learning_run.sh first"; exit 1; }
[ -d "$DATA/train" ] || { echo "missing corpus $DATA"; exit 1; }

echo "=== DETR classifier (ResNet50 backbone, f=5, b=96, 12 epochs) ==="
timeout 5400 python detr_image_classification.py "$BB" "$DATA" \
    --dataset imagenet --backbone ResNet50 --num-classes 10 -b 96 -f 5 \
    --epochs 12 --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/detr" -p 2 2>&1 | tee "$WORK/detr.log" \
    | grep -E "Epoch:|##|Saving|Speed" | tail -60

echo "=== RLS (DETR + DQN saccade policy, f=5, b=96, 12 epochs) ==="
timeout 7200 python detr_image_classification_rls.py "$BB" "$DATA" \
    --dataset imagenet --backbone ResNet50 --num-classes 10 -b 96 -f 5 \
    --epochs 12 --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/rls" -p 2 2>&1 | tee "$WORK/rls.log" \
    | grep -E "Epoch:|##|Saving|Speed" | tail -80

# imagefolder captions: templated from the class directories of the real
# JPEG corpus, so image and caption are CORRELATED and retrieval is
# learnable (the original synthetic leg pinned at exact chance because
# SyntheticReader labels are independent of pixel content — PARITY.md)
echo "=== Captions probe (imagefolder captions, f=5, b=64, 10 epochs) ==="
timeout 5400 python coco_captions_probe.py "$BB" "$DATA" \
    --dataset imagefolder -a ResNet50 -b 64 -f 5 --epochs 10 \
    --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/captions" -p 2 2>&1 | tee "$WORK/captions.log" \
    | grep -E "Epoch:|##|Saving|Speed" | tail -40

echo "LEARNING RUN 2 DONE — trajectories in $WORK/{detr,rls,captions}.log"
