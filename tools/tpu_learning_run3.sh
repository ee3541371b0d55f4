#!/bin/bash
# Driver-level TPU learning run, part 3: a contrastive trajectory that CLIMBS.
#
# Part 1 (tpu_learning_run.sh) proved the probe learns on the pretrained
# encoder (41.7% top-1 vs 10% chance) but its SimCLR leg was flat: ResNet-50
# with default photometric augs got only ~100 updates, and on the structured
# corpus the class/instance identity lives in HUE — which the default
# ColorTwist (p=0.5) destroys, so positives are near-unlearnable at that
# budget. tests/test_convergence.py::test_simclr_overfits_to_high_contrastive_top1
# is the tuned recipe (augs that preserve the signal + temperature 0.5):
# this script runs the SAME recipe through the production driver + host
# path (HostLoader -> canvas cache -> device retina) on the real TPU, for
# enough epochs that ##Contrastive Top-1 must climb well above the 1/(2b)
# chance line, then probes the result.
#
# Usage: bash tools/tpu_learning_run3.sh [DATA] [WORK]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/root/data/tiny10}
WORK=${2:-/root/data/lr18}
CACHE=${CACHE:-/dev/shm/lr18_cache}   # tmpfs: see tpu_learning_run.sh
mkdir -p "$WORK"

[ -d "$DATA/train" ] || python tools/make_tiny_imagefolder.py "$DATA" \
    --classes 10 --per-class 96 --val-per-class 16 --size 640

echo "=== SimCLR pretrain (ResNet18, f=2, b=96, temp 0.5, hue-preserving augs, 40 epochs) ==="
timeout 9000 python contrastive_learning.py "$DATA" --dataset imagenet \
    -a ResNet18 -b 96 -f 2 --epochs 40 --optimizer adam --lr 0.001 \
    --warmup-epochs 2 --temperature 0.5 \
    --color-augmentation 0 --gaussian-noise-augmentation 0 \
    --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/simclr" -p 4 2>&1 | tee "$WORK/simclr.log" \
    | grep -E "Epoch:|##|Saving|Speed" | tail -120

[ -f "$WORK/simclr/model_best.msgpack" ] || {
    echo "pretrain produced no checkpoint — aborting before the probe"; exit 1; }

echo "=== Linear probe on the ResNet18 encoder ==="
timeout 5400 python representation_evaluation.py \
    "$WORK/simclr/model_best.msgpack" "$DATA" --dataset imagenet \
    -a ResNet18 --num-classes 10 -b 96 -f 2 --epochs 15 --optimizer adam \
    --lr 0.001 --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/probe" -p 4 2>&1 | tee "$WORK/probe.log" \
    | grep -E "Epoch:|##|Saving" | tail -60

echo "LEARNING RUN 3 DONE — trajectories in $WORK/{simclr,probe}.log"
