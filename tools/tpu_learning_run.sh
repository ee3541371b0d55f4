#!/bin/bash
# Round-4 verdict #2: a driver-level learning run on the real TPU through
# the production host path (JPEG corpus -> HostLoader/CanvasCache -> device
# retina -> jitted train step), then the linear probe on the resulting
# checkpoint. Uses the structured 10-class corpus from
# tools/make_tiny_imagefolder.py (class = dominant hue), small enough to
# finish in tens of minutes on one chip.
#
# Success criteria recorded in PARITY.md:
#   - SimCLR ##Contrastive Top-1 climbs well above chance (~1/(2B-1))
#   - probe ##Top-1 well above 10% chance on held-out val
#   - sustained ##Perf (img/s) from the Speed lines
#
# Usage: bash tools/tpu_learning_run.sh [DATA] [WORK]
set -euo pipefail   # a failed pretrain must not let the probe run on a
                    # random encoder (the probe loader tolerates a missing
                    # checkpoint by design)
cd "$(dirname "$0")/.."
DATA=${1:-/root/data/tiny10}
WORK=${2:-/root/data/lr50}
# tmpfs-backed canvas cache: this box's disk-backed memmap gathers measured
# 13-37 s/batch this session (page-fault/IO collapse, see PERF.md); the
# corpus is 1.2 GB and RAM is 128 GB, so keep the hot path in memory
CACHE=${CACHE:-/dev/shm/lr50_cache}
mkdir -p "$WORK"

[ -d "$DATA/train" ] || python tools/make_tiny_imagefolder.py "$DATA" \
    --classes 10 --per-class 96 --val-per-class 16 --size 640

echo "=== SimCLR pretrain (ResNet50, f=5, b=96, 10 epochs) ==="
timeout 5400 python contrastive_learning.py "$DATA" --dataset imagenet \
    -a ResNet50 -b 96 -f 5 --epochs 10 --optimizer adam --lr 0.001 \
    --warmup-epochs 1 --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/simclr" -p 2 2>&1 | tee "$WORK/simclr.log" \
    | grep -E "Epoch:|##|Saving|Speed" | tail -80

[ -f "$WORK/simclr/model_best.msgpack" ] || {
    echo "pretrain produced no checkpoint — aborting before the probe"; exit 1; }

echo "=== Linear probe on the pretrained encoder ==="
timeout 5400 python representation_evaluation.py \
    "$WORK/simclr/model_best.msgpack" "$DATA" --dataset imagenet \
    -a ResNet50 --num-classes 10 -b 96 -f 5 --epochs 15 --optimizer adam \
    --lr 0.001 --canvas-cache "$CACHE" \
    --checkpoint-dir "$WORK/probe" -p 2 2>&1 | tee "$WORK/probe.log" \
    | grep -E "Epoch:|##|Saving" | tail -60

echo "LEARNING RUN DONE — trajectories in $WORK/{simclr,probe}.log"
