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

echo "=== [1/5] SimCLR pretrain (+resume, +reference-layout export) ==="
python contrastive_learning.py /tmp/unused "${COMMON[@]}" --arch ResNet18 \
  -f 2 --epochs 1 -t --checkpoint-dir "$WORK" \
  --export-torch "$WORK/checkpoint.pth.tar"
test -f "$WORK/checkpoint.msgpack"
# the exported .pth.tar round-trips through the reference-layout importer
python - "$WORK" <<'PY'
import sys
import jax, jax.numpy as jnp
from multimodal_active_ai_tpu.models import SimCLRModule
from multimodal_active_ai_tpu.utils.checkpoint import import_torch_checkpoint
m = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 30, 30, 12)), train=False)
p, s = import_torch_checkpoint(sys.argv[1] + "/checkpoint.pth.tar",
                               jax.device_get(v["params"]),
                               jax.device_get(v["batch_stats"]))
print("export->import round trip OK")
PY
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

echo "=== [5/5] COCO captions probe (synthetic + real-annotation vocab) ==="
python coco_captions_probe.py "$CKPT" /tmp/unused --dataset synthetic \
  --canvas-size 64 -b 4 --num-examples 16 --arch ResNet18 -f 2 --epochs 1 -t \
  --checkpoint-dir "$WORK"
test -f "$WORK/caption_probe_checkpoint.msgpack"
# real-data path: tiny COCO-captions corpus exercises load_caption_pairs,
# the corpus-built Vocabulary, and the ##Vocab/OOV-rate report
python - "$WORK" <<'PY'
import json, os, sys
import numpy as np
from PIL import Image
root = os.path.join(sys.argv[1], "mini_coco")
os.makedirs(root, exist_ok=True)
r = np.random.RandomState(0)
images, anns = [], []
for i in range(8):
    name = f"img_{i:03d}.jpg"
    Image.fromarray(r.randint(0, 255, (64, 64, 3), np.uint8)).save(
        os.path.join(root, name))
    images.append({"id": i, "file_name": name})
    anns.append({"image_id": i, "caption":
                 f"a small photo number {i} with a red toy block"})
with open(os.path.join(root, "captions_mini.json"), "w") as f:
    json.dump({"images": images, "annotations": anns}, f)
PY
python coco_captions_probe.py "$CKPT" "$WORK/mini_coco" --dataset mscoco \
  --canvas-size 64 -b 4 --arch ResNet18 -f 2 --epochs 1 -t \
  --checkpoint-dir "$WORK" | grep -E "caption vocabulary|##Vocab"
# imagefolder mode: captions templated from the class tree (the correlated
# image↔caption path used for the TPU learning evidence, PARITY.md round-4)
python - "$WORK" <<'PY'
import os, sys
import numpy as np
from PIL import Image
r = np.random.RandomState(1)
for c in range(2):
    d = os.path.join(sys.argv[1], "mini_folder", "train", f"class_{c:03d}")
    os.makedirs(d, exist_ok=True)
    for i in range(4):
        Image.fromarray(r.randint(0, 255, (64, 64, 3), np.uint8)).save(
            os.path.join(d, f"{i:04d}.jpg"))
PY
python coco_captions_probe.py "$CKPT" "$WORK/mini_folder" \
  --dataset imagefolder --canvas-size 64 -b 4 --arch ResNet18 -f 2 \
  --epochs 1 -t --checkpoint-dir "$WORK" \
  | grep -E "caption vocabulary|##Vocab"

echo "WORKFLOW SMOKE: ALL FIVE DRIVERS + RESUME PATHS PASSED"

if [ -z "${SKIP_CONVERGENCE:-}" ]; then
  echo "=== [6] Convergence suite (the framework LEARNS; ~10 min) ==="
  # -rP prints each test's final metrics (top-1s, losses, greedy reward)
  python -m pytest tests/test_convergence.py -q -rP
  echo "WORKFLOW SMOKE: CONVERGENCE METRICS ABOVE"
fi
