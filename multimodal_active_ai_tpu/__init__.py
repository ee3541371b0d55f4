"""Multimodal-Active-AI TPU — a TPU-native active-vision research framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``dariodematties/Multimodal-Active-AI`` (PyTorch + NVIDIA DALI + MPI/NCCL):

* a foveated "retina" takes saccadic glimpses of images through a fused,
  device-side augmentation pipeline (:mod:`~multimodal_active_ai_tpu.ops.retina`),
* ResNet encoders are pretrained with the SimCLR NT-Xent contrastive loss
  computed over a cross-chip all-gather
  (:mod:`~multimodal_active_ai_tpu.objectives.ntxent`),
* a DETR-style encoder–decoder classifies images from sequences of glimpse
  features positioned by their saccade coordinates
  (:mod:`~multimodal_active_ai_tpu.models.detr`),
* a DQN learns where to look next (:mod:`~multimodal_active_ai_tpu.rl`),
* frozen-encoder linear probes evaluate representations
  (:mod:`~multimodal_active_ai_tpu.train.eval_probe`).

Design stance (TPU-first, not a port):

* augmentation parameters are pure function arguments driven by
  ``jax.random`` keys — no host-mutated globals (the reference steers its DALI
  graph through module globals, ``NVIDIA_DALI_Pipelines.py:11-19``);
* the saccade loop is a single jitted ``lax.scan`` inside one train step — no
  host↔device ping-pong per fixation (``Contrastive_Learning.py:641-700``);
* data parallelism is a `jax.sharding.Mesh` + sharding annotations — no
  MPI/DDP/SyncBN machinery (collectives ride ICI, inserted by XLA);
* the host data runtime (sharded readers, JPEG decode, prefetch) is native
  C++ (:mod:`~multimodal_active_ai_tpu.data.native`) in the role DALI's C++
  executor plays for the reference.
"""

import os as _os

# Some TPU platform plugins take priority over the JAX_PLATFORMS env var.
# MAAI_PLATFORM forces the platform through jax.config before first backend
# use (e.g. MAAI_PLATFORM=cpu to run the CLI drivers on the host), the same
# mechanism the test conftest uses.
if _os.environ.get("MAAI_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MAAI_PLATFORM"])

from multimodal_active_ai_tpu.version import __version__

__all__ = ["__version__"]
