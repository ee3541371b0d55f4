"""SimCLR module: encoder *f* + projector *g*.

Rebuild of reference ``SimCLR/SimCLR.py:11-31``. The reference's forward
first stacks the four 30×30 glimpse scales into a 12-channel tensor
(``SimCLR.py:24``); in this framework that stacking already happens inside
the retina (:func:`multimodal_active_ai_tpu.ops.retina.unlabeled_glimpses`
returns ``(B, 30, 30, 12)``), so the module is simply ``g(f(x))``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.mlp import MLP
from multimodal_active_ai_tpu.models.resnet import build_encoder


class SimCLRModule(nn.Module):
    """``g(f(glimpses))`` with submodules named ``f``/``g`` to preserve the
    reference checkpoint layout (downstream consumers replace ``g`` with
    Identity and keep ``f`` — ``backbone.py:200-212``)."""

    arch: str = "ResNet18"
    projection_hidden: int = 1024   # MLP(C*4*4, 1024, 128), Contrastive_Learning.py:262-269
    projection_dim: int = 128
    norm_kind: str = "sync_bn"
    axis_name: str | None = "data"
    dtype: Any = jnp.float32
    stat_fusion: str | None = None   # conv+BN-stat fusion, models/conv_bn.py

    def setup(self):
        self.f = build_encoder(self.arch, norm_kind=self.norm_kind,
                               axis_name=self.axis_name, dtype=self.dtype,
                               stat_fusion=self.stat_fusion)
        self.g = MLP(self.projection_hidden, self.projection_dim, dtype=self.dtype)

    def __call__(self, glimpses, train: bool = True):
        feats = self.f(glimpses, train=train)
        return self.g(feats).astype(jnp.float32)

    def features(self, glimpses, train: bool = False):
        """Encoder features only (projector stripped), the downstream-stage
        contract (``Representation_Evaluation.py:405-422``)."""
        return self.f(glimpses, train=train)
