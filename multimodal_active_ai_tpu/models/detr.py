"""DETR-style image classifier over saccade sequences.

Rebuild of reference ``detr_CLA/models/detr.py`` + ``backbone.py``: a
pretrained, frozen-BN SimCLR encoder embeds each 30×30 glimpse stack, the
glimpse features form a sequence along the saccade axis positioned by
saccade-coordinate embeddings, and a DETR transformer with ``num_queries``
learned queries emits per-query classification logits.

TPU-native differences from the reference:

* the backbone loop over saccades (``backbone.py:89-123``) is a single
  batched ResNet call on ``(B·S, 30, 30, 12)`` — one big MXU-friendly conv
  batch instead of S sequential kernel launches;
* variable-length saccade sequences (``nested_tensor_from_tensor_list``
  padding, ``util/misc.py:50-67``) become a static max length + boolean pad
  mask, the jit-compatible equivalent of ``NestedTensor``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.position_encoding import build_position_encoding
from multimodal_active_ai_tpu.models.resnet import build_encoder, encoder_feature_dim
from multimodal_active_ai_tpu.models.transformer import build_transformer
from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion


class DETR(nn.Module):
    """DETR classifier (``detr.py:24-70``).

    The backbone submodule is named ``backbone_f`` and holds the SimCLR
    encoder ``f`` (the reference keeps only ``backbone.f`` after stripping
    the projector, ``backbone.py:200``); checkpoint import maps the
    pretrained SimCLR ``f`` onto it.
    """

    backbone_arch: str = "ResNet18"
    num_classes: int = 1000
    num_queries: int = 10
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    position_embedding: str = "sine"
    backbone_norm: str = "frozen"   # FrozenBatchNorm2d parity (backbone.py:151)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_f = build_encoder(self.backbone_arch,
                                        norm_kind=self.backbone_norm,
                                        axis_name=None, dtype=self.dtype)
        self.pos_embed = build_position_encoding(self.position_embedding,
                                                 self.hidden_dim, self.dtype)
        self.transformer = build_transformer(
            hidden_dim=self.hidden_dim, dropout=self.dropout,
            nheads=self.nheads, dim_feedforward=self.dim_feedforward,
            enc_layers=self.enc_layers, dec_layers=self.dec_layers,
            pre_norm=self.pre_norm, dtype=self.dtype)
        # Conv1d(C*4*4 -> hidden, k=1) == Dense on the feature axis (detr.py:41)
        self.input_proj = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        self.class_embed = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, glimpses, saccades, mask=None, train: bool = False):
        """Forward (``detr.py:45-70``).

        Args:
          glimpses: (B, S, g, g, 12) raw glimpse stacks per saccade.
          saccades: (B, S, 2) fixation coordinates in [0,1).
          mask: (B, S) bool, True on padded saccades (NestedTensor mask).
          train: enables dropout (backbone BN is frozen regardless).

        Returns dict with ``pred_logits`` (B, num_queries, num_classes) and
        ``aux_logits`` (dec_layers-1, B, Q, C) from intermediate decoder
        layers (the reference computes them via return_intermediate, detr.py:68).
        """
        b, s = glimpses.shape[:2]
        if mask is None:
            mask = jnp.zeros((b, s), bool)
        flat = glimpses.reshape((b * s,) + glimpses.shape[2:])
        feats = self.backbone_f(flat, train=False)      # frozen stats always
        feats = feats.reshape(b, s, -1)                 # (B, S, C*4*4)
        src = self.input_proj(feats)                    # (B, S, hidden)
        pos = self.pos_embed(saccades)
        hs, _memory = self.transformer(src, mask, self.query_embed, pos,
                                       deterministic=not train)
        outputs_class = self.class_embed(hs)            # (L, B, Q, num_classes)
        return {"pred_logits": outputs_class[-1].astype(jnp.float32),
                "aux_logits": outputs_class[:-1].astype(jnp.float32)}

    def features(self, glimpses, train: bool = False):
        """Backbone features per saccade, (B, S, C*16) — the ``BackboneBase``
        output contract (``backbone.py:110``)."""
        b, s = glimpses.shape[:2]
        flat = glimpses.reshape((b * s,) + glimpses.shape[2:])
        feats = self.backbone_f(flat, train=False)
        return feats.reshape(b, s, -1)


def build(cfg, num_classes: int | None = None, dtype: Any = jnp.float32):
    """``detr.build()`` equivalent (``detr.py:151-178``): returns
    ``(model, criterion)``; num_classes defaults per dataset (1000 imagenet /
    90 mscoco, ``detr.py:158``)."""
    if num_classes is None:
        num_classes = 1000 if cfg.dataset in ("imagenet", "synthetic") else 90
    model = DETR(
        backbone_arch=cfg.backbone,
        num_classes=num_classes,
        num_queries=cfg.num_queries,
        hidden_dim=cfg.hidden_dim,
        nheads=cfg.nheads,
        enc_layers=cfg.enc_layers,
        dec_layers=cfg.dec_layers,
        dim_feedforward=cfg.dim_feedforward,
        dropout=cfg.dropout,
        pre_norm=cfg.pre_norm,
        position_embedding=cfg.position_embedding,
        backbone_norm=getattr(cfg, "backbone_norm", "frozen"),
        dtype=dtype,
    )
    criterion = SetCriterion(num_queries=cfg.num_queries, num_classes=num_classes)
    return model, criterion
