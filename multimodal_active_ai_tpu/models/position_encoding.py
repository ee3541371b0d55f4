"""Positional encodings over saccade coordinates.

Rebuild of reference ``detr_CLA/models/position_encoding.py``. The novel
twist of the reference (vs. upstream DETR) is that position embeddings are
computed from the *(x, y) fixation coordinates* of each glimpse rather than
from a feature-map grid: sine/cosine interleave of coords ×100
(``position_encoding.py:39-55``) or an ``Embedding(50, ·)`` lookup on
×50-quantized coords (``:72-80``).

Layout: saccade coords are ``(B, S, 2)`` ordered (x, y) — the order the RLS
driver stores them (``DETR_Image_Classification_RLS.py:703-704``); the
reference indexes ``[:, 0]`` into its "y_embed" variable, a mislabeling we
do not reproduce in naming but do reproduce in math (coordinate 0 fills the
first half of the embedding).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingSine(nn.Module):
    """Sine embedding of saccade coords (``position_encoding.py:18-55``)."""

    num_pos_feats: int = 128  # hidden_dim // 2 (build_position_encoding :84)
    temperature: float = 10000.0
    normalize: bool = True     # build passes normalize=True (:87)
    scale: float = 2 * math.pi
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, saccades: jnp.ndarray) -> jnp.ndarray:
        """saccades: (B, S, 2) in [0,1) → (B, S, 2*num_pos_feats)."""
        a_embed = saccades[..., 0] * 100.0
        b_embed = saccades[..., 1] * 100.0
        if self.normalize:
            eps = 1e-6
            a_embed = a_embed / (jnp.max(a_embed, axis=1, keepdims=True) + eps) * self.scale
            b_embed = b_embed / (jnp.max(b_embed, axis=1, keepdims=True) + eps) * self.scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)

        def interleave(e):
            p = e[..., None] / dim_t  # (B, S, F)
            return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                             axis=-1).reshape(*e.shape, -1)

        pos = jnp.concatenate([interleave(a_embed), interleave(b_embed)], axis=-1)
        return pos.astype(self.dtype)


class PositionEmbeddingLearned(nn.Module):
    """Learned embedding on ×50-quantized coords (``position_encoding.py:58-80``)."""

    num_pos_feats: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, saccades: jnp.ndarray) -> jnp.ndarray:
        i = jnp.clip((saccades[..., 1] * 50).astype(jnp.int32), 0, 49)
        j = jnp.clip((saccades[..., 0] * 50).astype(jnp.int32), 0, 49)
        col = nn.Embed(50, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="col_embed")(i)
        row = nn.Embed(50, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="row_embed")(j)
        return jnp.concatenate([row, col], axis=-1).astype(self.dtype)


def build_position_encoding(position_embedding: str, hidden_dim: int,
                            dtype: Any = jnp.float32):
    """``build_position_encoding`` (``position_encoding.py:83-93``)."""
    n_steps = hidden_dim // 2
    if position_embedding in ("v2", "sine"):
        return PositionEmbeddingSine(num_pos_feats=n_steps, normalize=True,
                                     dtype=dtype)
    if position_embedding in ("v3", "learned"):
        return PositionEmbeddingLearned(num_pos_feats=n_steps, dtype=dtype)
    raise ValueError(f"not supported {position_embedding}")
