"""DETR encoder–decoder transformer over the saccade axis.

Rebuild of reference ``detr_CLA/models/transformer.py`` (itself torch
``nn.Transformer`` with DETR's modifications): positional encodings are
added to q/k inside attention (not to values), the encoder has no final LN
in post-norm mode, and the decoder returns the stack of all layers'
(normalized) activations (``transformer.py:21-129``).

TPU-native differences: batch-first ``(B, S, C)`` layout throughout (the
reference's ``SxNxC`` permutes are a torch-MHA artifact, ``:50-57``), flax
attention on the MXU, padding handled by a boolean key mask (True = pad,
matching the ``NestedTensor`` mask convention of ``util/misc.py:27-47``).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


def _attn_mask(key_padding_mask):
    """(B, S) bool pad mask -> (B, 1, 1, S) attention bias mask (True=keep)."""
    if key_padding_mask is None:
        return None
    return ~key_padding_mask[:, None, None, :]


class _MHA(nn.Module):
    d_model: int
    nhead: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model, dropout_rate=self.dropout,
            deterministic=deterministic, dtype=self.dtype)(
                q, k, v, mask=_attn_mask(key_padding_mask))


class TransformerEncoderLayer(nn.Module):
    """Post/pre-norm encoder layer (``transformer.py:132-189``)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: Callable = nn.relu
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, src_key_padding_mask=None, deterministic=True):
        def ff(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
            x = self.activation(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            return nn.Dense(self.d_model, dtype=self.dtype)(x)

        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        if self.normalize_before:
            src2 = nn.LayerNorm(dtype=self.dtype)(src)
            q = k = src2 + pos
            src = src + drop(_MHA(self.d_model, self.nhead, self.dropout,
                                  self.dtype)(q, k, src2, src_key_padding_mask,
                                              deterministic))
            src2 = nn.LayerNorm(dtype=self.dtype)(src)
            return src + drop(ff(src2))
        q = k = src + pos
        src = src + drop(_MHA(self.d_model, self.nhead, self.dropout, self.dtype)(
            q, k, src, src_key_padding_mask, deterministic))
        src = nn.LayerNorm(dtype=self.dtype)(src)
        src = src + drop(ff(src))
        return nn.LayerNorm(dtype=self.dtype)(src)


class TransformerDecoderLayer(nn.Module):
    """Self-attn over queries + cross-attn into encoder memory
    (``transformer.py:192-274``)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: Callable = nn.relu
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos,
                 memory_key_padding_mask=None, deterministic=True):
        def ff(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
            x = self.activation(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            return nn.Dense(self.d_model, dtype=self.dtype)(x)

        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        self_attn = _MHA(self.d_model, self.nhead, self.dropout, self.dtype)
        cross_attn = _MHA(self.d_model, self.nhead, self.dropout, self.dtype)
        if self.normalize_before:
            tgt2 = nn.LayerNorm(dtype=self.dtype)(tgt)
            q = k = tgt2 + query_pos
            tgt = tgt + drop(self_attn(q, k, tgt2, None, deterministic))
            tgt2 = nn.LayerNorm(dtype=self.dtype)(tgt)
            tgt = tgt + drop(cross_attn(tgt2 + query_pos, memory + pos, memory,
                                        memory_key_padding_mask, deterministic))
            tgt2 = nn.LayerNorm(dtype=self.dtype)(tgt)
            return tgt + drop(ff(tgt2))
        q = k = tgt + query_pos
        tgt = tgt + drop(self_attn(q, k, tgt, None, deterministic))
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt)
        tgt = tgt + drop(cross_attn(tgt + query_pos, memory + pos, memory,
                                    memory_key_padding_mask, deterministic))
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt)
        tgt = tgt + drop(ff(tgt))
        return nn.LayerNorm(dtype=self.dtype)(tgt)


class Transformer(nn.Module):
    """6-enc/6-dec DETR transformer (``transformer.py:21-64``); returns
    ``(hs, memory)`` with ``hs`` of shape (num_dec_layers, B, Q, C) when
    ``return_intermediate_dec`` (the DETR build default, ``:290``)."""

    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    return_intermediate_dec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos_embed, deterministic=True):
        """src: (B, S, C); mask: (B, S) bool (True = padded saccade);
        query_embed: (Q, C); pos_embed: (B, S, C)."""
        bs = src.shape[0]
        output = src
        for _ in range(self.num_encoder_layers):
            output = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                normalize_before=self.normalize_before, dtype=self.dtype)(
                    output, pos_embed, mask, deterministic)
        if self.normalize_before:
            output = nn.LayerNorm(dtype=self.dtype)(output)
        memory = output

        query_pos = jnp.broadcast_to(query_embed[None], (bs,) + query_embed.shape)
        tgt = jnp.zeros_like(query_pos)
        intermediate = []
        final_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        for _ in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                normalize_before=self.normalize_before, dtype=self.dtype)(
                    tgt, memory, pos_embed, query_pos, mask, deterministic)
            if self.return_intermediate_dec:
                intermediate.append(final_norm(tgt))
        if self.return_intermediate_dec:
            hs = jnp.stack(intermediate)          # (L, B, Q, C)
        else:
            hs = final_norm(tgt)[None]
        return hs, memory


def build_transformer(hidden_dim=256, dropout=0.1, nheads=8,
                      dim_feedforward=2048, enc_layers=6, dec_layers=6,
                      pre_norm=False, dtype=jnp.float32) -> Transformer:
    """``build_transformer`` (``transformer.py:281-291``)."""
    return Transformer(d_model=hidden_dim, dropout=dropout, nhead=nheads,
                       dim_feedforward=dim_feedforward,
                       num_encoder_layers=enc_layers,
                       num_decoder_layers=dec_layers,
                       normalize_before=pre_norm,
                       return_intermediate_dec=True, dtype=dtype)
