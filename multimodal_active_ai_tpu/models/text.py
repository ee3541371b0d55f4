"""Text encoder + glimpse-caption decoder for the multimodal (COCO-Captions)
path.

Parity target: the reference's multimodal work never left notebook
prototypes — ``COCO Captions Test-checkpoint.ipynb`` (caption loading + a
pure-torch foveated processor) and ``Reinforced Transformer-checkpoint.ipynb``
(an Annotated-Transformer-style image-decoder × sentence-decoder captioner
over glimpses with label smoothing and a Noam schedule). This module
provides production versions of both halves:

* :class:`TextEncoder` — token hashing + transformer encoder + mean-pool →
  embedding, for CLIP-style image–text retrieval probes
  (:mod:`multimodal_active_ai_tpu.train.caption_probe`);
* :class:`GlimpseCaptioner` — a glimpse-sequence encoder × caption decoder
  with causal masking, the productionized equivalent of the prototype's
  ``DecoderDecoder``/``make_model`` (cells 3/38).

Tokenization is dependency-free (hashing trick over lowercase word tokens),
keeping the framework self-contained.
"""

from __future__ import annotations

import re
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.transformer import (
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
_RESERVED = 3
_WORD_RE = re.compile(r"[a-z0-9']+")


class Vocabulary:
    """Corpus-built frequency vocabulary (word → id) with an OOV bucket.

    The reference prototype tokenized the actual caption corpus
    (``COCO Captions Test-checkpoint.ipynb`` cell 18 builds its dataset from
    the annotation text); this is the production equivalent: ids are
    assigned by descending corpus frequency at startup, unknown words fall
    into a dedicated OOV bucket (id 3), and the encoder tracks the OOV rate
    so retrieval numbers come with a coverage figure. The hashing-trick
    :func:`tokenize` stays as the corpus-free fallback (synthetic data).
    """

    OOV_ID = 3
    _BASE = 4       # PAD/BOS/EOS/OOV reserved below

    def __init__(self, words: list[str], max_len: int = 32):
        self.words = list(words)
        self.word_to_id = {w: i + self._BASE for i, w in enumerate(self.words)}
        self.max_len = max_len
        self.oov_words = 0
        self.total_words = 0

    @property
    def size(self) -> int:
        return self._BASE + len(self.words)

    @property
    def oov_rate(self) -> float:
        return self.oov_words / self.total_words if self.total_words else 0.0

    @classmethod
    def build(cls, texts, max_size: int = 32768, min_freq: int = 1,
              max_len: int = 32) -> "Vocabulary":
        """Frequency vocabulary over lowercase word tokens; ties broken by
        first appearance (deterministic across hosts for a shared corpus)."""
        from collections import Counter

        counts = Counter()
        for t in texts:
            counts.update(_WORD_RE.findall(t.lower()))
        words = [w for w, n in counts.most_common() if n >= min_freq]
        return cls(words[: max_size - cls._BASE], max_len)

    def to_u8(self):
        """Word list as a uint8 array (newline-joined UTF-8) — the msgpack-
        checkpointable form. A text-tower checkpoint is only meaningful with
        the exact word→id map it was trained against; saving the vocabulary
        beside the embedding makes a mismatch detectable instead of silent."""
        import numpy as np

        return np.frombuffer("\n".join(self.words).encode("utf-8"),
                             np.uint8).copy()

    @classmethod
    def from_u8(cls, arr, max_len: int = 32) -> "Vocabulary":
        """Inverse of :meth:`to_u8`."""
        blob = bytes(bytearray(arr)).decode("utf-8")
        return cls(blob.split("\n") if blob else [], max_len)

    def encode(self, text: str):
        """(ids, mask) padded to ``max_len``; same shape contract as
        :func:`tokenize` so the two are drop-in interchangeable."""
        words = _WORD_RE.findall(text.lower())[: self.max_len - 2]
        ids = [BOS_ID]
        for w in words:
            i = self.word_to_id.get(w)
            if i is None:
                self.oov_words += 1
                i = self.OOV_ID
            ids.append(i)
        self.total_words += len(words)
        ids.append(EOS_ID)
        mask = [1] * len(ids)
        while len(ids) < self.max_len:
            ids.append(PAD_ID)
            mask.append(0)
        return ids, mask

    def decode(self, ids) -> str:
        """Inverse map (specials skipped, OOV rendered as ``<unk>``)."""
        out = []
        for i in ids:
            i = int(i)
            if i in (PAD_ID, BOS_ID, EOS_ID):
                continue
            out.append("<unk>" if i == self.OOV_ID
                       else self.words[i - self._BASE])
        return " ".join(out)


def tokenize(text: str, vocab_size: int = 32768, max_len: int = 32):
    """Hashing-trick tokenizer: lowercase word tokens → stable bucket ids.

    Returns (ids, mask) as python lists padded to ``max_len``; ids occupy
    ``[_RESERVED, vocab_size)``.
    """
    words = _WORD_RE.findall(text.lower())
    ids = [BOS_ID]
    for w in words[: max_len - 2]:
        h = 2166136261
        for ch in w.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        ids.append(_RESERVED + h % (vocab_size - _RESERVED))
    ids.append(EOS_ID)
    mask = [1] * len(ids)
    while len(ids) < max_len:
        ids.append(PAD_ID)
        mask.append(0)
    return ids, mask


class TextEncoder(nn.Module):
    """Embedding + sinusoid positions + N encoder layers + masked mean-pool
    + projection to the shared retrieval space."""

    vocab_size: int = 32768
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 4
    dim_feedforward: int = 1024
    out_dim: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, train: bool = False):
        """token_ids: (B, L) int32; PAD_ID positions are masked out."""
        mask_pad = token_ids == PAD_ID            # True = padded
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(token_ids)
        pos = _sinusoid(token_ids.shape[1], self.d_model, self.dtype)
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype)(x, pos[None], mask_pad,
                                  deterministic=not train)
        keep = (~mask_pad)[..., None].astype(x.dtype)
        pooled = jnp.sum(x * keep, axis=1) / jnp.maximum(jnp.sum(keep, axis=1), 1)
        return nn.Dense(self.out_dim, dtype=self.dtype)(pooled).astype(jnp.float32)


def _sinusoid(length: int, dim: int, dtype):
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    dim_t = jnp.arange(dim, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2 * (dim_t // 2) / dim)
    enc = jnp.where(dim_t % 2 == 0, jnp.sin(angle), jnp.cos(angle))
    return enc.astype(dtype)


class GlimpseCaptioner(nn.Module):
    """Caption decoder over glimpse-sequence memory.

    Productionized ``Reinforced Transformer`` prototype: glimpse features
    (from a frozen SimCLR encoder) are projected into the model dimension
    and attended by a causal caption decoder; logits over the hashed vocab.
    """

    vocab_size: int = 32768
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, glimpse_feats, token_ids, glimpse_mask=None,
                 train: bool = False):
        """glimpse_feats: (B, S, F) frozen features; token_ids: (B, L)
        caption prefix (teacher forcing). Returns (B, L, vocab) logits."""
        b, s, _ = glimpse_feats.shape
        l = token_ids.shape[1]
        memory = nn.Dense(self.d_model, dtype=self.dtype)(glimpse_feats)
        mem_pos = _sinusoid(s, self.d_model, self.dtype)[None]
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(token_ids)
        x = x + _sinusoid(l, self.d_model, self.dtype)[None]

        causal = jnp.tril(jnp.ones((l, l), bool))
        for _ in range(self.num_layers):
            x = _CausalDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype)(x, memory, mem_pos, causal, glimpse_mask,
                                  deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype)(x).astype(jnp.float32)


class _CausalDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, mem_pos, causal, mem_pad, deterministic):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype)
        x = x + attn(x, x, x, mask=causal[None, None])
        x = nn.LayerNorm(dtype=self.dtype)(x)
        mem_mask = None if mem_pad is None else (~mem_pad)[:, None, None, :]
        cross = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype)
        x = x + cross(x, memory + mem_pos, memory, mask=mem_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(x)
