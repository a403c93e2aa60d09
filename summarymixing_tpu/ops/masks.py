"""Mask builders. ONE convention everywhere: multiplicative float masks,
1 = valid/allowed, 0 = masked.

This adopts the SummaryMixing cell's convention globally and deletes the
reference's dual-polarity machinery (`masked_false_or_true`,
reference Conformer.py:327-331, TransformerASR.py:344-347,437-438), which
existed only to bridge torch's True=masked attention masks with the cell's
1=valid multiplicative masks. Attention modules convert to additive -inf
internally.

Capability parity (reference locations):
- length_to_mask        <- speechbrain length_to_mask / get_mask_from_lengths
                           (Transformer.py:1097-1123, inverted polarity)
- lookahead_mask        <- get_lookahead_mask (Transformer.py:1064-1095,
                           -inf additive there; 1=allowed float here)
- key_padding_mask_from_tokens <- get_key_padding_mask (Transformer.py:1024-1061)
- chunked_context_mask  <- make_transformer_src_mask chunked path
                           (TransformerASR.py:85-110)

All functions are jit-safe for static T (shapes are static under bucketing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def length_to_mask(lengths: Array, max_len: int, dtype=jnp.float32) -> Array:
    """[B] lengths -> [B, T] float mask, 1 for t < length."""
    pos = jnp.arange(max_len)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def rel_length_to_mask(rel_lens: Array, max_len: int, dtype=jnp.float32) -> Array:
    """SpeechBrain-style relative lengths (wav_len in [0,1]) -> [B, T] mask.
    abs_len = round(rel_len * T) (reference TransformerASR.py:158)."""
    abs_len = jnp.round(rel_lens * max_len).astype(jnp.int32)
    return length_to_mask(abs_len, max_len, dtype)


def key_padding_mask_from_tokens(tokens: Array, pad_idx: int = 0, dtype=jnp.float32) -> Array:
    """[B, U] int tokens -> [B, U] float mask, 1 where token != pad_idx."""
    return (tokens != pad_idx).astype(dtype)


def lookahead_mask(size: int, dtype=jnp.float32) -> Array:
    """[T, T] float mask, 1 where target may attend (s <= t)."""
    return jnp.tril(jnp.ones((size, size), dtype))


def chunked_context_mask(
    size: int,
    chunk_size: int,
    left_context_chunks: Optional[int] = None,
    dtype=jnp.float32,
) -> Array:
    """Dynamic-chunk-training attention/summary mask, [T, T] float 1=allowed.

    Frame t may see frames s with s < (t//chunk + 1)*chunk (everything up to
    the end of its own chunk), and — if left context is limited — s >=
    (t//chunk - left_context_chunks)*chunk. Matches the reference's chunked
    src mask (TransformerASR.py:85-110) in the 1=valid polarity.

    chunk_size / left_context_chunks may be traced scalars (the DCT sampler
    draws them per step); `size` must be static.
    """
    t_idx = jnp.arange(size)
    chunk_of = t_idx // chunk_size
    upper = (chunk_of + 1) * chunk_size  # exclusive upper bound per row
    allowed = t_idx[None, :] < upper[:, None]
    if left_context_chunks is not None:
        lower = (chunk_of - left_context_chunks) * chunk_size
        allowed = allowed & (t_idx[None, :] >= lower[:, None])
    return allowed.astype(dtype)


def combine_padding(sum_mask: Optional[Array], pad_mask: Optional[Array]) -> Optional[Array]:
    """Embed a [B, T] padding mask into a [T, T] (or [B, T, T]) summary mask,
    zeroing padded *columns* so padded frames never contribute to any summary.
    Returns [B, T, T] when both are given."""
    if sum_mask is None or pad_mask is None:
        return sum_mask
    if sum_mask.ndim == 3:            # already per-utterance [B, T, T]
        return sum_mask * pad_mask[:, None, :]
    return sum_mask[None, :, :] * pad_mask[:, None, :]


def mask_to_additive(mask: Optional[Array], dtype=jnp.float32) -> Optional[Array]:
    """1=allowed float/bool mask -> additive bias (0 where allowed, large
    negative where masked) for softmax attention."""
    if mask is None:
        return None
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(mask > 0, jnp.asarray(0.0, dtype), neg)
