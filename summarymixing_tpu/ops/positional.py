"""Positional encodings.

- sinusoid_table / PositionalEncoding: absolute sinusoidal encoding
  (reference Transformer.py:284-335).
- relpos_xl_table / RelPosEncXL: Transformer-XL style relative positions
  [1, 2T-1, D] for RelPosMHAXL (speechbrain.nnet.attention.RelPosEncXL,
  demanded by e.g. reference Conformer.py:422-429).

Tables are computed inside jit (pure functions of static T); XLA constant-
folds them, so there is no buffer to manage.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def sinusoid_table(length: int, dim: int, dtype=jnp.float32) -> Array:
    """[length, dim]: PE(pos, 2i) = sin(pos/10000^(2i/d)), PE(pos, 2i+1)=cos."""
    if dim % 2:
        raise ValueError(f"sinusoidal encoding needs even dim, got {dim}")
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    inv_freq = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    angles = pos * inv_freq[None, :]
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


def positional_encoding(length: int, dim: int, dtype=jnp.float32) -> Array:
    """[1, length, dim] absolute sinusoidal encoding to add to inputs."""
    return sinusoid_table(length, dim, dtype)[None]


def relpos_xl_table(length: int, dim: int, dtype=jnp.float32) -> Array:
    """[1, 2*length-1, dim] encodings for relative positions
    length-1, ..., 1, 0, -1, ..., -(length-1) (query index minus key index),
    ordered from the most-past to the most-future key as used by TXL-style
    attention with the standard rel-shift."""
    pos = jnp.arange(length - 1, -length, -1, dtype=jnp.float32)[:, None]
    inv_freq = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    angles = pos * inv_freq[None, :]
    pe = jnp.zeros((2 * length - 1, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe[None].astype(dtype)
