"""Mixer selection shared by the Branchformer / Conformer / Transformer
encoder layers (mirrors the dispatch at reference Branchformer.py:184-226,
Conformer.py:416-447, Transformer.py:461-483).

A "mixer" is any token-mixing module replacing self-attention. The factory
returns (module, kind); layers call `apply_mixer` which normalises the call
signature across SummaryMixing (sum_mask/pad_mask) and attention-style
mixers (attn_mask/pad_mask/pos_embs).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.attention import (
    HyperMixing,
    MultiheadAttention,
    RelPosMHAXL,
)
from summarymixing_tpu.ops.masks import combine_padding
from summarymixing_tpu.ops.summary_mixing import SummaryMixing

Array = jax.Array

ATTENTION_TYPES = (
    "regularMHA",
    "RelPosMHAXL",
    "hypermixing",
    "SummaryMixing",
    "vanillaMHA",
    "cnnonly",
)


def make_mixer(
    attention_type: str,
    d_model: int,
    nhead: int,
    dropout_rate: float,
    *,
    local_proj_hid_dim: Sequence[int] = (512,),
    local_proj_out_dim: int = 512,
    summary_hid_dim: Sequence[int] = (1024,),
    summary_out_dim: int = 1024,
    mode: str = "SummaryMixing",
    activation: Optional[Callable] = None,
    hypernet_size: Optional[int] = None,
    mask_pos_future: bool = False,
    dtype=None,
    param_dtype=jnp.float32,
    name: str = "mixer",
):
    """Build the configured token mixer (call inside setup())."""
    if attention_type not in ATTENTION_TYPES:
        raise ValueError(
            f"attention_type must be one of {ATTENTION_TYPES}, got {attention_type!r}"
        )
    common = dict(dtype=dtype, param_dtype=param_dtype, name=name)
    if attention_type in ("regularMHA", "vanillaMHA"):
        return MultiheadAttention(
            d_model=d_model, nhead=nhead, dropout_rate=dropout_rate, **common
        )
    if attention_type == "RelPosMHAXL":
        return RelPosMHAXL(
            d_model=d_model,
            nhead=nhead,
            dropout_rate=dropout_rate,
            mask_pos_future=mask_pos_future,
            **common,
        )
    if attention_type == "hypermixing":
        return HyperMixing(
            d_model=d_model,
            hypernet_size=hypernet_size or local_proj_hid_dim[0],
            nhead=nhead,
            tied=False,
            dropout_rate=dropout_rate,
            **common,
        )
    if attention_type == "SummaryMixing":
        kwargs = dict(
            enc_dim=d_model,
            nhead=nhead,
            local_proj_hid_dim=tuple(local_proj_hid_dim),
            local_proj_out_dim=local_proj_out_dim,
            summary_hid_dim=tuple(summary_hid_dim),
            summary_out_dim=summary_out_dim,
            dropout_rate=dropout_rate,
            mode=mode,
            **common,
        )
        if activation is not None:
            kwargs["activation"] = activation
        return SummaryMixing(**kwargs)
    # "cnnonly" is a Branchformer-only option (the cgMLP branch alone,
    # reference Branchformer.py:201-204); Branchformer guards it BEFORE
    # calling this factory, so reaching here with it is a caller bug —
    # fail loudly instead of returning an uncallable None
    raise ValueError(
        "attention_type 'cnnonly' is only supported by the Branchformer "
        "encoder (reference Branchformer.py:201-204); conformer/transformer "
        "layers need a token mixer"
    )


def apply_mixer(
    mixer,
    attention_type: str,
    x: Array,
    *,
    attn_mask: Optional[Array] = None,
    pad_mask: Optional[Array] = None,
    pos_embs: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Run the mixer with a normalised signature. attn_mask doubles as the
    SummaryMixing sum_mask ([T, T], 1 = include), with padding columns
    embedded so summaries normalise by the true valid count."""
    if attention_type == "SummaryMixing":
        sum_mask = combine_padding(attn_mask, pad_mask)
        return mixer(x, sum_mask=sum_mask, pad_mask=pad_mask,
                     deterministic=deterministic)
    out, _ = mixer(
        x, x, x,
        attn_mask=attn_mask,
        pad_mask=pad_mask,
        pos_embs=pos_embs,
        deterministic=deterministic,
    )
    return out
