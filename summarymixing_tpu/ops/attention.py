"""Attention-family mixers and the position-wise feed-forward block.

Capability parity with the mixers the reference encoders can select
(reference Branchformer.py:184-226, Conformer.py:416-447,
Transformer.py:461-483):

- MultiheadAttention  <- speechbrain MultiheadAttention ("regularMHA"),
  torch scaled-dot-product semantics.
- RelPosMHAXL         <- speechbrain RelPosMHAXL: Transformer-XL relative
  positional attention (Dai et al. 2019) with content/position biases u, v
  and the standard rel-shift trick. Semantically equivalent formulation.
- PositionalwiseFeedForward <- speechbrain PositionalwiseFeedForward
  (Linear -> activation -> dropout -> Linear).

Mask convention: attn_mask [T, S] or [B, T, S] float 1=allowed; pad_mask
[B, S] float 1=valid. Converted to additive bias internally
(ops.masks.mask_to_additive).

TPU notes: attention is computed in the input dtype with fp32 softmax
accumulation (`preferred_element_type`); shapes stay static; the rel-shift
is a reshape/slice, not a gather.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.masks import mask_to_additive

Array = jax.Array


def _merge_masks(
    attn_mask: Optional[Array],
    pad_mask: Optional[Array],
    batch: int,
    tgt_len: int,
    src_len: int,
) -> Optional[Array]:
    """Combine [.., T, S] attn_mask and [B, S] pad_mask into a single
    [B, 1, T, S] additive bias (or None)."""
    allowed = None
    if attn_mask is not None:
        if attn_mask.ndim == 2:
            allowed = jnp.broadcast_to(attn_mask[None], (batch, tgt_len, src_len))
        else:
            allowed = attn_mask
    if pad_mask is not None:
        pm = jnp.broadcast_to(pad_mask[:, None, :], (batch, tgt_len, src_len))
        allowed = pm if allowed is None else allowed * pm
    if allowed is None:
        return None
    return mask_to_additive(allowed)[:, None, :, :]


class MultiheadAttention(nn.Module):
    """Standard scaled-dot-product multi-head attention ("regularMHA"),
    with incremental (KV-cached) step methods for O(1)-per-token decoding."""

    d_model: int
    nhead: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.attn_dropout = nn.Dropout(rate=self.dropout_rate)

    def _heads(self, x: Array) -> Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.nhead, self.d_model // self.nhead)

    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        d, h = self.d_model, self.nhead
        hd = d // h
        b, t, _ = query.shape
        s = key.shape[1]
        q = self._heads(self.q_proj(query))
        k = self._heads(self.k_proj(key))
        v = self._heads(self.v_proj(value))

        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        bias = _merge_masks(attn_mask, pad_mask, b, t, s)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum(
            "bhts,bshd->bthd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = self.out_proj(ctx.reshape(b, t, d))
        return out, (probs if return_attn else None)

    # -- incremental decoding -------------------------------------------------
    def kv(self, x: Array) -> Tuple[Array, Array]:
        """Precompute K/V heads for a static memory: [B, S, H, hd] each."""
        return self._heads(self.k_proj(x)), self._heads(self.v_proj(x))

    def step(
        self,
        x_t: Array,
        k_cache: Array,
        v_cache: Array,
        pos,
        pad_mask: Optional[Array] = None,
        append: bool = True,
    ):
        """One-position attention. x_t [B, D]; k/v_cache [B, S, H, hd].
        With append=True (self-attention), writes this position's K/V at
        `pos` and attends over cache[:pos+1]; with append=False
        (cross-attention), attends over the full cache (use pad_mask).
        Returns (out [B, D], k_cache, v_cache).

        Beam-shared memory (cross-attention under beam search): x_t may
        have N = B*beam rows against a cache of B rows — row n attends
        over utterance n // beam's memory. Keeping the encoder-derived
        K/V UNtiled this way removes the O(beam) cache copies a per-step
        parent gather would otherwise materialise inside the decode loop
        (v5e HBM: 12 x ~177 MB gather temps at the reference beam-66
        test config). pad_mask then has B rows too."""
        d, h = self.d_model, self.nhead
        hd = d // h
        b = x_t.shape[0]
        b_kv = k_cache.shape[0]
        if not append and b_kv != b:
            return self._step_grouped(x_t, k_cache, v_cache, pad_mask)
        q = self.q_proj(x_t).reshape(b, h, hd)
        if append:
            k_t = self.k_proj(x_t).reshape(b, 1, h, hd)
            v_t = self.v_proj(x_t).reshape(b, 1, h, hd)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_t.astype(k_cache.dtype), (0, pos, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_t.astype(v_cache.dtype), (0, pos, 0, 0)
            )
        s = k_cache.shape[1]
        scores = jnp.einsum(
            "bhd,bshd->bhs", q, k_cache, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if append:
            valid = jnp.arange(s)[None, None, :] <= pos
            scores = jnp.where(valid, scores, jnp.finfo(scores.dtype).min)
        if pad_mask is not None:
            scores = jnp.where(
                pad_mask[:, None, :] > 0, scores, jnp.finfo(scores.dtype).min
            )
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhs,bshd->bhd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        ).astype(x_t.dtype)
        out = self.out_proj(ctx.reshape(b, d))
        return out, k_cache, v_cache

    def _step_grouped(
        self,
        x_t: Array,
        k_cache: Array,
        v_cache: Array,
        pad_mask: Optional[Array] = None,
    ):
        """Cross-attention step with beam-shared memory: x_t [N, D]
        (N = B*beam), k/v_cache [B, S, H, hd] — the beam axis rides as
        extra query positions of its utterance (queries are independent
        in cross-attention, so this is exactly per-row attention)."""
        d, h = self.d_model, self.nhead
        hd = d // h
        n = x_t.shape[0]
        b, s = k_cache.shape[0], k_cache.shape[1]
        g = n // b  # beam width
        q = self.q_proj(x_t).reshape(b, g, h, hd)
        scores = jnp.einsum(
            "bghd,bshd->bghs", q, k_cache, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if pad_mask is not None:
            if pad_mask.shape[0] == n:  # beam-tiled mask: fold (rows repeat)
                pad_mask = pad_mask[::g]
            scores = jnp.where(
                pad_mask[:, None, None, :] > 0, scores,
                jnp.finfo(scores.dtype).min,
            )
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bghs,bshd->bghd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        ).astype(x_t.dtype)
        out = self.out_proj(ctx.reshape(n, d))
        return out, k_cache, v_cache


def rel_shift(x: Array) -> Array:
    """TXL relative shift: x [B, H, T, 2T-1] (keys ordered most-past ->
    most-future) -> [B, H, T, T] where out[..., t, s] = x[..., t, (T-1) - t + s].
    Pure reshape/slice — no gather, TPU friendly.

    Square attention only (T queries over T keys): the reshape trick needs
    w == 2T-1 with matching query count. Cross-attention with mismatched
    lengths has no well-defined relative alignment — use regularMHA there
    (the reference's decoders are hardwired regularMHA, Transformer.py:274).
    """
    b, h, t, w = x.shape  # w == 2t - 1
    if w != 2 * t - 1:
        raise ValueError(
            f"rel_shift requires square attention (got {t} queries, "
            f"pos width {w} != 2*{t}-1); RelPosMHAXL cross-attention with "
            "mismatched query/key lengths is unsupported — use regularMHA"
        )
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :]  # drop first row
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


class RelPosMHAXL(nn.Module):
    """Transformer-XL style multi-head attention with relative positional
    encodings (pos_embs [1, 2S-1, D] from ops.positional.relpos_xl_table).

    score = (q + u)·k^T + rel_shift((q + v)·p^T), scaled by 1/sqrt(head_dim).
    """

    d_model: int
    nhead: int
    dropout_rate: float = 0.0
    mask_pos_future: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        if pos_embs is None:
            raise ValueError("RelPosMHAXL requires pos_embs [1, 2S-1, D]")
        d, h = self.d_model, self.nhead
        hd = d // h
        b, t, _ = query.shape
        s = key.shape[1]
        dense = lambda name, feats, bias=True: nn.Dense(  # noqa: E731
            feats, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        q = dense("q_proj", d)(query).reshape(b, t, h, hd)
        k = dense("k_proj", d)(key).reshape(b, s, h, hd)
        v = dense("v_proj", d)(value).reshape(b, s, h, hd)
        p = dense("pos_proj", d, bias=False)(pos_embs).reshape(1, -1, h, hd)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, hd),
                       self.param_dtype)
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, hd),
                        self.param_dtype)

        content = jnp.einsum(
            "bthd,bshd->bhts", q + u.astype(q.dtype), k,
            preferred_element_type=jnp.float32,
        )
        pos = jnp.einsum(
            "bthd,xphd->bhtp", q + vb.astype(q.dtype), p,
            preferred_element_type=jnp.float32,
        )
        pos = rel_shift(pos)  # [B,H,T,S]
        scores = (content + pos) / math.sqrt(hd)

        allowed = attn_mask
        if self.mask_pos_future:
            causal = jnp.tril(jnp.ones((t, s), scores.dtype))
            allowed = causal if allowed is None else allowed * causal
        bias = _merge_masks(allowed, pad_mask, b, t, s)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(rate=self.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum(
            "bhts,bshd->bthd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = dense("out_proj", d)(ctx.reshape(b, t, d))
        return out, (probs if return_attn else None)


class PositionalwiseFeedForward(nn.Module):
    """Linear(d -> d_ffn) -> activation -> dropout -> Linear(d_ffn -> d)."""

    d_ffn: int
    d_model: int
    dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="ffn_in")(x)
        x = self.activation(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="ffn_out")(x)
        return x


class HyperMixing(nn.Module):
    """HyperMixer token mixing (Mai et al., 2022): an MLP mixes tokens with
    weights generated by hypernetworks from the inputs themselves. Linear-time
    alternative mixer, selectable like in the reference
    (Branchformer.py:202-209, Conformer.py:428-435).

    W1 = hyper_in(x) [B, T, hyp], W2 = hyper_out(x) [B, T, hyp]; per head:
    out = W2 @ act(W1^T @ v) (token mixing along T), then output projection.
    `tied=False` keeps separate in/out hypernetworks as the reference does.
    """

    d_model: int
    hypernet_size: int
    nhead: int = 1
    tied: bool = False
    dropout_rate: float = 0.0
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array = None,
        value: Array = None,
        attn_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        x = query
        value = x if value is None else value
        b, t, d = x.shape
        h = self.nhead
        hyp = self.hypernet_size
        dense = lambda name, feats: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        if pad_mask is not None:
            keep = pad_mask[..., None].astype(x.dtype)
            x = x * keep
            value = value * keep
        w1 = dense("hyper_in", hyp * h)(x).reshape(b, t, h, hyp)
        w2 = w1 if self.tied else dense("hyper_out", hyp * h)(x).reshape(b, t, h, hyp)
        v = value.reshape(b, t, h, d // h)
        hidden = jnp.einsum("bthp,bthd->bhpd", w1, v,
                            preferred_element_type=jnp.float32).astype(v.dtype)
        hidden = jax.nn.gelu(hidden, approximate=False)
        mixed = jnp.einsum("bthp,bhpd->bthd", w2, hidden,
                           preferred_element_type=jnp.float32).astype(v.dtype)
        out = dense("out_proj", d)(mixed.reshape(b, t, d))
        return out, None
