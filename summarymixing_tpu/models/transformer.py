"""Transformer encoder/decoder and NormalizedEmbedding.

Capability parity with reference Transformer.py:
- TransformerEncoderLayer (:338-527): pre/post-LN, mixer dispatch (incl.
  SummaryMixing), ffn_type "regularFFN" or "1dcnn" (two Conv1d with causal or
  same padding, :439-458). NOTE the reference's SummaryMixing wiring here is
  broken (constructed without `nhead`, called with a nonexistent
  `attention_mask=` kwarg, Transformer.py:428-437,499 — crashes upstream);
  this implementation wires it correctly (sum_mask + pad_mask).
- TransformerEncoder (:529-690): stack + final LN eps 1e-6 + layerdrop
  (:670-680). Layerdrop here uses a per-layer Bernoulli and selects
  layer-out vs identity (same training semantics; the compiled graph is
  static so no compute is saved, which is the XLA-friendly formulation).
- TransformerDecoder(Layer) (:693-988): self-attn + cross-attn + FFN,
  pre/post-LN, per-layer norms eps 1e-6.
- NormalizedEmbedding (:991-1021): embedding scaled by sqrt(d_model).

Mask convention: float 1=valid/allowed everywhere (see ops/masks.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.attention import (
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosMHAXL,
)
from summarymixing_tpu.models.mixers import apply_mixer, make_mixer

Array = jax.Array


class Conv1dFFN(nn.Module):
    """The "1dcnn" ffn_type: Conv1d(d->ffn, k1) -> ReLU -> Conv1d(ffn->d, k2)
    with causal or same padding (reference Transformer.py:444-458)."""

    d_ffn: int
    d_model: int
    kernel_sizes: Sequence[int] = (3, 3)
    causal: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i, (feats, k) in enumerate(
            zip((self.d_ffn, self.d_model), self.kernel_sizes)
        ):
            if self.causal:
                x = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
                padding = "VALID"
            else:
                padding = "SAME"
            x = nn.Conv(
                features=feats,
                kernel_size=(k,),
                padding=padding,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = jax.nn.relu(x)
        return x


class TransformerEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    nhead: int
    dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    normalize_before: bool = True
    attention_type: str = "SummaryMixing"
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_size_list: Sequence[int] = (3, 3)
    causal: bool = False
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    # NOTE: deliberately overridden to d_model inside the layer — the mixer
    # output feeds the residual stream. Kept only for signature parity with
    # the Branchformer stack (which consumes it in its merge MLP instead).
    summary_out_dim: int = 1024
    mode: str = "SummaryMixing"
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mixer = make_mixer(
            self.attention_type,
            self.d_model,
            self.nhead,
            self.dropout_rate,
            local_proj_hid_dim=self.local_proj_hid_dim,
            local_proj_out_dim=self.local_proj_out_dim,
            summary_hid_dim=self.summary_hid_dim,
            # Output must flow back into the residual stream: d_model.
            summary_out_dim=self.d_model,
            mode=self.mode,
            hypernet_size=self.d_ffn,
            mask_pos_future=self.causal,
            name="self_att",
            **common,
        )
        if self.ffn_type == "regularFFN":
            self.pos_ffn = PositionalwiseFeedForward(
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                name="pos_ffn",
                **common,
            )
        elif self.ffn_type == "1dcnn":
            self.pos_ffn = Conv1dFFN(
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                kernel_sizes=tuple(self.ffn_cnn_kernel_size_list),
                causal=self.causal,
                name="pos_ffn",
                **common,
            )
        else:
            raise ValueError(f"unknown ffn_type {self.ffn_type!r}")
        self.norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1", **common)
        self.norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2", **common)
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        src1 = self.norm1(x) if self.normalize_before else x
        out = apply_mixer(
            self.mixer,
            self.attention_type,
            src1,
            attn_mask=src_mask,
            pad_mask=pad_mask,
            pos_embs=pos_embs,
            deterministic=deterministic,
        )
        x = x + self.dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        src1 = self.norm2(x) if self.normalize_before else x
        out = self.pos_ffn(src1, deterministic=deterministic)
        x = x + self.dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        return x

    # -- incremental decoding (causal regularMHA self-attention only; used
    # by TransformerLM fusion in beam search) --------------------------------
    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> dict:
        if self.attention_type not in ("regularMHA", "vanillaMHA"):
            raise ValueError("KV-cached stepping requires regularMHA")
        h, hd = self.nhead, self.d_model // self.nhead
        return {
            "k": jnp.zeros((batch, max_len, h, hd), dtype),
            "v": jnp.zeros((batch, max_len, h, hd), dtype),
        }

    def step(self, x_t: Array, pos, cache: dict):
        """One causal position: x_t [B, D] -> ([B, D], cache')."""
        src1 = self.norm1(x_t) if self.normalize_before else x_t
        out, k, v = self.mixer.step(src1, cache["k"], cache["v"], pos,
                                    append=True)
        x = x_t + out
        if not self.normalize_before:
            x = self.norm1(x)
        src1 = self.norm2(x) if self.normalize_before else x
        out = self.pos_ffn(src1[:, None], deterministic=True)[:, 0]
        x = x + out
        if not self.normalize_before:
            x = self.norm2(x)
        return x, {"k": k, "v": v}


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    normalize_before: bool = True
    causal: bool = False
    layerdrop_prob: float = 0.0
    attention_type: str = "regularMHA"
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_size_list: Sequence[int] = (3, 3)
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    summary_out_dim: int = 1024
    mode: str = "SummaryMixing"
    remat: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # remat: recompute layer activations in the backward pass (O(T)
        # peak activation memory); wraps __call__ only — init_cache/step
        # stay plain.
        layer_cls = (nn.remat(TransformerEncoderLayer, static_argnums=(5,))
                     if self.remat else TransformerEncoderLayer)
        self.layers = [
            layer_cls(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                ffn_type=self.ffn_type,
                ffn_cnn_kernel_size_list=self.ffn_cnn_kernel_size_list,
                causal=self.causal,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                summary_out_dim=self.summary_out_dim,
                mode=self.mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="norm")

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        use_layerdrop = self.layerdrop_prob > 0.0 and not deterministic
        if use_layerdrop:
            keys = jax.random.uniform(
                self.make_rng("layerdrop"), (self.num_layers,)
            )
        for i, layer in enumerate(self.layers):
            out = layer(x, src_mask, pad_mask, pos_embs, deterministic)
            if use_layerdrop:
                keep = keys[i] > self.layerdrop_prob
                x = jnp.where(keep, out, x)
            else:
                x = out
        return self.norm(x)

    # -- incremental decoding (causal LM use) --------------------------------
    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return tuple(
            layer.init_cache(batch, max_len, dtype) for layer in self.layers
        )

    def step(self, x_t: Array, pos, cache):
        new_cache = []
        for layer, c in zip(self.layers, cache):
            x_t, c = layer.step(x_t, pos, c)
            new_cache.append(c)
        return self.norm(x_t), tuple(new_cache)


class TransformerDecoderLayer(nn.Module):
    """Decoder layer. attention_type selects the SELF-attention mixer:
    regularMHA / RelPosMHAXL (reference behaviour, Transformer.py:744-760),
    or "SummaryMixing" — the paper's Summary Decoder variant (README.md:35,
    arXiv:2307.07421 §4.4), which this reference branch dropped (its decoder
    is hardwired to regularMHA, Transformer.py:274). Causality is enforced
    with a lookahead sum_mask; cross-attention stays regularMHA."""

    d_model: int
    d_ffn: int
    nhead: int
    dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    normalize_before: bool = True
    attention_type: str = "regularMHA"
    causal: bool = True
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    mode: str = "SummaryMixing"
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        from summarymixing_tpu.models.mixers import make_mixer

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.attention_type == "SummaryMixing":
            self.self_attn = make_mixer(
                "SummaryMixing", self.d_model, self.nhead, self.dropout_rate,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                summary_out_dim=self.d_model,
                mode=self.mode,
                name="self_attn",
                **common,
            )
            self.cross_attn = MultiheadAttention(
                d_model=self.d_model, nhead=self.nhead,
                dropout_rate=self.dropout_rate, name="cross_attn", **common,
            )
            self.pos_ffn = PositionalwiseFeedForward(
                d_ffn=self.d_ffn, d_model=self.d_model,
                dropout_rate=self.dropout_rate, activation=self.activation,
                name="pos_ffn", **common,
            )
            self.norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1", **common)
            self.norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2", **common)
            self.norm3 = nn.LayerNorm(epsilon=1e-6, name="norm3", **common)
            self.dropout = nn.Dropout(rate=self.dropout_rate)
            return
        if self.attention_type == "regularMHA":
            attn = lambda name: MultiheadAttention(  # noqa: E731
                d_model=self.d_model, nhead=self.nhead,
                dropout_rate=self.dropout_rate, name=name, **common,
            )
        elif self.attention_type == "RelPosMHAXL":
            attn = lambda name: RelPosMHAXL(  # noqa: E731
                d_model=self.d_model, nhead=self.nhead,
                dropout_rate=self.dropout_rate,
                mask_pos_future=self.causal, name=name, **common,
            )
        else:
            raise ValueError(
                f"decoder supports regularMHA/RelPosMHAXL, got {self.attention_type!r}"
            )
        self.self_attn = attn("self_attn")
        self.cross_attn = attn("cross_attn")
        self.pos_ffn = PositionalwiseFeedForward(
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            activation=self.activation,
            name="pos_ffn",
            **common,
        )
        self.norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1", **common)
        self.norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2", **common)
        self.norm3 = nn.LayerNorm(epsilon=1e-6, name="norm3", **common)
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Optional[Array] = None,
        memory_mask: Optional[Array] = None,
        tgt_pad_mask: Optional[Array] = None,
        memory_pad_mask: Optional[Array] = None,
        pos_embs_tgt: Optional[Array] = None,
        pos_embs_src: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        t1 = self.norm1(tgt) if self.normalize_before else tgt
        if self.attention_type == "SummaryMixing":
            from summarymixing_tpu.models.mixers import apply_mixer

            out = apply_mixer(
                self.self_attn, "SummaryMixing", t1,
                attn_mask=tgt_mask, pad_mask=tgt_pad_mask,
                deterministic=deterministic,
            )
        else:
            out, _ = self.self_attn(
                t1, t1, t1,
                attn_mask=tgt_mask,
                pad_mask=tgt_pad_mask,
                pos_embs=pos_embs_tgt,
                deterministic=deterministic,
            )
        tgt = tgt + self.dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            tgt = self.norm1(tgt)

        t1 = self.norm2(tgt) if self.normalize_before else tgt
        out, _ = self.cross_attn(
            t1, memory, memory,
            attn_mask=memory_mask,
            pad_mask=memory_pad_mask,
            pos_embs=pos_embs_src,
            deterministic=deterministic,
        )
        tgt = tgt + self.dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            tgt = self.norm2(tgt)

        t1 = self.norm3(tgt) if self.normalize_before else tgt
        out = self.pos_ffn(t1, deterministic=deterministic)
        tgt = tgt + self.dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            tgt = self.norm3(tgt)
        return tgt

    # -- incremental decoding (KV cache for regularMHA; running-mean
    # carry for the Summary Decoder) -----------------------------------------
    def init_cache(self, memory: Array, max_len: int,
                   rows: Optional[int] = None) -> dict:
        """Per-layer decode cache. `rows` (beam search): number of
        hypothesis rows N = B*beam for the PER-HYPOTHESIS state (self-attn
        KV / summary carry), while the encoder-derived cross-attention
        K/V stays at memory's B rows — it is identical across an
        utterance's beams, and keeping it untiled removes both the
        O(beam) HBM copy and the per-step parent-gather traffic in the
        beam loop (ops/attention.py::_step_grouped maps rows by
        n // beam)."""
        if self.attention_type not in ("regularMHA", "SummaryMixing"):
            raise ValueError(
                "cached decoding supports regularMHA and SummaryMixing")
        mem_k, mem_v = self.cross_attn.kv(memory)
        b = rows or memory.shape[0]
        if self.attention_type == "SummaryMixing":
            # the causal summary is a running mean: O(1) carry per step
            # where MHA needs an O(max_len) KV buffer
            return {
                "sm": self.self_attn.decode_init(b),
                "mem_k": mem_k,
                "mem_v": mem_v,
            }
        h, hd = self.nhead, self.d_model // self.nhead
        return {
            "self_k": jnp.zeros((b, max_len, h, hd), mem_k.dtype),
            "self_v": jnp.zeros((b, max_len, h, hd), mem_v.dtype),
            "mem_k": mem_k,
            "mem_v": mem_v,
        }

    def step(
        self,
        x_t: Array,
        pos,
        cache: dict,
        memory_pad_mask: Optional[Array] = None,
    ):
        """One decoding position: x_t [B, D] -> ([B, D], cache')."""
        t1 = self.norm1(x_t) if self.normalize_before else x_t
        if self.attention_type == "SummaryMixing":
            out, sm = self.self_attn.decode_step(t1, cache["sm"])
            cache_self = dict(cache, sm=sm)
        else:
            out, sk, sv = self.self_attn.step(
                t1, cache["self_k"], cache["self_v"], pos, append=True
            )
            cache_self = dict(cache, self_k=sk, self_v=sv)
        x = x_t + out
        if not self.normalize_before:
            x = self.norm1(x)
        t1 = self.norm2(x) if self.normalize_before else x
        out, _, _ = self.cross_attn.step(
            t1, cache["mem_k"], cache["mem_v"], pos,
            pad_mask=memory_pad_mask, append=False,
        )
        x = x + out
        if not self.normalize_before:
            x = self.norm2(x)
        t1 = self.norm3(x) if self.normalize_before else x
        out = self.pos_ffn(t1[:, None], deterministic=True)[:, 0]
        x = x + out
        if not self.normalize_before:
            x = self.norm3(x)
        return x, cache_self


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    normalize_before: bool = True
    attention_type: str = "regularMHA"
    causal: bool = True
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    mode: str = "SummaryMixing"
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                causal=self.causal,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                mode=self.mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="norm")

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Optional[Array] = None,
        memory_mask: Optional[Array] = None,
        tgt_pad_mask: Optional[Array] = None,
        memory_pad_mask: Optional[Array] = None,
        pos_embs_tgt: Optional[Array] = None,
        pos_embs_src: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        for layer in self.layers:
            tgt = layer(
                tgt, memory, tgt_mask, memory_mask, tgt_pad_mask,
                memory_pad_mask, pos_embs_tgt, pos_embs_src, deterministic,
            )
        return self.norm(tgt)

    # -- incremental decoding ------------------------------------------------
    def init_cache(self, memory: Array, max_len: int,
                   rows: Optional[int] = None):
        return tuple(layer.init_cache(memory, max_len, rows)
                     for layer in self.layers)

    def step(
        self,
        x_t: Array,
        pos,
        cache,
        memory_pad_mask: Optional[Array] = None,
    ):
        """x_t [B, D] at position pos -> (normed hidden [B, D], cache')."""
        new_cache = []
        for layer, c in zip(self.layers, cache):
            x_t, c = layer.step(x_t, pos, c, memory_pad_mask)
            new_cache.append(c)
        return self.norm(x_t), tuple(new_cache)


class NormalizedEmbedding(nn.Module):
    """Embedding scaled by sqrt(d_model) (reference Transformer.py:991-1021)."""

    d_model: int
    vocab: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        emb = nn.Embed(
            num_embeddings=self.vocab,
            features=self.d_model,
            param_dtype=self.param_dtype,
            name="emb",
        )(tokens)
        return emb * jnp.sqrt(jnp.asarray(self.d_model, emb.dtype))
