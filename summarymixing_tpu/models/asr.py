"""End-to-end ASR transformer wrapper: input projection, positional
encoding, encoder (transformer / conformer / branchformer), target embedding,
and transformer decoder — plus the encoder-only wrapper used by transducer
recipes.

Capability parity with reference TransformerASR.py:35-741 and the factory
TransformerInterface (Transformer.py:34-281):
- src projection Linear(input_size -> d_model) + dropout (:349-354)
- mask construction from relative wav lengths and targets (:50-180), here in
  the single 1=valid convention (the reference's polarity flip at :437-438 is
  gone by design)
- abs-sine positional encoding added for fixed_abs_sine (and for the
  SummaryMixing encoder), RelPosMHAXL table otherwise; hypermixing gets none
  (:396-407)
- decoder self-attention defaults to regularMHA like the reference
  (Transformer.py:274); `decoder_attention_type="SummaryMixing"` enables
  the paper's Summary Decoder variant (README.md:35) the reference
  branch dropped.
- `encode` / `decode_step` for encoder-only use and beam search (:453-560)
- EncoderWrapper (:687-741) -> `EncoderASR` here.

Streaming (encode_streaming / make_streaming_context, :562-679) is provided
functionally here (ASRStreamingState + encode_streaming) on top of the
conformer's carried state (models/conformer.py::ConformerStreamingState).

Example (mirrors the reference doctest, TransformerASR.py:267-278):

    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu.models.asr import TransformerASR
    >>> asr = TransformerASR(tgt_vocab=10, input_size=24, d_model=32,
    ...     nhead=2, num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
    ...     encoder_module="branchformer", attention_type="SummaryMixing",
    ...     causal=False, csgu_linear_units=64, kernel_size=5,
    ...     local_proj_hid_dim=(16,), local_proj_out_dim=32,
    ...     summary_hid_dim=(16,), summary_out_dim=16)
    >>> src = jnp.ones((2, 8, 24)); tgt = jnp.ones((2, 3), jnp.int32)
    >>> params = asr.init(jax.random.PRNGKey(0), src, tgt)
    >>> enc_out, dec_out = asr.apply(params, src, tgt)
    >>> (enc_out.shape, dec_out.shape)
    ((2, 8, 32), (2, 3, 32))
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from summarymixing_tpu.ops.linear import gelu_exact
from summarymixing_tpu.ops.masks import (
    chunked_context_mask,
    key_padding_mask_from_tokens,
    length_to_mask,
    lookahead_mask,
    rel_length_to_mask,
)
from summarymixing_tpu.ops.positional import positional_encoding, relpos_xl_table
from summarymixing_tpu.models.branchformer import BranchformerEncoder
from summarymixing_tpu.models.conformer import ConformerEncoder
from summarymixing_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerEncoder,
)

Array = jax.Array


@dataclass(frozen=True)
class DynChunkTrainConfig:
    """Dynamic Chunk Training configuration (mirrors
    speechbrain.utils.dynamic_chunk_training.DynChunkTrainConfig, demanded by
    reference Conformer.py:28 and the transducer recipes).

    chunk_size / left_context_size may be traced scalars so one compiled
    program serves every sampled configuration."""

    chunk_size: object  # int or traced scalar, in frames
    left_context_size: object | None = None  # in CHUNKS; None = infinite

    def is_infinite_left_context(self) -> bool:
        return self.left_context_size is None

    def left_context_size_frames(self):
        if self.left_context_size is None:
            raise ValueError("infinite left context has no frame count")
        return self.left_context_size * self.chunk_size


@struct.dataclass
class ASRStreamingState:
    """Functional replacement for the reference's mutable
    TransformerASRStreamingContext (TransformerASR.py:35-48)."""

    encoder: object          # ConformerStreamingState
    frame_offset: jax.Array  # [B] absolute position of each row's next frame 0
    # chunk size the state was built for (static; 0 = unchecked) — chunks
    # of a different size would silently break DCT train/infer equivalence
    chunk_size: int = struct.field(pytree_node=False, default=0)


class TransformerASR(nn.Module):
    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    positional_encoding: Optional[str] = "fixed_abs_sine"
    # pre-norm, the reference default (Transformer.py:141) and every
    # recipe's explicit setting (branchformer yaml:175, transducer yaml:272)
    normalize_before: bool = True
    kernel_size: int = 31
    use_bias: bool = True
    encoder_module: str = "transformer"
    conformer_activation: Callable = jax.nn.silu
    branchformer_activation: Callable = gelu_exact
    attention_type: str = "SummaryMixing"
    max_length: int = 2500
    # reference default (TransformerASR.py:399): non-causal encoder; the
    # decoder is always causal regardless
    causal: bool = False
    csgu_linear_units: int = 3072
    gate_activation: Callable = lambda x: x
    use_linear_after_conv: bool = False
    act_int8: bool = False  # W8A8 cgMLP projections (ops/quant.py)
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    summary_out_dim: int = 1024
    mode: str = "SummaryMixing"
    # Decoder self-attention mixer. The reference branch hardwires
    # "regularMHA" (Transformer.py:274); "SummaryMixing" gives the paper's
    # Summary Decoder variant (README.md:35, arXiv:2307.07421 §4.4) which
    # that branch dropped. Cross-attention stays regularMHA either way.
    decoder_attention_type: str = "regularMHA"
    # rematerialize encoder layers in the backward pass (memory for FLOPs)
    remat: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.decoder_attention_type not in ("regularMHA", "vanillaMHA",
                                               "SummaryMixing"):
            # RelPosMHAXL needs pos tables the decode paths do not build,
            # and its rel-shift is square-attention-only (cross-attention
            # T != S is undefined) — reject up front instead of crashing
            # deep in the first forward
            raise ValueError(
                "decoder_attention_type must be regularMHA (the reference, "
                "Transformer.py:274) or SummaryMixing (the paper's Summary "
                f"Decoder); got {self.decoder_attention_type!r}"
            )
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.src_proj = nn.Dense(self.d_model, name="src_proj", **common)
        self.src_dropout = nn.Dropout(rate=self.dropout_rate)

        if self.encoder_module == "transformer":
            self.encoder = TransformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                normalize_before=self.normalize_before,
                causal=self.causal,
                attention_type=self.attention_type,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                summary_out_dim=self.summary_out_dim,
                mode=self.mode,
                remat=self.remat,
                name="encoder",
                **common,
            )
        elif self.encoder_module == "conformer":
            self.encoder = ConformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                use_bias=self.use_bias,
                dropout_rate=self.dropout_rate,
                causal=self.causal,
                attention_type=self.attention_type,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                mode=self.mode,
                activation=self.conformer_activation,
                remat=self.remat,
                name="encoder",
                **common,
            )
        elif self.encoder_module == "branchformer":
            self.encoder = BranchformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                dropout_rate=self.dropout_rate,
                attention_type=self.attention_type,
                csgu_linear_units=self.csgu_linear_units,
                gate_activation=self.gate_activation,
                use_linear_after_conv=self.use_linear_after_conv,
                act_int8=self.act_int8,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                summary_out_dim=self.summary_out_dim,
                mode=self.mode,
                activation=self.branchformer_activation,
                remat=self.remat,
                name="encoder",
                **common,
            )
        else:
            raise ValueError(f"unknown encoder_module {self.encoder_module!r}")

        if self.num_decoder_layers > 0:
            self.tgt_emb = NormalizedEmbedding(
                d_model=self.d_model,
                vocab=self.tgt_vocab,
                param_dtype=self.param_dtype,
                name="tgt_emb",
            )
            self.decoder = TransformerDecoder(
                num_layers=self.num_decoder_layers,
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                normalize_before=self.normalize_before,
                # reference default regularMHA (Transformer.py:274);
                # "SummaryMixing" = the paper's Summary Decoder
                attention_type=self.decoder_attention_type,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.d_model,
                summary_hid_dim=self.summary_hid_dim,
                # the decoder's self-attention is causal (lookahead
                # sum_mask), which lite cannot express — the paper's
                # Summary Decoder is the full cell (arXiv:2307.07421 §4.4)
                mode=("SummaryMixing"
                      if self.mode == "SummaryMixing-lite" else self.mode),
                causal=True,
                name="decoder",
                **common,
            )

    # -- helpers -------------------------------------------------------------
    def _src_masks(
        self,
        t: int,
        wav_len: Optional[Array],
        dynchunktrain: Optional[DynChunkTrainConfig],
    ):
        pad_mask = None
        if wav_len is not None:
            pad_mask = rel_length_to_mask(wav_len, t)
        src_mask = None
        if dynchunktrain is not None:
            # like the reference: DCT is conformer-only (Branchformer.py:469
            # asserts; the cgMLP conv would leak future context across chunk
            # boundaries) and incompatible with strict causality
            # (TransformerASR.py:74 asserts)
            if self.causal:
                raise ValueError("dynchunktrain is incompatible with causal")
            if self.encoder_module != "conformer":
                raise ValueError(
                    "Dynamic Chunk Training requires encoder_module="
                    f"'conformer', got {self.encoder_module!r}"
                )
            src_mask = chunked_context_mask(
                t, dynchunktrain.chunk_size, dynchunktrain.left_context_size
            )
        elif self.causal:
            src_mask = lookahead_mask(t)
        return pad_mask, src_mask

    def _encode_inner(
        self,
        src: Array,
        pad_mask: Optional[Array],
        src_mask: Optional[Array],
        chunk_size: Optional[Array],
        deterministic: bool,
    ) -> Array:
        if src.ndim == 4:
            b, t, f, c = src.shape
            src = src.reshape(b, t, f * c)
        t = src.shape[1]
        src = self.src_proj(src)
        src = self.src_dropout(src, deterministic=deterministic)

        pos_embs = None
        if self.attention_type == "RelPosMHAXL":
            pos_embs = relpos_xl_table(t, self.d_model, src.dtype)
        elif (
            self.positional_encoding == "fixed_abs_sine"
            and self.attention_type != "hypermixing"
        ):
            src = src + positional_encoding(t, self.d_model, src.dtype)

        kwargs = dict(deterministic=deterministic)
        if self.encoder_module == "conformer":
            kwargs["chunk_size"] = chunk_size
        return self.encoder(src, src_mask, pad_mask, pos_embs, **kwargs)

    def _decode_inner(
        self,
        tgt: Array,
        enc_out: Array,
        enc_pad_mask: Optional[Array],
        tgt_pad_mask: Optional[Array],
        deterministic: bool,
    ) -> Array:
        u = tgt.shape[1]
        x = self.tgt_emb(tgt)
        x = x + positional_encoding(u, self.d_model, x.dtype)
        return self.decoder(
            x,
            enc_out,
            tgt_mask=lookahead_mask(u),
            tgt_pad_mask=tgt_pad_mask,
            memory_pad_mask=enc_pad_mask,
            deterministic=deterministic,
        )

    # -- public API ----------------------------------------------------------
    def __call__(
        self,
        src: Array,
        tgt: Optional[Array] = None,
        wav_len: Optional[Array] = None,
        pad_idx: int = 0,
        dynchunktrain: Optional[DynChunkTrainConfig] = None,
        deterministic: bool = True,
    ) -> Tuple[Array, Optional[Array]]:
        """src [B, T, F] (or [B, T, F, C]); tgt [B, U] int tokens;
        wav_len [B] relative lengths in [0, 1]. Returns (enc_out, dec_out)."""
        t = src.shape[1]
        pad_mask, src_mask = self._src_masks(t, wav_len, dynchunktrain)
        chunk = dynchunktrain.chunk_size if dynchunktrain is not None else None
        enc_out = self._encode_inner(src, pad_mask, src_mask, chunk, deterministic)
        if tgt is None or self.num_decoder_layers == 0:
            return enc_out, None
        tgt_pad_mask = key_padding_mask_from_tokens(tgt, pad_idx)
        dec_out = self._decode_inner(
            tgt, enc_out, pad_mask, tgt_pad_mask, deterministic
        )
        return enc_out, dec_out

    def encode(
        self,
        src: Array,
        wav_len: Optional[Array] = None,
        dynchunktrain: Optional[DynChunkTrainConfig] = None,
        deterministic: bool = True,
    ) -> Array:
        """Encoder-only forward (reference TransformerASR.py:501-560)."""
        t = src.shape[1]
        pad_mask, src_mask = self._src_masks(t, wav_len, dynchunktrain)
        chunk = dynchunktrain.chunk_size if dynchunktrain is not None else None
        return self._encode_inner(src, pad_mask, src_mask, chunk, deterministic)

    def decode_step(
        self,
        tgt: Array,
        enc_out: Array,
        enc_len: Optional[Array] = None,
    ) -> Array:
        """One decoding step for search: run the decoder over the prefix and
        return the hidden state of the last position (reference :453-499)."""
        return self.decode_prefix(tgt, enc_out, enc_len)[:, -1]

    def decode_prefix(
        self,
        tgt: Array,
        enc_out: Array,
        enc_len: Optional[Array] = None,
    ) -> Array:
        """Full-prefix decoder states [B, U, D] (teacher-forced scoring)."""
        enc_pad_mask = None
        if enc_len is not None:
            enc_pad_mask = length_to_mask(enc_len, enc_out.shape[1])
        return self._decode_inner(tgt, enc_out, enc_pad_mask, None, True)

    # -- KV-cached incremental decoding -------------------------------------
    def decode_cache_init(self, enc_out: Array, max_len: int,
                          rows: Optional[int] = None):
        """Per-layer KV caches for incremental decoding (beam search):
        precomputes cross-attention K/V from enc_out once. Pass enc_out
        UNTILED [B, T, D] with rows=B*beam under beam search — the
        per-hypothesis state gets `rows` rows while the cross-attention
        K/V stays per-utterance (models/transformer.py::init_cache)."""
        return self.decoder.init_cache(enc_out, max_len, rows)

    def decode_step_cached(
        self,
        tok_t: Array,
        pos,
        cache,
        enc_pad_mask: Optional[Array] = None,
    ):
        """One token step: tok_t [B] int -> (hidden [B, D], cache').
        O(pos) attention instead of re-running the full prefix."""
        x = self.tgt_emb(tok_t[:, None])[:, 0]
        table = positional_encoding(self.max_length, self.d_model, x.dtype)
        pe = jax.lax.dynamic_slice(table, (0, pos, 0), (1, 1, self.d_model))
        x = x + pe[0, 0]
        return self.decoder.step(x, pos, cache, enc_pad_mask)

    # -- streaming (functional reference TransformerASR.py:562-679) ---------
    def init_streaming_state(
        self, batch: int, dynchunk: DynChunkTrainConfig, dtype=jnp.float32
    ):
        """Carried state for chunked inference. Requires the conformer
        encoder (like the reference). Unlike the reference's per-chunk
        positional-encoding restart (TransformerASR.py:634-640, a known
        hack), positions here are absolute via a carried frame offset."""
        if self.encoder_module != "conformer":
            raise ValueError("streaming requires encoder_module='conformer'")
        left = dynchunk.left_context_size_frames()
        chunk = dynchunk.chunk_size if isinstance(dynchunk.chunk_size, int) \
            else 0
        return ASRStreamingState(
            encoder=self.encoder.init_streaming_state(batch, left, dtype),
            frame_offset=jnp.zeros((batch,), jnp.int32),
            chunk_size=chunk,
        )

    def encode_streaming(self, src: Array, state: "ASRStreamingState"):
        """Encode one chunk [B, chunk, F] -> ([B, chunk, D], new state).

        Positions are absolute via the carried frame offset; streams longer
        than `max_length` frames post-subsample clamp to the last PE window
        (raise model.max_length for very long streams). The chunk length
        must match the DynChunkTrainConfig the state was built for, or
        boundary semantics no longer match DCT training."""
        if src.ndim == 4:
            b, t, f, c = src.shape
            src = src.reshape(b, t, f * c)
        chunk = src.shape[1]
        if state.chunk_size and chunk != state.chunk_size:
            raise ValueError(
                f"chunk length {chunk} != streaming state's chunk_size "
                f"{state.chunk_size}: mixer context windows and DCConv "
                "boundaries would no longer match DCT training"
            )
        src = self.src_proj(src)
        if (
            self.positional_encoding == "fixed_abs_sine"
            and self.attention_type not in ("hypermixing", "RelPosMHAXL")
        ):
            table = positional_encoding(self.max_length, self.d_model, src.dtype)
            # per-row offsets (one batched state can hold independent
            # streams at different positions — serving slot multiplexer).
            # Offsets past the table clamp to the last contiguous window
            # [max_length - chunk, max_length) — the same semantics as the
            # dynamic_slice this replaces (positions stay distinct; only
            # the window stops advancing for very long streams)
            start = jnp.clip(state.frame_offset, 0, self.max_length - chunk)
            pos = start[:, None] + jnp.arange(chunk)[None, :]
            src = src + table[0][pos]
        pos_embs = None
        if self.attention_type == "RelPosMHAXL":
            total = chunk + state.encoder.layers[0].mha_left.shape[1]
            pos_embs = relpos_xl_table(total, self.d_model, src.dtype)
        out, enc_state = self.encoder.streaming_step(src, state.encoder, pos_embs)
        return out, ASRStreamingState(
            encoder=enc_state, frame_offset=state.frame_offset + chunk,
            chunk_size=state.chunk_size,
        )


class EncoderASR(nn.Module):
    """Encoder-only wrapper whose __call__ == encode (reference
    EncoderWrapper, TransformerASR.py:687-741) — used by transducer recipes."""

    asr: TransformerASR

    def __call__(
        self,
        src: Array,
        wav_len: Optional[Array] = None,
        dynchunktrain: Optional[DynChunkTrainConfig] = None,
        deterministic: bool = True,
    ) -> Array:
        return self.asr.encode(src, wav_len, dynchunktrain, deterministic)


# Alias matching the reference class name (TransformerASR.py:687).
EncoderWrapper = EncoderASR
