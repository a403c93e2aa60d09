"""Conformer encoder (Macaron FFN + mixer + convolution module) with
SummaryMixing support, dynamic-chunk training, and functional streaming.

Capability parity with reference Conformer.py:336-856:
- Layer: x += 0.5*ffn1(x); skip; norm1; mixer; +skip; x += conv_module(x);
  x = norm2(x + 0.5*ffn2(x)) (reference :479-533).
- SummaryMixing mixer forces summary_out_dim == d_model and shares the layer
  dropout (reference :436-447); masks are multiplicative 1=valid (the
  polarity machinery of the reference is deleted globally).
- Dynamic Chunk Training: the [T, T] chunked mask gates the mixer and a
  traced chunk_size gates the convolution (Dynamic Chunk Convolution,
  reference :190-313 — reformulated mask-based for static shapes).
- Streaming: `forward_streaming`-equivalent is expressed as an explicit
  carried state (`ConformerStreamingState`) instead of mutable context
  objects (reference :539-638); see `streaming_step` below and
  `TransformerASR.encode_streaming`.
- Stack final LayerNorm eps 1e-6 (reference :738).

Example (mirrors the reference doctest, Conformer.py:95-102):

    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu.models.conformer import ConformerEncoder
    >>> enc = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=2,
    ...     kernel_size=5, attention_type="SummaryMixing",
    ...     local_proj_hid_dim=(16,), local_proj_out_dim=32,
    ...     summary_hid_dim=(16,), mode="SummaryMixing")
    >>> x = jnp.ones((2, 12, 32))
    >>> params = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(params, x).shape
    (2, 12, 32)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from summarymixing_tpu.ops.attention import PositionalwiseFeedForward
from summarymixing_tpu.ops.convolution import ConvolutionModule
from summarymixing_tpu.models.mixers import apply_mixer, make_mixer

Array = jax.Array


@struct.dataclass
class ConformerLayerStreamingState:
    """Functional replacement for the reference's mutable
    ConformerEncoderLayerStreamingContext (Conformer.py:30-59): fixed-size
    left-context ring buffers + a valid-frame count, carried explicitly."""

    mha_left: Array        # [B, left_frames, D] post-ffn1 inputs to the mixer
    conv_left: Array       # [B, kernel//2, D] inputs to the conv module
    # [B] int32: frames processed so far, PER ROW — rows of one batched
    # state may be independent streams at different positions (the
    # serving slot multiplexer, serving.py::StreamingSessionServer)
    frames_seen: Array


@struct.dataclass
class ConformerStreamingState:
    layers: Tuple[ConformerLayerStreamingState, ...]


class ConformerDecoderLayer(nn.Module):
    """Cross-attention Conformer decoder layer (reference
    Conformer.py:859-1013): Macaron half-FFN -> cross-attention over the
    encoder memory -> causal convolution module -> half-FFN + norm. Not used
    by the five recipes but part of the reference surface."""

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 3
    use_bias: bool = True
    dropout_rate: float = 0.0
    causal: bool = True
    attention_type: str = "regularMHA"
    activation: Callable = jax.nn.silu
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        from summarymixing_tpu.ops.attention import (
            MultiheadAttention,
            RelPosMHAXL,
        )

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.attention_type == "regularMHA":
            self.mha_layer = MultiheadAttention(
                d_model=self.d_model, nhead=self.nhead,
                dropout_rate=self.dropout_rate, name="mha_layer", **common,
            )
        elif self.attention_type == "RelPosMHAXL":
            self.mha_layer = RelPosMHAXL(
                d_model=self.d_model, nhead=self.nhead,
                dropout_rate=self.dropout_rate, mask_pos_future=self.causal,
                name="mha_layer", **common,
            )
        else:
            raise ValueError(
                f"ConformerDecoder supports regularMHA/RelPosMHAXL, got "
                f"{self.attention_type!r}"
            )
        self.convolution_module = ConvolutionModule(
            input_size=self.d_model, kernel_size=self.kernel_size,
            use_bias=self.use_bias, activation=self.activation,
            dropout_rate=self.dropout_rate, causal=self.causal,
            name="convolution_module", **common,
        )
        ffn = lambda name: PositionalwiseFeedForward(  # noqa: E731
            d_ffn=self.d_ffn, d_model=self.d_model,
            dropout_rate=self.dropout_rate, activation=self.activation,
            name=name, **common,
        )
        self.ffn1 = ffn("ffn1")
        self.ffn2 = ffn("ffn2")
        self.norm_ffn1 = nn.LayerNorm(epsilon=1e-5, name="norm_ffn1", **common)
        self.norm_ffn2 = nn.LayerNorm(epsilon=1e-5, name="norm_ffn2", **common)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **common)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **common)
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        memory_mask: Optional[Array] = None,
        memory_pad_mask: Optional[Array] = None,
        pos_embs_src: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        x = tgt + 0.5 * self.dropout(
            self.ffn1(self.norm_ffn1(tgt), deterministic=deterministic),
            deterministic=deterministic,
        )
        skip = x
        out, _ = self.mha_layer(
            self.norm1(x), memory, memory,
            attn_mask=memory_mask, pad_mask=memory_pad_mask,
            pos_embs=pos_embs_src, deterministic=deterministic,
        )
        x = out + skip
        x = x + self.convolution_module(x, deterministic=deterministic)
        x = self.norm2(
            x + 0.5 * self.dropout(
                self.ffn2(self.norm_ffn2(x), deterministic=deterministic),
                deterministic=deterministic,
            )
        )
        return x


class ConformerDecoder(nn.Module):
    """Stack of ConformerDecoderLayer + final LayerNorm eps 1e-6
    (reference Conformer.py:1016-1151)."""

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 3
    use_bias: bool = True
    dropout_rate: float = 0.0
    causal: bool = True
    attention_type: str = "regularMHA"
    activation: Callable = jax.nn.silu
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: Array,
        memory: Array,
        memory_mask: Optional[Array] = None,
        memory_pad_mask: Optional[Array] = None,
        pos_embs_src: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        for i in range(self.num_layers):
            tgt = ConformerDecoderLayer(
                d_model=self.d_model, d_ffn=self.d_ffn, nhead=self.nhead,
                kernel_size=self.kernel_size, use_bias=self.use_bias,
                dropout_rate=self.dropout_rate, causal=self.causal,
                attention_type=self.attention_type, activation=self.activation,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(tgt, memory, memory_mask, memory_pad_mask, pos_embs_src,
              deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm")(tgt)


class ConformerEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    use_bias: bool = True
    dropout_rate: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    mode: str = "SummaryMixing"
    activation: Callable = jax.nn.silu  # Swish
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
            # SummaryMixing output must match d_model here (reference :442)
            summary_out_dim=self.d_model,
            mode=self.mode,
            activation=self.activation
            if self.attention_type == "SummaryMixing"
            else None,
            hypernet_size=self.d_ffn,
            mask_pos_future=self.causal,
            name="mixer",
            **common,
        )
        self.convolution_module = ConvolutionModule(
            input_size=self.d_model,
            kernel_size=self.kernel_size,
            use_bias=self.use_bias,
            activation=self.activation,
            dropout_rate=self.dropout_rate,
            causal=self.causal,
            name="convolution_module",
            **common,
        )
        ffn = lambda name: PositionalwiseFeedForward(  # noqa: E731
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            activation=self.activation,
            name=name,
            **common,
        )
        self.ffn1 = ffn("ffn1")
        self.ffn2 = ffn("ffn2")
        self.norm_ffn1 = nn.LayerNorm(epsilon=1e-5, name="norm_ffn1", **common)
        self.norm_ffn2 = nn.LayerNorm(epsilon=1e-5, name="norm_ffn2", **common)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **common)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **common)
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        chunk_size: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        # Macaron half-FFN 1
        x = x + 0.5 * self.dropout(
            self.ffn1(self.norm_ffn1(x), deterministic=deterministic),
            deterministic=deterministic,
        )
        # token mixing
        skip = x
        x = apply_mixer(
            self.mixer,
            self.attention_type,
            self.norm1(x),
            attn_mask=src_mask,
            pad_mask=pad_mask,
            pos_embs=pos_embs,
            deterministic=deterministic,
        )
        x = x + skip
        # convolution module (with optional dynamic chunk convolution)
        x = x + self.convolution_module(
            x, pad_mask=pad_mask, chunk_size=chunk_size, deterministic=deterministic
        )
        # Macaron half-FFN 2 + norm
        x = self.norm2(
            x
            + 0.5
            * self.dropout(
                self.ffn2(self.norm_ffn2(x), deterministic=deterministic),
                deterministic=deterministic,
            )
        )
        return x

    def init_streaming_state(
        self, batch: int, left_context_frames: int, dtype=jnp.float32
    ) -> ConformerLayerStreamingState:
        pad = (self.kernel_size - 1) // 2
        return ConformerLayerStreamingState(
            mha_left=jnp.zeros((batch, left_context_frames, self.d_model), dtype),
            conv_left=jnp.zeros((batch, pad, self.d_model), dtype),
            frames_seen=jnp.zeros((batch,), jnp.int32),
        )

    def streaming_step(
        self,
        x: Array,
        state: ConformerLayerStreamingState,
        pos_embs: Optional[Array] = None,
    ) -> Tuple[Array, ConformerLayerStreamingState]:
        """One chunk through the layer with carried left context
        (functional reference Conformer.py:539-620). Chunk-boundary
        semantics match Dynamic Chunk Training: the mixer sees
        [left buffer | chunk]; the depthwise conv sees the last kernel//2
        real frames as left context and zeros beyond the chunk (the
        valid-mask in ConvolutionModule emulates the zero padding exactly,
        including for the partially-filled first chunks)."""
        orig = x.shape[1]
        l_buf = state.mha_left.shape[1]
        pad = (self.kernel_size - 1) // 2

        x = x + 0.5 * self.ffn1(self.norm_ffn1(x), deterministic=True)

        # mixer over [left | chunk] with buffer-validity mask (per row:
        # rows may be independent streams at different positions)
        xcat = jnp.concatenate([state.mha_left, x], axis=1)
        seen = state.frames_seen[:, None]
        buf_valid = (
            jnp.arange(l_buf)[None, :]
            >= l_buf - jnp.minimum(seen, l_buf)
        )
        valid = jnp.concatenate(
            [buf_valid, jnp.ones((x.shape[0], orig), bool)], axis=1
        ).astype(x.dtype)
        new_mha_left = xcat[:, xcat.shape[1] - l_buf:] if l_buf > 0 else state.mha_left

        skip = xcat
        mixed = apply_mixer(
            self.mixer, self.attention_type, self.norm1(xcat),
            pad_mask=valid, pos_embs=pos_embs, deterministic=True,
        )
        x = (mixed + skip)[:, -orig:]

        # convolution over [conv_left | chunk]
        conv_in = jnp.concatenate([state.conv_left, x], axis=1)
        conv_buf_valid = (
            jnp.arange(pad)[None, :] >= pad - jnp.minimum(seen, pad)
        )
        conv_valid = jnp.concatenate(
            [conv_buf_valid, jnp.ones((x.shape[0], orig), bool)], axis=1
        ).astype(x.dtype)
        conv_out = self.convolution_module(
            conv_in, pad_mask=conv_valid, deterministic=True
        )[:, -orig:]
        new_conv_left = conv_in[:, conv_in.shape[1] - pad:] if pad > 0 else state.conv_left
        x = x + conv_out

        x = self.norm2(x + 0.5 * self.ffn2(self.norm_ffn2(x), deterministic=True))
        return x, ConformerLayerStreamingState(
            mha_left=new_mha_left,
            conv_left=new_conv_left,
            frames_seen=state.frames_seen + orig,
        )


class ConformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    use_bias: bool = True
    dropout_rate: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    mode: str = "SummaryMixing"
    activation: Callable = jax.nn.silu
    remat: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # remat: recompute layer activations in the backward pass — peak
        # activation memory O(T) instead of O(num_layers * T); forward is
        # bit-identical; streaming_step/init_streaming_state are untouched
        # (remat wraps __call__ only).
        layer_cls = (nn.remat(ConformerEncoderLayer, static_argnums=(6,))
                     if self.remat else ConformerEncoderLayer)
        self.layers = [
            layer_cls(
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
                activation=self.activation,
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
        chunk_size: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if self.attention_type == "RelPosMHAXL" and pos_embs is None:
            raise ValueError("RelPosMHAXL requires pos_embs [1, 2T-1, D]")
        for layer in self.layers:
            x = layer(x, src_mask, pad_mask, pos_embs, chunk_size, deterministic)
        return self.norm(x)

    def init_streaming_state(
        self, batch: int, left_context_frames: int, dtype=jnp.float32
    ) -> ConformerStreamingState:
        """Blank carried state (functional reference
        Conformer.py:835-856 make_streaming_context)."""
        return ConformerStreamingState(
            layers=tuple(
                layer.init_streaming_state(batch, left_context_frames, dtype)
                for layer in self.layers
            )
        )

    def streaming_step(
        self,
        x: Array,
        state: ConformerStreamingState,
        pos_embs: Optional[Array] = None,
    ) -> Tuple[Array, ConformerStreamingState]:
        """One chunk through the stack (functional reference
        Conformer.py:788-833 forward_streaming)."""
        new_states = []
        for layer, lstate in zip(self.layers, state.layers):
            x, new = layer.streaming_step(x, lstate, pos_embs)
            new_states.append(new)
        return self.norm(x), ConformerStreamingState(layers=tuple(new_states))
