"""Convolution building blocks: CSGU (cgMLP), the Branchformer convolution
branch, the Conformer convolution module with Dynamic Chunk Convolution, and
the 2-D convolutional speech frontend.

Capability parity (reference locations):
- ConvolutionalSpatialGatingUnit <- speechbrain cgMLP CSGU, demanded by
  reference Branchformer.py:26,79-84.
- ConvolutionBranch   <- reference Branchformer.py:31-97.
- ConvolutionModule   <- reference Conformer.py:73-333, including the
  Dynamic Chunk Convolution (DCConv) training path (:190-313) and the causal
  option.
- ConvolutionFrontEnd <- speechbrain ConvolutionFrontEnd as configured by the
  recipes (branchformer_summarymixing.yaml:148-154: 2 blocks, stride 2x2,
  channels 64->32 => 4x subsampling, flattened output 640).

TPU-first design notes:
- Layout is NHC / NHWC throughout (lane dim = channels) — no transposes.
- DCConv is reformulated mask-based instead of unfold-based: the reference
  unfolds into per-chunk slabs with Python-shaped chunks (Conformer.py:240-313)
  which would force recompiles for every sampled chunk size. Here the causal
  half runs as a normal grouped conv and each of the `pad` future taps is a
  shifted multiply-add gated by `t % chunk < chunk - o` — chunk_size stays a
  *traced* scalar so one compiled program serves all sampled chunk sizes.
  Equivalence with the unfold formulation is covered by tests.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def depthwise_conv1d(
    x: Array, kernel: Array, bias: Optional[Array] = None, padding="SAME"
) -> Array:
    """x [B, T, C], kernel [K, C] -> [B, T', C] depthwise conv."""
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :].astype(x.dtype),
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class ConvolutionalSpatialGatingUnit(nn.Module):
    """CSGU of the cgMLP branch: split channels in half; gate half goes
    LayerNorm -> depthwise conv -> (optional linear) -> gate activation; output
    is elementwise product with the residual half, then dropout."""

    input_size: int  # full (pre-split) channel count
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: Callable = lambda x: x  # Identity, per recipe defaults
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        half = self.input_size // 2
        x_res, x_gate = jnp.split(x, 2, axis=-1)
        # eps 1e-5 = torch LayerNorm default (the reference CSGU uses it)
        x_gate = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm")(x_gate)
        if pad_mask is not None:
            # Zero padded frames before the depthwise conv so no padding
            # content can reach valid frames through the kernel's receptive
            # field. (The reference leaves the conv input unmasked —
            # Branchformer.py:283 "In ESPnet, masks are not used?!" — making
            # boundary frames depend on padding content; with bucketed static
            # shapes we need strict invariance.)
            x_gate = x_gate * pad_mask[..., None].astype(x_gate.dtype)
        kernel = self.param(
            "conv_kernel",
            nn.initializers.normal(stddev=1e-3),
            (self.kernel_size, half),
            self.param_dtype,
        )
        conv_bias = self.param(
            "conv_bias", nn.initializers.ones, (half,), self.param_dtype
        )
        x_gate = depthwise_conv1d(x_gate, kernel, conv_bias, padding="SAME")
        if self.use_linear_after_conv:
            x_gate = nn.Dense(half, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="linear_after_conv")(x_gate)
        x_gate = self.gate_activation(x_gate)
        out = x_res * x_gate
        return nn.Dropout(rate=self.dropout_rate)(out, deterministic=deterministic)


class ConvolutionBranch(nn.Module):
    """Branchformer cgMLP branch: Linear(d -> units) -> activation -> CSGU ->
    Linear(units/2 -> d) (reference Branchformer.py:31-97)."""

    input_size: int
    linear_units: int = 3072
    kernel_size: int = 31
    activation: Callable = lambda x: jax.nn.gelu(x, approximate=False)
    gate_activation: Callable = lambda x: x
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    act_int8: bool = False  # W8A8 projections (inference; ops/quant.py)
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if self.act_int8:
            from summarymixing_tpu.ops.quant import Int8Dense

            dense = lambda f, name: Int8Dense(  # noqa: E731
                f, dtype=self.dtype or jnp.float32,
                param_dtype=self.param_dtype, name=name)
        else:
            dense = lambda f, name: nn.Dense(  # noqa: E731
                f, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = dense(self.linear_units, "pre_channel_proj")(x)
        x = self.activation(x)
        x = ConvolutionalSpatialGatingUnit(
            input_size=self.linear_units,
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="csgu",
        )(x, pad_mask=pad_mask, deterministic=deterministic)
        x = dense(self.input_size, "post_channel_proj")(x)
        return x


def _dcconv_depthwise(
    x: Array, kernel: Array, bias: Array, chunk_size: Array
) -> Array:
    """Depthwise conv where, per output frame, taps beyond the end of the
    frame's chunk are zeroed (Dynamic Chunk Convolution). kernel [K, C] with
    K = 2*pad + 1 (odd). chunk_size may be a traced scalar.

    out[t] = sum_{j<=pad} w[j] x[t+j-pad]                (past + center)
           + sum_{o=1..pad} w[pad+o] x[t+o] [t%chunk < chunk-o]  (gated future)
    """
    k, c = kernel.shape
    pad = (k - 1) // 2
    t_len = x.shape[1]
    # Past + center taps: conv with only-left padding, truncated kernel.
    causal_part = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (pad, 0), (0, 0))),
        kernel[: pad + 1, None, :].astype(x.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )
    out = causal_part + bias.astype(x.dtype)
    pos_in_chunk = jnp.arange(t_len) % chunk_size
    for o in range(1, pad + 1):
        shifted = jnp.pad(x, ((0, 0), (0, o), (0, 0)))[:, o : o + t_len]
        gate = (pos_in_chunk < (chunk_size - o)).astype(x.dtype)[None, :, None]
        out = out + kernel[pad + o][None, None, :].astype(x.dtype) * shifted * gate
    return out


class ConvolutionModule(nn.Module):
    """Conformer convolution module: LayerNorm -> pointwise conv to 2C + GLU
    -> depthwise conv (kernel 31; causal / DCConv options) -> LayerNorm ->
    activation -> pointwise Linear -> dropout, output multiplied by the
    padding mask (reference Conformer.py:73-333; BatchNorm is replaced by
    LayerNorm there too)."""

    input_size: int
    kernel_size: int = 31
    use_bias: bool = True
    activation: Callable = jax.nn.silu  # Swish
    dropout_rate: float = 0.0
    causal: bool = False
    dilation: int = 1
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        pad_mask: Optional[Array] = None,
        chunk_size: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """x [B, T, C]; pad_mask [B, T] float 1=valid; chunk_size: traced or
        static scalar enabling Dynamic Chunk Convolution (training)."""
        if self.dilation != 1:
            raise NotImplementedError("dilation != 1 is not supported")
        c = self.input_size
        # eps 1e-5 = torch LayerNorm default (reference ConvolutionModule)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="layer_norm")(x)
        out = nn.Dense(2 * c, use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="bottleneck")(out)
        a, b = jnp.split(out, 2, axis=-1)
        out = a * jax.nn.sigmoid(b)  # GLU
        if pad_mask is not None:
            # Strict padding invariance: the depthwise conv must not read
            # padding content (see CSGU note).
            out = out * pad_mask[..., None].astype(out.dtype)

        kernel = self.param(
            "conv_kernel",
            nn.initializers.he_normal(),
            (self.kernel_size, c),
            self.param_dtype,
        )
        conv_bias = (
            self.param("conv_bias", nn.initializers.zeros, (c,), self.param_dtype)
            if self.use_bias
            else jnp.zeros((c,), self.param_dtype)
        )
        if chunk_size is not None:
            if self.causal:
                raise ValueError("DCConv is incompatible with causal convolution")
            out = _dcconv_depthwise(out, kernel, conv_bias, chunk_size)
        elif self.causal:
            out = jnp.pad(out, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            out = depthwise_conv1d(out, kernel, conv_bias, padding="VALID")
        else:
            out = depthwise_conv1d(out, kernel, conv_bias, padding="SAME")

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="after_norm")(out)
        out = self.activation(out)
        out = nn.Dense(c, use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="pointwise_out")(out)
        out = nn.Dropout(rate=self.dropout_rate)(out, deterministic=deterministic)
        if pad_mask is not None:
            out = out * pad_mask[..., None].astype(out.dtype)
        return out


class ConvolutionFrontEnd(nn.Module):
    """2-D convolutional subsampling frontend over [B, T, F] features:
    num_blocks of (Conv2d stride sxs -> LayerNorm -> activation), then
    flatten (freq, channels) -> [B, T/prod(strides), F'] .

    Recipe config (branchformer_summarymixing.yaml:148-154): 2 blocks,
    out_channels (64, 32), kernel 3, stride 2 => 4x time subsampling and
    80 mels -> ceil(80/4)=20 bins * 32 ch = 640 features.
    """

    out_channels: Sequence[int] = (64, 32)
    kernel_sizes: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    residuals: Sequence[bool] = (False, False)
    activation: Callable = jax.nn.leaky_relu
    norm: bool = True
    dropout_rate: float = 0.1
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = True,
        input_frame_offset: Optional[Array] = None,
    ) -> Array:
        """`input_frame_offset` (int scalar or [B] per row, may be
        NEGATIVE) marks x's frame 0 as global frame `input_frame_offset`
        of a longer stream: positions before global frame 0 are zeroed at
        the input AND after every block, reproducing the offline stack's
        inter-layer zero padding at the sequence start exactly (needed by
        the chunked streaming frontend, streaming.py). Must be divisible
        by prod(strides) so output indices stay aligned."""
        b, t, f = x.shape
        x = x[..., None]  # NHWC: [B, T, F, 1]

        def mask_start(x, offset):
            off = jnp.asarray(offset).reshape(-1, 1)  # [B or 1, 1]
            idx = off + jnp.arange(x.shape[1])[None, :]
            return x * (idx >= 0).astype(x.dtype)[:, :, None, None]

        offset = input_frame_offset
        if offset is not None:
            x = mask_start(x, offset)
        for i, (ch, k, s, res) in enumerate(
            zip(self.out_channels, self.kernel_sizes, self.strides, self.residuals)
        ):
            inp = x
            # symmetric (k//2, k//2) padding = speechbrain Conv2d "same"
            # (get_padding_elem uses floor(k/2) both sides for stride > 1;
            # XLA's SAME pads asymmetrically and would shift the taps,
            # breaking checkpoint-conversion parity)
            x = nn.Conv(
                features=ch,
                kernel_size=(k, k),
                strides=(s, s),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x)
            if self.norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"norm_{i}")(x)
            x = self.activation(x)
            if res and inp.shape == x.shape:
                x = x + inp
            x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
            if offset is not None:
                offset = offset // s
                x = mask_start(x, offset)
        b2, t2, f2, c2 = x.shape
        return x.reshape(b2, t2, f2 * c2)

    @staticmethod
    def subsampled_length(lengths: Array, strides: Sequence[int] = (2, 2)) -> Array:
        """Output lengths for SAME-padded stride-s convs: ceil(len / s) each."""
        out = lengths
        for s in strides:
            out = -(-out // s)
        return out
