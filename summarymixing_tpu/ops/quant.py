"""int8 quantized matmul building blocks for inference (W8A8).

The reference has no quantized path; this is a TPU-native extra. On
paper the v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP peak
(394 vs 197 TOPS) and int8 operands halve matmul-boundary HBM bytes.

MEASURED NEGATIVE RESULT (benchmarks/int8_decode_bench.py, RESULTS.md
"int8 W8A8 decode"): as lowered by XLA today, an isolated int8
dot_general is at best at parity with bf16 at recipe shapes (no 2x),
and in the full decode graph the per-boundary quantize passes break
XLA's elementwise fusions — whole-model W8A8 cgMLP decode measured
0.46x (2.2x SLOWER) with MORE bytes moved. The path is kept, correct
and tested (tests/test_quant.py), as the documented closure of the
activation-quantization question the round-2 int8-weights analysis left
open; revisit only if XLA grows native int8 fusion support.

Scheme (standard post-training quantization):
- weights: static symmetric per-output-channel scales, quantized once at
  load time (`quantize_weight`);
- activations: dynamic symmetric per-token (per [b, t] row) scales,
  computed on the fly (`quantize_act`) — row scales commute with the
  contraction, so `y[b,t,o] = (q_a @ q_w)[b,t,o] * s_a[b,t] * s_w[o]`
  is exact in the quantized algebra;
- accumulation in int32 (`preferred_element_type`), dequantized into the
  module dtype.

Opt-in (`act_int8` flags on the modules that use it); numerics change at
the ~1e-2 relative level per matmul, so this is for inference only and
is validated end to end by greedy/beam WER parity tests on the trained
smoke-corpus model."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def quantize_act(x: Array, eps: float = 1e-8) -> Tuple[Array, Array]:
    """Symmetric per-row (last-axis) int8 quantization.

    x [..., C] -> (q int8 [..., C], scale f32 [..., 1]) with
    x ~= q * scale."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_weight(w: Array, eps: float = 1e-8) -> Tuple[Array, Array]:
    """Symmetric per-output-channel int8 quantization of a [C, O] weight.

    Returns (q int8 [C, O], scale f32 [O])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[None, :]), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(q_a: Array, s_a: Array, q_w: Array, s_w: Array,
                bias: Optional[Array] = None,
                dtype: jnp.dtype = jnp.bfloat16) -> Array:
    """y = (q_a * s_a) @ (q_w * s_w) + bias with the int8 contraction on
    the MXU (int32 accumulation) and the scales applied outside.

    q_a [..., C] int8, s_a [..., 1] f32, q_w [C, O] int8, s_w [O] f32."""
    acc = jax.lax.dot_general(
        q_a, q_w,
        dimension_numbers=(((q_a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_a * s_w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class Int8Dense(nn.Module):
    """Drop-in Dense replacement running W8A8 on the MXU.

    Parameters are stored in float (same pytree layout as nn.Dense —
    checkpoints stay interchangeable); the weight is quantized inside the
    compiled graph, where XLA constant-folds it for fixed params."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        self.param_dtype) if self.use_bias else None)
        q_a, s_a = quantize_act(x)
        q_w, s_w = quantize_weight(w)
        return int8_matmul(q_a, s_a, q_w, s_w, b, dtype=self.dtype or x.dtype)
