"""Fused Pallas TPU kernel for the SummaryMixing cell (full mode, nhead=1 —
the flagship LibriSpeech recipe configuration, yaml:118,124-127).

Computation (reference summary_mixing.py:190-239, Eq. 1b/1c):
    local  = gelu(gelu(x @ W1 + b1) @ W2 + b2) * pad
    summ   = gelu(gelu(x @ S1 + c1) @ S2 + c2) * pad
    pooled = sum_t(summ) / sum_t(pad)                  (fp32 accumulation)
    out    = gelu(local @ M1 + pooled @ M2 + m)        (concat-free merge)

Fusion strategy: grid over the batch; each program keeps one utterance's
x [T, D] and every weight in VMEM and performs all five matmuls plus the
time-mean without touching HBM for intermediates — the unfused XLA path
writes/reads ~6 [T, 512] tensors per layer. The merge concat is algebraic:
cat([l, p]) @ M == l @ M1 + p @ M2 with M split row-wise.

Training uses a custom VJP whose backward evaluates the pure-jnp reference
path (bit-identical math), so the kernel needs no hand-written gradient and
the jnp implementation remains the correctness oracle
(tests/test_pallas_summary.py).

MEASURED (v5e, B=8 T=768 D=512 bf16): kernel 0.87 ms vs XLA 0.34 ms — the
XLA path hits ~47 TFLOPS here and the cell is MXU-bound, not HBM-bound
(total intermediate traffic ~9 MB ≈ 11 us at HBM bw), so the naive
single-block dots in this kernel lose to XLA's matmul tiling. The jnp path
therefore REMAINS THE DEFAULT; this kernel is kept as a correctness-tested
foundation for whole-layer fusion (where the CSGU branch's [B,T,3072]
intermediates make fusion genuinely profitable) and for very long T where
per-row VMEM residency wins. Revisit with pl.dot tiling + a (B, T-block)
grid if the cell ever dominates the profile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _erf(x):
    # Mosaic TC has no erf/erfc lowering; Abramowitz & Stegun 7.1.26
    # rational approximation (max abs error 1.5e-7 — far below the bf16
    # quantisation step and the fp32 test tolerance).
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(x):
    # exact-GELU form 0.5*x*(1 + erf(x/sqrt(2))) with the in-kernel erf
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, pad_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            s1_ref, c1_ref, s2_ref, c2_ref, m1_ref, m2_ref, mb_ref,
            out_ref):
    x = x_ref[0]            # [T, D]
    pad = pad_ref[0]        # [T, 1]
    f32 = jnp.float32

    # summary branch s(x) (Eq. 1c)
    h = _gelu(jnp.dot(x, s1_ref[:], preferred_element_type=f32)
              + c1_ref[:].astype(f32))
    summ = _gelu(jnp.dot(h.astype(x.dtype), s2_ref[:],
                         preferred_element_type=f32)
                 + c2_ref[:].astype(f32))
    summ = summ * pad.astype(f32)

    # masked mean over time, fp32
    count = jnp.maximum(jnp.sum(pad.astype(f32)), 1.0)
    pooled = jnp.sum(summ, axis=0, keepdims=True) / count  # [1, O]

    # local branch f(x) (Eq. 1b)
    h = _gelu(jnp.dot(x, w1_ref[:], preferred_element_type=f32)
              + b1_ref[:].astype(f32))
    local = _gelu(jnp.dot(h.astype(x.dtype), w2_ref[:],
                          preferred_element_type=f32)
                  + b2_ref[:].astype(f32))
    local = local * pad.astype(f32)

    # concat-free merge
    merged = (
        jnp.dot(local.astype(x.dtype), m1_ref[:], preferred_element_type=f32)
        + jnp.dot(pooled.astype(x.dtype), m2_ref[:], preferred_element_type=f32)
        + mb_ref[:].astype(f32)
    )
    out_ref[0] = _gelu(merged).astype(out_ref.dtype)


def _pallas_forward(x, pad, weights):
    b, t, d = x.shape
    (w1, b1, w2, b2, s1, c1, s2, c2, m1, m2, mb) = weights
    out_dim = m1.shape[1]
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    row = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            row((1, t, d)),
            row((1, t, 1)),
        ] + [vspec() for _ in range(11)],
        out_specs=row((1, t, out_dim)),
        out_shape=jax.ShapeDtypeStruct((b, t, out_dim), x.dtype),
    )(x, pad, w1, b1, w2, b2, s1, c1, s2, c2, m1, m2, mb)


def _jnp_reference(x, pad, weights):
    (w1, b1, w2, b2, s1, c1, s2, c2, m1, m2, mb) = weights
    f32 = jnp.float32
    padf = pad.astype(f32)
    h = _gelu(jnp.dot(x, s1, preferred_element_type=f32) + c1.astype(f32))
    summ = _gelu(jnp.dot(h.astype(x.dtype), s2, preferred_element_type=f32)
                 + c2.astype(f32)) * padf
    count = jnp.maximum(jnp.sum(padf, axis=1, keepdims=True), 1.0)
    pooled = jnp.sum(summ, axis=1, keepdims=True) / count
    h = _gelu(jnp.dot(x, w1, preferred_element_type=f32) + b1.astype(f32))
    local = _gelu(jnp.dot(h.astype(x.dtype), w2, preferred_element_type=f32)
                  + b2.astype(f32)) * padf
    merged = (
        jnp.dot(local.astype(x.dtype), m1, preferred_element_type=f32)
        + jnp.dot(pooled.astype(x.dtype), m2, preferred_element_type=f32)
        + mb.astype(f32)
    )
    return _gelu(merged).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_summary_mixing(x, pad, weights):
    """x [B, T, D]; pad [B, T, 1] float 1=valid; weights: tuple
    (W1, b1, W2, b2, S1, c1, S2, c2, M1, M2, mb) with M row-split:
    M1 [local_out, out], M2 [summary_out, out]. Returns [B, T, out]."""
    return _pallas_forward(x, pad, weights)


def _fwd(x, pad, weights):
    return _pallas_forward(x, pad, weights), (x, pad, weights)


def _bwd(res, g):
    x, pad, weights = res
    _, vjp = jax.vjp(_jnp_reference, x, pad, weights)
    return vjp(g)


fused_summary_mixing.defvjp(_fwd, _bwd)


def params_to_weights(cell_params: dict, dtype=jnp.bfloat16) -> Tuple:
    """Flatten the flax SummaryMixing param tree (full mode, nhead=1, one
    hidden layer per branch) into the kernel's weight tuple."""
    lp = cell_params["local_proj"]
    sp = cell_params["summary_proj"]
    mg = cell_params["summary_local_merging"]["layer_0"]
    local_out = lp["layer_1"]["kernel"].shape[1]
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    return (
        cast(lp["layer_0"]["kernel"]), cast(lp["layer_0"]["bias"]),
        cast(lp["layer_1"]["kernel"]), cast(lp["layer_1"]["bias"]),
        cast(sp["layer_0"]["kernel"]), cast(sp["layer_0"]["bias"]),
        cast(sp["layer_1"]["kernel"]), cast(sp["layer_1"]["bias"]),
        cast(mg["kernel"][:local_out]), cast(mg["kernel"][local_out:]),
        cast(mg["bias"]),
    )
