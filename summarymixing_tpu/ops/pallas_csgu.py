"""Pallas TPU kernel: the fused Branchformer cgMLP branch.

OUTCOME (benchmarks/RESULTS.md "Pallas whole-branch fusion"): measured at
recipe scale in bf16, XLA already runs this chain at 100-133 effective
TFLOPS and the fused kernel only reaches parity at B=8 (loses at B>=32).
XLA therefore remains the production path; this kernel and its parity
tests document the closed experiment (round-1 VERDICT item 7). The
round-1 "46 TFLOPS headroom" motivation was an artifact of the fp32/erf
configuration.

The kernel computes the WHOLE branch (reference Branchformer.py:31-97):

    pre_channel_proj (512 -> 3072) -> GELU(tanh) -> split ->
    LayerNorm(gate 1536) -> pad-mask -> depthwise conv (K=31) ->
    gate multiply -> post_channel_proj (1536 -> 512)

per [TILE, *] time tile entirely in VMEM: HBM sees only x in and y out.

Halo handling: the depthwise conv needs (K-1)/2 neighbour frames; the
caller materialises overlapping windows of the 512-wide INPUT (1.2x its
size — negligible next to the 3072-wide intermediates saved) so every
grid step gets a self-contained [TILE + K - 1, 512] block through a
standard BlockSpec.

Mosaic notes: tanh-GELU only (no erf lowering on TC; the recipes default
to tanh-GELU — config/loader.py); LN statistics in fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _kernel(x_ref, mask_ref, w_pre_ref, b_pre_ref, ln_scale_ref, ln_bias_ref,
            wconv_ref, bconv_ref, w_post_ref, b_post_ref, out_ref,
            *, tile: int, k: int, eps: float):
    halo = (k - 1) // 2
    x = x_ref[0]                                        # [tile+2h, D] bf16
    h = jnp.dot(x, w_pre_ref[:], preferred_element_type=jnp.float32)
    h = h + b_pre_ref[0][None, :]
    h = _gelu_tanh(h)                                   # [tile+2h, 2C] f32
    c = h.shape[-1] // 2
    res = h[halo : halo + tile, :c]                     # [tile, C]
    gate = h[:, c:]                                     # [tile+2h, C]

    mu = jnp.mean(gate, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(gate - mu), axis=-1, keepdims=True)
    gate = (gate - mu) * jax.lax.rsqrt(var + eps)
    gate = gate * ln_scale_ref[0][None, :] + ln_bias_ref[0][None, :]
    gate = gate * mask_ref[0, :, :1]                    # zero padded frames

    acc = jnp.zeros((tile, c), jnp.float32)
    for tap in range(k):                                # static unroll
        acc = acc + gate[tap : tap + tile, :] * wconv_ref[tap][None, :]
    acc = acc + bconv_ref[0][None, :]

    o = res * acc                                       # gate multiply
    y = jnp.dot(o.astype(x.dtype), w_post_ref[:],
                preferred_element_type=jnp.float32)
    y = y + b_post_ref[0][None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def fused_convolution_branch(
    x: Array,
    pad_mask: Array | None,
    params: dict,
    kernel_size: int = 31,
    tile: int = 128,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """x [B, T, D]; pad_mask [B, T] float 1=valid (or None); params =
    the flax ConvolutionBranch tree (pre_channel_proj, csgu{norm,
    conv_kernel, conv_bias}, post_channel_proj). Returns [B, T, D].

    Matches ops/convolution.py::ConvolutionBranch with tanh-GELU activation
    and identity gate activation (the recipe configuration)."""
    b, t, d = x.shape
    halo = (kernel_size - 1) // 2
    w_pre = params["pre_channel_proj"]["kernel"]        # [D, 2C]
    b_pre = params["pre_channel_proj"]["bias"]
    c2 = w_pre.shape[1]
    c = c2 // 2
    ln = params["csgu"]["norm"]
    wconv = params["csgu"]["conv_kernel"]               # [K, C]
    bconv = params["csgu"]["conv_bias"]
    w_post = params["post_channel_proj"]["kernel"]      # [C, D]
    b_post = params["post_channel_proj"]["bias"]

    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    dt = x.dtype
    if pad_mask is None:
        pad_mask = jnp.ones((b, t), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (halo, t_pad - t + halo), (0, 0)))
    mp = jnp.pad(pad_mask.astype(jnp.float32),
                 ((0, 0), (halo, t_pad - t + halo)))
    # overlapping windows of the narrow input: [B, n, tile+2h, D]
    win = tile + 2 * halo
    xw = jnp.stack([xp[:, i * tile : i * tile + win] for i in range(n_tiles)],
                   axis=1).reshape(b * n_tiles, win, d)
    # mask as a [win, 128] block (lane-dim >= 128 constraint)
    mw = jnp.stack([mp[:, i * tile : i * tile + win] for i in range(n_tiles)],
                   axis=1).reshape(b * n_tiles, win)
    mw = jnp.broadcast_to(mw[:, :, None], (b * n_tiles, win, 128))

    kern = functools.partial(_kernel, tile=tile, k=kernel_size, eps=eps)
    grid = (b * n_tiles,)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731  (broadcast operand)
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, win, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(d, c2),
            const(1, c2),
            const(1, c),
            const(1, c),
            const(kernel_size, c),
            const(1, c),
            const(c, d),
            const(1, d),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, tile, d), dt),
        interpret=interpret,
    )(
        xw,
        mw.astype(jnp.float32),
        w_pre.astype(dt), b_pre.astype(jnp.float32)[None],
        ln["scale"].astype(jnp.float32)[None],
        ln["bias"].astype(jnp.float32)[None],
        wconv.astype(jnp.float32), bconv.astype(jnp.float32)[None],
        w_post.astype(dt), b_post.astype(jnp.float32)[None],
    )
    return y.reshape(b, t_pad, d)[:, :t]
