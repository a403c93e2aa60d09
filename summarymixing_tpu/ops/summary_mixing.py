"""The SummaryMixing cell — a linear-time replacement for self-attention.

Semantics match the reference `speechbrain/nnet/summary_mixing.py:28-372`
(https://arxiv.org/abs/2307.07421), re-designed TPU-first:

- Four modes (reference :90-98): "SummaryMixing" (full), "SummaryMixing-lite",
  "SummaryMixing-fast", "SummaryMixing-expdecay".
- Full mode (reference `_forward_mixing`, :190-239): per-step local transform
  f(x) (Eq. 1b), summary transform s(x) (Eq. 1c), length-masked mean over
  time broadcast back to every step, concat + merge MLP.
- Fast mode (:241-284): one fused projection split in half.
- Lite mode (:286-310): broadcast masked mean of s(x) only — no local branch,
  no merge.
- Exp-decay (:154-157, :316-365): Laplacian decay matrix
  exp(|i-j| * log(0.995)) used as the summary weighting.

TPU-first design decisions (differences from the reference, all intentional):
- Masks are multiplicative floats with 1 = valid (the reference's own
  convention for this cell), placed on-device by construction — the
  reference creates its default mask on CPU (summary_mixing.py:175-178, a
  latent GPU bug we do not replicate).
- The time-mean is accumulated in float32 even when activations are bfloat16
  (`jnp.sum(..., dtype=jnp.float32)`): a length-T mean in bf16 loses ~8 bits
  of mantissa at T≈1000. XLA fuses the cast into the reduction.
- The sum_mask path contracts [T,T] x [B,T,F] via einsum on the MXU.
- Everything is shape-static and jit-friendly; no data-dependent branching.

An optional fused Pallas kernel for the full-mode hot path lives in
`summarymixing_tpu.ops.pallas_summary` and is bit-compatible with this
module (see tests/test_pallas_summary.py).

Example (runnable, mirrors the reference's doctest style,
summary_mixing.py:67-73):

    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu.ops.summary_mixing import SummaryMixing
    >>> cell = SummaryMixing(enc_dim=64, nhead=4, local_proj_out_dim=64,
    ...                      summary_out_dim=64, mode="SummaryMixing")
    >>> x = jnp.ones((2, 10, 64))
    >>> params = cell.init(jax.random.PRNGKey(0), x)
    >>> cell.apply(params, x).shape
    (2, 10, 64)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.linear import SummaryNet, gelu_exact

Array = jax.Array

MODES = (
    "SummaryMixing",
    "SummaryMixing-lite",
    "SummaryMixing-expdecay",
    "SummaryMixing-fast",
)


def laplace_weights(size: int, decay_constant: float, dtype=jnp.float32) -> Array:
    """Square matrix with 1 on the diagonal and exponential decay off it:
    w[i, j] = decay_constant ** |i - j|  (reference summary_mixing.py:316-365,
    non-normalised — row normalisation happens in the masked-sum path).

    Example
    -------
    >>> import numpy as np
    >>> w = laplace_weights(3, 0.5)
    >>> np.round(np.asarray(w), 3).tolist()
    [[1.0, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 1.0]]
    """
    idx = jnp.arange(size)
    dist = jnp.abs(idx[None, :] - idx[:, None]).astype(dtype)
    return jnp.exp(dist * jnp.log(jnp.asarray(decay_constant, dtype)))


def masked_time_mean(x: Array, pad_mask: Array) -> Array:
    """Mean over the time axis counting only valid steps.

    x: [B, T, F]; pad_mask: [B, T, 1] float (1 = valid). Returns [B, 1, F].
    Accumulates in float32 regardless of input dtype.
    """
    num = jnp.sum((x * pad_mask).astype(jnp.float32), axis=1, keepdims=True)
    den = jnp.sum(pad_mask.astype(jnp.float32), axis=1, keepdims=True)
    return (num / den).astype(x.dtype)


def summary_matmul(sum_mask: Array, x: Array) -> Array:
    """Per-step weighted summary: out[b, t] = sum_s mask[t, s] x[b, s] / rowsum.

    sum_mask: [T, T] or [B, T, T] float (1 = include); x: [B, T, F].
    Row-normalised by the mask's own row sums (reference
    summary_mixing.py:233-235). Pass a [B, T, T] mask with padded columns
    zeroed (ops.masks.combine_padding) to normalise by the true valid count —
    the reference's [T, T]-only path counts padded frames in the divisor, a
    bias we fix at the encoder level.
    """
    f32 = jnp.float32
    m = sum_mask.astype(f32)
    if m.ndim == 2:
        weighted = jnp.einsum("ts,bsf->btf", m, x.astype(f32),
                              preferred_element_type=f32)
        rowsum = jnp.sum(m, axis=1)[None, :, None]
    else:
        weighted = jnp.einsum("bts,bsf->btf", m, x.astype(f32),
                              preferred_element_type=f32)
        rowsum = jnp.sum(m, axis=2)[:, :, None]
    # rows whose entire context is masked (e.g. padded frames past every
    # allowed chunk) would divide 0/0 and the NaN would contaminate valid
    # frames through the next layer's contraction; clamp — those rows are
    # padding and never read
    rowsum = jnp.maximum(rowsum, 1.0)
    return (weighted / rowsum).astype(x.dtype)


class SummaryMixing(nn.Module):
    """SummaryMixing cell. Drop-in replacement for MHSA inside encoder layers.

    Call: ``cell(x, sum_mask=None, pad_mask=None, deterministic=True)`` with
    x [B, T, F]; returns [B, T, summary_out_dim].

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu import SummaryMixing
    >>> cell = SummaryMixing(enc_dim=8, nhead=2, local_proj_hid_dim=(16,),
    ...                      local_proj_out_dim=8, summary_hid_dim=(16,),
    ...                      summary_out_dim=8)
    >>> x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    >>> params = cell.init(jax.random.PRNGKey(1), x)
    >>> cell.apply(params, x).shape
    (2, 4, 8)

    Attributes mirror the reference constructor (summary_mixing.py:76-159):

    enc_dim: input feature size.
    nhead: number of mixing heads (head-split projections).
    local_proj_hid_dim / local_proj_out_dim: hidden sizes and output size of
        the local branch f().
    summary_hid_dim / summary_out_dim: hidden sizes and output size of the
        summary branch s() (and of the cell output).
    activation: nonlinearity used inside all MLPs (default exact GELU).
    dropout_rate: dropout on the concatenated [local, summary] features.
    mode: one of MODES.
    decay_constant: exp-decay factor for "SummaryMixing-expdecay"
        (non-trainable, reference :154-157).
    """

    enc_dim: int
    nhead: int = 1
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (512,)
    summary_out_dim: int = 512
    activation: Callable = gelu_exact
    dropout_rate: float = 0.1
    mode: str = "SummaryMixing"
    decay_constant: float = 0.995
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {self.mode!r}")
        common = dict(
            activation=self.activation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        local_dims = tuple(self.local_proj_hid_dim) + (self.local_proj_out_dim,)
        summary_dims = tuple(self.summary_hid_dim) + (self.summary_out_dim,)

        if self.mode in ("SummaryMixing", "SummaryMixing-expdecay"):
            self.local_proj = SummaryNet(
                features=local_dims, n_split=self.nhead, name="local_proj", **common
            )
            self.summary_proj = SummaryNet(
                features=summary_dims, n_split=self.nhead, name="summary_proj", **common
            )
            self.summary_local_merging = SummaryNet(
                features=(self.summary_out_dim,), name="summary_local_merging", **common
            )
        elif self.mode == "SummaryMixing-fast":
            # One fused projection producing [local | summary] halves
            # (reference :129-143). Head-splitting is not used here (n_split=1
            # in the reference fast path).
            self.global_proj = SummaryNet(
                features=(2 * self.local_proj_out_dim,), name="global_proj", **common
            )
            self.summary_local_merging = SummaryNet(
                features=(self.summary_out_dim,), name="summary_local_merging", **common
            )
        else:  # lite
            self.summary_proj = SummaryNet(
                features=summary_dims, n_split=self.nhead, name="summary_proj", **common
            )
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        x: Array,
        sum_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """x: [B, T, F]. sum_mask: [T, T] float, 1 = include (streaming /
        limited context). pad_mask: [B, T] or [B, T, 1] float, 1 = valid.
        """
        if pad_mask is None:
            pad_mask = jnp.ones(x.shape[:2] + (1,), dtype=x.dtype)
        elif pad_mask.ndim == 2:
            pad_mask = pad_mask[..., None].astype(x.dtype)
        else:
            pad_mask = pad_mask.astype(x.dtype)
        if sum_mask is not None:
            sum_mask = sum_mask.astype(jnp.float32)
            if self.mode == "SummaryMixing-lite":
                # the lite summary is a single global masked mean — there is
                # no per-step weighting to restrict, so silently accepting a
                # causal/chunked mask would train non-causally
                raise ValueError(
                    "SummaryMixing-lite has no sum_mask path; use the full "
                    "or fast mode for causal / limited-context mixing"
                )

        if self.mode in ("SummaryMixing", "SummaryMixing-expdecay"):
            return self._mix(x, sum_mask, pad_mask, deterministic)
        if self.mode == "SummaryMixing-fast":
            return self._mix_fast(x, sum_mask, pad_mask, deterministic)
        return self._avg_only(x, pad_mask)

    # -- incremental causal decoding ----------------------------------------
    def decode_init(self, batch: int, dtype=jnp.float32) -> dict:
        """Carry for `decode_step`: the causal summary is a RUNNING mean
        (plain sum for full/fast/lite; geometrically decayed for
        expdecay), so one (sum, denom) pair replaces the whole-prefix
        recomputation — O(1) state per step where MHA's KV cache is
        O(T). The summary-feature width per mode matches _mix/_mix_fast."""
        dim = (self.local_proj_out_dim if self.mode == "SummaryMixing-fast"
               else self.summary_out_dim)
        return {
            "sum": jnp.zeros((batch, dim), dtype),
            "denom": jnp.zeros((batch, 1), dtype),
        }

    def decode_step(self, x_t: Array, cache: dict):
        """One causal decoding position: x_t [B, F] -> ([B, out], cache').

        Exactly the lower-triangular sum_mask path of __call__ evaluated
        at the newest position: pooled_t = sum_{s<=t} w^(t-s) s(x_s) /
        sum_{s<=t} w^(t-s) with w = 1 (full/fast) or decay_constant
        (expdecay — the laplace weights restricted by the lookahead mask
        ARE the one-sided geometric decay, summary_mixing.py:316-365).
        Equivalence with the full-prefix forward is pinned in
        tests/test_models.py."""
        x = x_t[:, None, :]
        local = None
        if self.mode in ("SummaryMixing", "SummaryMixing-expdecay"):
            local = self.local_proj(x)[:, 0]
            s = self.summary_proj(x)[:, 0]
        elif self.mode == "SummaryMixing-fast":
            proj = self.global_proj(x)[:, 0]
            local, s = jnp.split(proj, 2, axis=-1)
        else:  # lite
            s = self.summary_proj(x)[:, 0]
        w = self.decay_constant if self.mode == "SummaryMixing-expdecay" else 1.0
        new_sum = cache["sum"] * w + s.astype(cache["sum"].dtype)
        new_denom = cache["denom"] * w + 1.0
        pooled = (new_sum / new_denom).astype(s.dtype)
        cache = {"sum": new_sum, "denom": new_denom}
        if self.mode == "SummaryMixing-lite":
            return pooled, cache
        cat = jnp.concatenate([local, pooled], axis=-1)
        return self.summary_local_merging(cat[:, None])[:, 0], cache

    # -- full / expdecay -----------------------------------------------------
    def _mix(self, x, sum_mask, pad_mask, deterministic):
        t = x.shape[1]
        local = self.local_proj(x) * pad_mask          # f(x), Eq. 1b
        summary = self.summary_proj(x) * pad_mask      # s(x), Eq. 1c

        if self.mode == "SummaryMixing-expdecay":
            decay = laplace_weights(t, self.decay_constant)
            if sum_mask is None:
                # embed padding into the decay columns so the rowsum
                # normalises by valid decay mass only. The reference divides
                # by the raw rowsum (summary_mixing.py:233-235), attenuating
                # short utterances in proportion to bucket padding — a
                # padding-variance bug this build's strict-invariance
                # convention does not replicate.
                sum_mask = decay[None, :, :] * pad_mask[:, :, 0][:, None, :]
            else:
                sum_mask = decay * sum_mask

        if sum_mask is None:
            pooled = masked_time_mean(summary, pad_mask)
            pooled = jnp.broadcast_to(pooled, summary.shape)
        else:
            pooled = summary_matmul(sum_mask, summary)

        cat = jnp.concatenate([local, pooled], axis=-1)
        cat = self.dropout(cat, deterministic=deterministic)
        return self.summary_local_merging(cat)

    # -- fast ----------------------------------------------------------------
    def _mix_fast(self, x, sum_mask, pad_mask, deterministic):
        proj = self.global_proj(x) * pad_mask
        local, summary = jnp.split(proj, 2, axis=-1)
        if sum_mask is None:
            pooled = masked_time_mean(summary, pad_mask)
            pooled = jnp.broadcast_to(pooled, summary.shape)
        else:
            pooled = summary_matmul(sum_mask, summary)
        cat = jnp.concatenate([local, pooled], axis=-1)
        cat = self.dropout(cat, deterministic=deterministic)
        return self.summary_local_merging(cat)

    # -- lite ----------------------------------------------------------------
    def _avg_only(self, x, pad_mask):
        summary = self.summary_proj(x) * pad_mask
        pooled = masked_time_mean(summary, pad_mask)
        return jnp.broadcast_to(pooled, summary.shape)
