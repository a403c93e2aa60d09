"""Sequence cross-entropy losses: KL-divergence with label smoothing and
plain NLL (capability parity with speechbrain.nnet.losses.kldiv_loss /
nll_loss, demanded by branchformer_summarymixing.yaml:278-280 and the
transducer recipe's CE aux loss, transducer yaml:319-320)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _length_mask(lengths: Optional[Array], b: int, u: int, dtype) -> Array:
    if lengths is None:
        return jnp.ones((b, u), dtype)
    from summarymixing_tpu.ops.masks import length_to_mask

    return length_to_mask(lengths, u).astype(dtype)


def kldiv_loss(
    log_probs: Array,
    targets: Array,
    target_lengths: Optional[Array] = None,
    label_smoothing: float = 0.0,
    pad_idx: Optional[int] = None,
    reduction: str = "batchmean",
) -> Array:
    """KL(label-smoothed one-hot || model). log_probs [B, U, V], targets
    [B, U] int. With smoothing eps: true class gets 1-eps, the rest share
    eps uniformly (excluding pad_idx if given)."""
    b, u, v = log_probs.shape
    mask = _length_mask(target_lengths, b, u, log_probs.dtype)
    if pad_idx is not None:
        mask = mask * (targets != pad_idx).astype(log_probs.dtype)

    tgt_lp = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth_mass = label_smoothing / (v - (2 if pad_idx is not None else 1))
        sum_lp = jnp.sum(log_probs, axis=-1)
        if pad_idx is not None:
            sum_lp = sum_lp - log_probs[..., pad_idx]
        nll = -(
            (1.0 - label_smoothing) * tgt_lp
            + smooth_mass * (sum_lp - tgt_lp)
        )
    else:
        nll = -tgt_lp
    nll = nll * mask

    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
    if reduction == "batchmean":
        per_seq = jnp.sum(nll, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return jnp.mean(per_seq)
    raise ValueError(f"unknown reduction {reduction!r}")


def nll_loss(
    log_probs: Array,
    targets: Array,
    target_lengths: Optional[Array] = None,
    pad_idx: Optional[int] = None,
    reduction: str = "batchmean",
) -> Array:
    return kldiv_loss(
        log_probs, targets, target_lengths,
        label_smoothing=0.0, pad_idx=pad_idx, reduction=reduction,
    )
