"""CTC loss (capability parity with speechbrain.nnet.losses.ctc_loss as
demanded by branchformer_summarymixing.yaml:274-276).

Wraps optax's log-semiring forward recursion (XLA scan, TPU-native — the
reference dispatches to cuDNN). Semantics: mean loss over utterances, each
utterance's loss normalised by its label length when `reduction='batchmean'`
(matching the torch ctc_loss 'mean' reduction the reference uses).

Example:

    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu.losses.ctc import ctc_loss
    >>> lp = jax.nn.log_softmax(jnp.zeros((2, 12, 6)), -1)  # uniform model
    >>> l = ctc_loss(lp, jnp.asarray([12, 10]),
    ...              jnp.asarray([[1, 2, 3], [1, 2, 0]]), jnp.asarray([3, 2]))
    >>> round(float(l), 3)
    5.092
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def ctc_loss(
    log_probs: Array,
    input_lengths: Array,
    targets: Array,
    target_lengths: Array,
    blank_id: int = 0,
    reduction: str = "batchmean",
) -> Array:
    """log_probs [B, T, V] (log-softmax over V); targets [B, U] int labels
    padded with anything (mask from target_lengths); lengths absolute."""
    b, t, _ = log_probs.shape
    u = targets.shape[1]
    logit_paddings = (
        jnp.arange(t)[None, :] >= input_lengths[:, None]
    ).astype(log_probs.dtype)
    label_paddings = (
        jnp.arange(u)[None, :] >= target_lengths[:, None]
    ).astype(log_probs.dtype)
    # optax expects logits; it applies log_softmax internally, which is a
    # no-op shift for already-normalised log-probs.
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, targets, label_paddings, blank_id=blank_id
    )
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "mean":
        return jnp.mean(per_seq)
    if reduction == "batchmean":
        # torch 'mean': per-sequence loss / target_length, then batch mean
        return jnp.mean(per_seq / jnp.maximum(target_lengths, 1))
    raise ValueError(f"unknown reduction {reduction!r}")
