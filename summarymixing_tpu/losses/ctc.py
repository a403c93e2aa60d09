"""CTC loss (capability parity with speechbrain.nnet.losses.ctc_loss as
demanded by branchformer_summarymixing.yaml:274-276).

Native log-semiring alpha recursion over the extended label sequence
(blank l1 blank l2 ... blank), as a lax.scan over time with unroll=8 — the
recurrence's per-step work is a tiny [B, 2U+1] band update, so on TPU the
sequential loop overhead dominates and unrolling cuts the measured
fwd+bwd cost 2.5x vs the optax implementation at recipe scale
(9.55 -> 3.84 ms at B=8, T=750, V=5001; benchmarks/RESULTS.md). The
backward pass is JAX autodiff through the scan (implicit beta recursion).
Semantics: mean loss over utterances, each normalised by its label length
when `reduction='batchmean'` (matching the torch ctc_loss 'mean' reduction
the reference uses); verified against brute-force alignment enumeration
and optax.ctc_loss in tests/test_losses.py.

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

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e30


def ctc_forward_logprob(
    log_probs: Array,
    input_lengths: Array,
    targets: Array,
    target_lengths: Array,
    blank_id: int = 0,
    unroll: int = 8,
) -> Array:
    """log P(targets | log_probs) per utterance [B].

    log_probs [B, T, V] already log-softmaxed; targets [B, U] (values past
    target_lengths are ignored); lengths absolute."""
    b, t, _ = log_probs.shape
    u = targets.shape[1]
    s = 2 * u + 1

    # extended sequence: blank l1 blank l2 ... lU blank
    ext = jnp.full((b, s), blank_id, targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    lp_ext = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)

    # a label state may also be entered from s-2 when it differs from the
    # label two states back (standard CTC skip rule)
    same = jnp.concatenate(
        [jnp.ones((b, 2), bool), ext[:, 2:] == ext[:, :-2]], axis=1
    )
    can_skip = (jnp.arange(s)[None, :] % 2 == 1) & ~same
    valid_s = jnp.arange(s)[None, :] < (2 * target_lengths[:, None] + 1)

    alpha0 = jnp.full((b, s), _NEG).at[:, 0].set(0.0)
    alpha0 = alpha0.at[:, 1].set(jnp.where(target_lengths > 0, 0.0, _NEG))
    alpha0 = jnp.where(valid_s, alpha0 + lp_ext[:, 0], _NEG)

    def step(alpha, lp_t):
        stay = alpha
        prev = jnp.concatenate([jnp.full((b, 1), _NEG), alpha[:, :-1]], 1)
        skip = jnp.concatenate([jnp.full((b, 2), _NEG), alpha[:, :-2]], 1)
        skip = jnp.where(can_skip, skip, _NEG)
        m = jnp.maximum(jnp.maximum(stay, prev), skip)
        a = m + jnp.log(
            jnp.exp(stay - m) + jnp.exp(prev - m) + jnp.exp(skip - m)
        )
        a = jnp.where(valid_s, a + lp_t, _NEG)
        return a, a

    lps = jnp.moveaxis(lp_ext[:, 1:], 1, 0)             # [T-1, B, S]
    _, alphas = jax.lax.scan(step, alpha0, lps, unroll=unroll)
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]

    # log P = logaddexp(alpha[T-1, 2U-1], alpha[T-1, 2U]) at each row's T
    at_end = alphas[jnp.maximum(input_lengths - 1, 0), jnp.arange(b)]
    a_label = jnp.take_along_axis(
        at_end, jnp.maximum(2 * target_lengths - 1, 0)[:, None], 1)[:, 0]
    a_label = jnp.where(target_lengths > 0, a_label, _NEG)
    a_blank = jnp.take_along_axis(
        at_end, (2 * target_lengths)[:, None], 1)[:, 0]
    return jnp.maximum(jnp.logaddexp(a_label, a_blank), _NEG)


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
    per_seq = -ctc_forward_logprob(
        log_probs, input_lengths, targets, target_lengths, blank_id
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
