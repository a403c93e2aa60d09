"""RNN-Transducer loss as a TPU-native log-semiring lattice.

Capability parity: speechbrain.nnet.losses.transducer_loss with
use_torchaudio=False dispatches to a Numba CUDA kernel
(transducer yaml:162,334-336) — the one true native-kernel dependency of the
reference (SURVEY.md §2.3). Re-derived here for XLA:

The alpha recursion over the [T, U+1] lattice,
    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + label[t, u-1]),
is computed as a lax.scan over t. The within-row dependency (a first-order
log-semiring linear recurrence in u) is closed-form:

    alpha[t, u] = L[t, u] + logcumsumexp_u( A[t, u] - L[t, u] )
    A[t, u] = alpha[t-1, u] + blank[t-1, u]   (entry from the row above)
    L[t, u] = sum_{w < u} label[t, w]         (exclusive cumsum of label lps)

which replaces the sequential in-row loop with one vectorised
`cumlogsumexp` per scan step — O(T) steps of O(U) parallel work, ideal for
the VPU. The loss is differentiated by JAX autodiff through the scan (the
implicit beta recursion), so no hand-written backward is needed.

Numerics: "log zero" is -1e5, not -inf — exp(-1e5) underflows to exactly 0
in fp32, while keeping every intermediate finite so reverse-mode autodiff
never multiplies 0 cotangents with inf partials (NaN-free backward).
Genuine path log-probs are > -1e4 for any realistic (T, U), so the clamp is
inactive on real paths.

The per-utterance answer alpha[T_b-1, U_b] + blank[T_b-1, U_b] is latched
inside the scan at t == T_b-1, so only O(B*U) state is carried — the full
[T, U] alpha surface is never materialised in HBM (the residuals saved for
autodiff are the per-step carries, which XLA keeps as the scan's natural
stack).

Example:

    >>> import jax.numpy as jnp
    >>> from summarymixing_tpu.losses.transducer import transducer_loss
    >>> logits = jnp.zeros((1, 6, 4, 5))   # [B, T, U+1, V], uniform joint
    >>> l = transducer_loss(logits, jnp.asarray([[1, 2, 3]]),
    ...                     jnp.asarray([6]), jnp.asarray([3]))
    >>> round(float(l), 3)
    10.46
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e5


def transducer_lattice_logprob(
    blank_lp: Array, label_lp: Array, input_lengths: Array, target_lengths: Array
) -> Array:
    """blank_lp [B, T, U+1]: log P(blank | t, u). label_lp [B, T, U+1]:
    log P(y_{u+1} | t, u) (entries at u >= U_b are ignored). Returns
    log P(y | x) [B]."""
    b, t, u1 = blank_lp.shape

    u_idx = jnp.arange(u1)[None, None, :]
    label_valid = u_idx < target_lengths[:, None, None]
    label_lp = jnp.where(label_valid, label_lp, _NEG)

    def excl_cumsum_row(label_t):
        # exclusive cumsum of label lps along u, clamped to stay finite
        cs = jnp.concatenate(
            [jnp.zeros((b, 1), label_t.dtype),
             jnp.cumsum(label_t[:, :-1], axis=1)],
            axis=1,
        )
        return jnp.maximum(cs, _NEG)

    t_last = jnp.maximum(input_lengths - 1, 0)  # [B]
    # blank lp at (t, U_b) for every t: [B, T]
    final_blank = jnp.take_along_axis(
        blank_lp, target_lengths[:, None, None], axis=2
    )[..., 0]

    def final_at(alpha_t, t_idx):
        a = jnp.take_along_axis(alpha_t, target_lengths[:, None], axis=1)[:, 0]
        return a + final_blank[jnp.arange(b), t_idx]

    # t = 0 row: alpha[0, u] = sum_{w<u} label[0, w]
    alpha0 = excl_cumsum_row(label_lp[:, 0])
    latched0 = jnp.where(t_last == 0, final_at(alpha0, jnp.zeros((), jnp.int32)),
                         jnp.full((b,), _NEG))
    if t == 1:
        return latched0

    def row(carry, inputs):
        alpha_prev, latched = carry
        blank_prev, label_t, t_idx = inputs
        a_entry = alpha_prev + blank_prev
        l_cum = excl_cumsum_row(label_t)
        alpha_t = jnp.maximum(
            l_cum + jax.lax.cumlogsumexp(a_entry - l_cum, axis=1), _NEG
        )
        latched = jnp.where(t_idx == t_last, final_at(alpha_t, t_idx), latched)
        return (alpha_t, latched), None

    blanks = jnp.moveaxis(blank_lp[:, :-1], 1, 0)  # [T-1, B, U+1]
    labels = jnp.moveaxis(label_lp[:, 1:], 1, 0)
    t_ids = jnp.arange(1, t)
    (_, latched), _ = jax.lax.scan(row, (alpha0, latched0), (blanks, labels, t_ids))
    return latched


def _reduce(loss: Array, target_lengths: Array, reduction: str) -> Array:
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "batchmean":
        return jnp.mean(loss / jnp.maximum(target_lengths, 1))
    raise ValueError(f"unknown reduction {reduction!r}")


def gather_lattice_logprobs(
    logits: Array, targets: Array, blank_id: int
) -> tuple:
    """[B, T', U+1, V] joint logits -> the only two normalised V-slices
    the lattice needs: (blank_lp, label_lp), each [B, T', U+1]."""
    lsd = jax.scipy.special.logsumexp(logits, axis=-1)
    blank_lp = logits[..., blank_id] - lsd
    tgt = jnp.concatenate(
        [targets, jnp.zeros((targets.shape[0], 1), targets.dtype)], axis=1
    )
    label_lp = jnp.take_along_axis(
        logits, tgt[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0] - lsd
    return blank_lp, label_lp


def transducer_loss_chunked(
    enc_proj: Array,
    dec_proj: Array,
    joint_fn,
    targets: Array,
    input_lengths: Array,
    target_lengths: Array,
    blank_id: int = 0,
    reduction: str = "mean",
    chunk_size: int = 64,
) -> Array:
    """RNN-T loss WITHOUT materialising the [B, T, U+1, V] joint tensor.

    The joint logits are the train step's largest tensor (B=8, T=750,
    U~100, V=1000 => 2.4 GB fp32 + the same again for its gradient —
    the reference's Numba kernel reads a fully materialised log_softmax
    of exactly this shape, transducer yaml:334-336). Only two V-slices
    per (t, u) ever reach the lattice, so this computes the joint in
    T-chunks inside a lax.scan: per chunk, `joint_fn(enc_chunk
    [B, c, J], dec_proj [B, U+1, J]) -> [B, c, U+1, V]` logits live only
    as a scan-local temporary; the scan's saved residuals are the
    [B, c, U+1] slices. jax.checkpoint re-derives each chunk's logits in
    backward (the analytic softmax-weighted gradient then flows to
    enc_proj / dec_proj / joint params through plain autodiff), trading
    ~1 extra joint matmul for ~V/2 x less HBM for the dominant tensor.

    T is zero-padded to a chunk multiple; padded frames produce valid
    (<= 0) log-probs that the lattice ignores past `input_lengths`
    (the answer is latched at t == T_b - 1)."""
    b, t, j = enc_proj.shape
    n_chunks = -(-t // chunk_size)
    pad = n_chunks * chunk_size - t
    if pad:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pad), (0, 0)))
    chunks = jnp.moveaxis(
        enc_proj.reshape(b, n_chunks, chunk_size, j), 1, 0
    )  # [n_chunks, B, c, J]

    @jax.checkpoint
    def chunk_slices(enc_chunk):
        logits = joint_fn(enc_chunk, dec_proj)
        return gather_lattice_logprobs(logits, targets, blank_id)

    def body(carry, enc_chunk):
        return carry, chunk_slices(enc_chunk)

    _, (blank_lp, label_lp) = jax.lax.scan(body, (), chunks)
    blank_lp = jnp.moveaxis(blank_lp, 0, 1).reshape(b, -1, blank_lp.shape[-1])
    label_lp = jnp.moveaxis(label_lp, 0, 1).reshape(b, -1, label_lp.shape[-1])
    ll = transducer_lattice_logprob(
        blank_lp[:, :t], label_lp[:, :t], input_lengths, target_lengths
    )
    return _reduce(-ll, target_lengths, reduction)


def transducer_loss(
    logits: Array,
    targets: Array,
    input_lengths: Array,
    target_lengths: Array,
    blank_id: int = 0,
    reduction: str = "mean",
) -> Array:
    """logits [B, T, U+1, V] joint network outputs (pre-softmax);
    targets [B, U] int labels; lengths absolute. Matches the reference's
    Numba kernel semantics (log_softmax over V inside)."""
    # Only two V-slices of the normalised lattice are needed (blank and the
    # next label), so normalise those directly against the logsumexp
    # denominator instead of materialising the full [B,T,U+1,V] log_softmax
    # (identical numerics, ~10% less HBM traffic measured at recipe scale).
    blank_lp, label_lp = gather_lattice_logprobs(logits, targets, blank_id)
    ll = transducer_lattice_logprob(blank_lp, label_lp, input_lengths, target_lengths)
    return _reduce(-ll, target_lengths, reduction)
