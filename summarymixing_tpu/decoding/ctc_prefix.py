"""Batched CTC prefix scoring for joint CTC/attention beam search.

Capability parity: speechbrain CTCScorer (branchformer yaml:227-231,
ctc_weight_decode 0.4) — the hybrid CTC/attention prefix scorer of
Watanabe et al. (2017), in the batched-over-candidates formulation
(espnet CTCPrefixScoreTH): for each live hypothesis g and each candidate
token c, track per-frame probabilities of g+c ending in non-blank (r_nb)
or blank (r_b):

    r_nb[t, c] = x[t, c]  + logaddexp(r_nb[t-1, c], phi[t-1, c])
    r_b [t, c] = x[t, blank] + logaddexp(r_nb[t-1, c], r_b[t-1, c])
    phi[t, c]  = r_b_prev[t] (+ r_nb_prev[t] unless c == last(g))
    psi[c]     = logsumexp_t( phi[t-1, c] + x[t, c] )   (+ t=0 seed)

The returned score is the *delta* psi(g+c) - psi(g), which beam search adds
to its running joint score. eos candidates score the full-sequence CTC
probability logaddexp(r_nb[T-1, g], r_b[T-1, g]) instead.

TPU notes: the three recurrences have closed forms, so the default
implementation has NO sequential T-loop (impl="parallel"):

    r_nb[t] = C[t] + clse_t( phi[t-1] - C[t-1] )        C = cumsum x_cand
    r_b [t] = B[t] + clse_t( r_nb[t-1] - B[t-1] )       B = cumsum x_blank
    psi     = logsumexp_t( phi[t-1] + x_cand[t] )

where clse is an inclusive cumulative logsumexp computed with
jax.lax.associative_scan (logaddexp is associative) — O(log T) depth
instead of T sequential steps, the same closed-form trick as the
transducer lattice row (losses/transducer.py). The sequential lax.scan
formulation is kept as impl="scan" (correctness oracle; parity test in
tests/test_decoding.py). Padding frames contribute x = 0 and are
excluded from psi; their r values are garbage but the scans are causal
and padding is a per-row suffix, so garbage never reaches valid frames.
States are [N, T] (selected hypotheses only — beam search gathers them
on prune). K is the pruned candidate count (partial CTC scoring),
keeping the per-step cost O(T * N * K) instead of O(T * N * V).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e5  # finite "log zero" (see losses/transducer.py)
# "log zero" for synthetic compacted frames (compact_blank_frames): their
# non-blank entries flow through the parallel impl's cumsum, where -1e5
# over hundreds of frames would push fp32 magnitudes past useful
# precision; -1e3 kills any path that touches one (scores of interest
# differ by << 1e3) while keeping cumsums well-conditioned.
_GAP_NEG = -1e3


def _pad_time_axis(n: int) -> int:
    """Round a static time-axis size up for the scorer's associative
    scans: power-of-two divisibility makes the halving recursion clean
    (measured 39.4 ms/step at T=750 vs 8.2 ms at T=384, RESULTS.md).
    >=128 -> next multiple of 128; below -> next power of two."""
    if n >= 128:
        return -(-n // 128) * 128
    p = 1
    while p < n:
        p *= 2
    return p


class CTCPrefixState(NamedTuple):
    r_nb: Array      # [N, T] prefix-ends-nonblank log-probs per frame
    r_b: Array       # [N, T] prefix-ends-blank log-probs per frame
    psi: Array       # [N] prefix score
    last: Array      # [N] last token of the prefix (-1 for empty)


def _gather_cand_lp(x: Array, cand: Array, beam: int) -> Array:
    """Candidate log-probs [N, T, K] from UNtiled x [B, T, V]
    (N = B*beam, row n belongs to utterance n // beam).

    This is the memory fix that makes test-scale beams fit: tiling x to
    [N, T, V] before the search puts an O(beam) copy of the CTC lattice
    inside the decode loop — at the reference test configuration
    (beam 66, V 5000) XLA materialised three ~1.7 GB layout copies of it
    and the program exceeded v5e HBM by 1 GB at compile. Gathering the
    K candidate columns per utterance FIRST keeps the big tensor at
    [B, T, V] and only the [N, T, K] slice is ever beam-shaped."""
    n, k = cand.shape
    if beam == 1:
        return jnp.take_along_axis(x, cand[:, None, :], axis=2)
    b, t, _ = x.shape
    cb = cand.reshape(b, beam * k)
    xc = jnp.take_along_axis(x, cb[:, None, :], axis=2)  # [B, T, beam*K]
    xc = xc.reshape(b, t, beam, k)
    return jnp.moveaxis(xc, 2, 1).reshape(n, t, k)


def _rows(x2d: Array, beam: int) -> Array:
    """[B, T] per-utterance values -> [N, T] per-hypothesis rows."""
    return x2d if beam == 1 else jnp.repeat(x2d, beam, axis=0)


def ctc_prefix_init(x: Array, input_lengths: Array, blank_id: int = 0,
                    beam: int = 1) -> CTCPrefixState:
    """x [B, T, V] CTC log-probs; with beam > 1 the state gets
    N = B*beam rows (row n = utterance n // beam) and input_lengths is
    [N]. beam=1 keeps the legacy one-row-per-hypothesis layout (callers
    that pre-tile x). Initial state for the empty prefix: r_b = cumsum
    of blank lps, r_nb = -inf."""
    t = x.shape[1]
    blank_lp = _rows(x[..., blank_id], beam)  # [N, T]
    n = blank_lp.shape[0]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    blank_lp = jnp.where(valid, blank_lp, 0.0)  # padding frames emit nothing
    r_b = jnp.cumsum(blank_lp, axis=1)
    r_b = jnp.maximum(r_b, _NEG)
    r_nb = jnp.full((n, t), _NEG, x.dtype)
    return CTCPrefixState(
        r_nb=r_nb,
        r_b=r_b,
        psi=jnp.zeros((n,), x.dtype),
        last=jnp.full((n,), -1, jnp.int32),
    )


def _cumlogsumexp(u: Array, axis: int) -> Array:
    """Inclusive cumulative logsumexp (logaddexp is associative)."""
    return jax.lax.associative_scan(jnp.logaddexp, u, axis=axis)


def ctc_prefix_score(
    state: CTCPrefixState,
    x: Array,
    input_lengths: Array,
    cand: Array,
    blank_id: int = 0,
    eos_id: Optional[int] = None,
    impl: str = "parallel",
    beam: int = 1,
) -> Tuple[Array, CTCPrefixState]:
    """Score K candidate extensions for each of N hypotheses.

    x [B, T, V] (beam > 1: N = B*beam hypotheses share each utterance's
    lattice — see _gather_cand_lp; beam=1: x is [N, T, V] pre-tiled);
    cand [N, K] int. Returns (score_delta [N, K], candidate_states)
    where candidate_states holds r/psi for EVERY candidate
    ([N, K, T] / [N, K]); beam search gathers the chosen ones via
    `ctc_prefix_select`. impl: "parallel" (closed-form, no sequential
    T-loop — default) or "scan" (the sequential oracle)."""
    t = x.shape[1]
    n, k = cand.shape
    valid = (jnp.arange(t)[None, :] < input_lengths[:, None])  # [N, T]

    x_cand = _gather_cand_lp(x, cand, beam)  # [N, T, K]
    # padding frames contribute nothing: 0 in the parallel cumsums (their
    # r values are suffix garbage, see module docstring), and psi masks
    # them explicitly below / via _NEG in the scan oracle
    pad_fill = 0.0 if impl == "parallel" else _NEG
    x_cand = jnp.where(valid[..., None], x_cand, pad_fill)
    x_blank = jnp.where(valid, _rows(x[..., blank_id], beam), 0.0)  # [N, T]

    same_as_last = cand == state.last[:, None]  # [N, K]
    # phi[t, c]: contribution of the parent prefix at frame t
    phi = jnp.where(
        same_as_last[:, None, :],
        state.r_b[..., None],
        jnp.logaddexp(state.r_b, state.r_nb)[..., None],
    )  # [N, T, K]

    # frame 0: r_nb[0, c] = x[0, c] (only if prefix empty — represented by
    # phi[-1] seed below); seed phi[-1] = 0 for the empty prefix, else -inf.
    empty_prefix = state.last < 0  # [N]
    phi_m1 = jnp.broadcast_to(
        jnp.where(empty_prefix[:, None], 0.0, _NEG), (n, k)
    ).astype(x.dtype)  # [N, K] seed
    phi_shift = jnp.concatenate(
        [phi_m1[:, None, :], phi[:, :-1, :]], axis=1
    )  # [N, T, K]: phi at t-1

    if impl == "parallel":
        # closed forms (module docstring): no sequential T-loop
        c_cum = jnp.cumsum(x_cand, axis=1)                  # C[t]
        c_shift = c_cum - x_cand                            # C[t-1]
        r_nb_all = c_cum + _cumlogsumexp(phi_shift - c_shift, axis=1)
        r_nb_all = jnp.maximum(r_nb_all, _NEG)              # [N, T, K]

        b_cum = jnp.cumsum(x_blank, axis=1)[..., None]      # B[t] [N,T,1]
        b_shift = b_cum - x_blank[..., None]                # B[t-1]
        r_nb_shift = jnp.concatenate(
            [jnp.full((n, 1, k), _NEG, x.dtype), r_nb_all[:, :-1]], axis=1
        )
        r_b_all = b_cum + _cumlogsumexp(r_nb_shift - b_shift, axis=1)
        r_b_all = jnp.maximum(r_b_all, _NEG)

        psi_terms = jnp.where(
            valid[..., None], phi_shift + x_cand, _NEG
        )
        psi = jnp.maximum(
            jax.nn.logsumexp(psi_terms, axis=1), _NEG
        )  # [N, K]
        # [N, T, K] -> [N, K, T]
        r_nb_all = jnp.moveaxis(r_nb_all, 1, 2)
        r_b_all = jnp.moveaxis(r_b_all, 1, 2)
    elif impl == "scan":

        def step(carry, inputs):
            r_nb_p, r_b_p, psi_p = carry  # [N, K] each
            xc_t, xb_t, phi_pm1 = inputs
            # r at frame t
            r_nb_t = xc_t + jnp.logaddexp(r_nb_p, phi_pm1)
            r_b_t = xb_t[:, None] + jnp.logaddexp(r_nb_p, r_b_p)
            psi_t = jnp.logaddexp(psi_p, phi_pm1 + xc_t)
            r_nb_t = jnp.maximum(r_nb_t, _NEG)
            r_b_t = jnp.maximum(r_b_t, _NEG)
            psi_t = jnp.maximum(psi_t, _NEG)
            return (r_nb_t, r_b_t, psi_t), (r_nb_t, r_b_t)

        init = (
            jnp.full((n, k), _NEG, x.dtype),
            jnp.full((n, k), _NEG, x.dtype),
            jnp.full((n, k), _NEG, x.dtype),
        )
        xs = (
            jnp.moveaxis(x_cand, 1, 0),       # [T, N, K]
            jnp.moveaxis(x_blank, 1, 0),      # [T, N]
            jnp.moveaxis(phi_shift, 1, 0),    # [T, N, K]
        )
        (_, _, psi), (r_nb_all, r_b_all) = jax.lax.scan(step, init, xs)
        # [T, N, K] -> [N, K, T]
        r_nb_all = jnp.moveaxis(r_nb_all, 0, 2)
        r_b_all = jnp.moveaxis(r_b_all, 0, 2)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    score = psi - state.psi[:, None]  # [N, K] delta

    if eos_id is not None:
        # eos candidate: full-prefix CTC probability (no extension)
        t_idx = jnp.maximum(input_lengths - 1, 0)
        full_lp = jnp.logaddexp(
            state.r_nb[jnp.arange(n), t_idx], state.r_b[jnp.arange(n), t_idx]
        )
        eos_score = full_lp - state.psi
        score = jnp.where(cand == eos_id, eos_score[:, None], score)

    cand_states = CTCPrefixState(
        r_nb=r_nb_all,   # [N, K, T]
        r_b=r_b_all,
        psi=psi,
        last=cand,
    )
    return score, cand_states


def ctc_prefix_score_only(
    state: CTCPrefixState,
    x: Array,
    input_lengths: Array,
    cand: Array,
    blank_id: int = 0,
    eos_id: Optional[int] = None,
    beam: int = 1,
) -> Tuple[Array, Array]:
    """Candidate score deltas WITHOUT materialising candidate states.

    psi — the only quantity the beam's pruning decision needs — is
    logsumexp_t(phi[t-1] + x_cand[t]); the r_nb/r_b recurrences feed
    only the NEXT step's phi, and beam search keeps just `beam` of the
    N*K candidates. So the two [N, T, K] cumulative-logsumexp scans and
    the [N, K, T] state tensors of `ctc_prefix_score` (the bandwidth
    hog at test-scale beams: ~10 log2(T) passes over ~100 MB tensors at
    beam 66) are skipped here, and `ctc_prefix_advance` rebuilds the
    state for the selected extensions only, at [N, T] cost, after
    pruning. Scores are EXACTLY those of ctc_prefix_score.

    x layout as in ctc_prefix_score: [B, T, V] with beam > 1, [N, T, V]
    pre-tiled with beam=1. Returns (score_delta [N, K], psi [N, K])."""
    t = x.shape[1]
    n = cand.shape[0]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]  # [N, T]
    x_cand = _gather_cand_lp(x, cand, beam)  # [N, T, K]

    same_as_last = cand == state.last[:, None]
    phi = jnp.where(
        same_as_last[:, None, :],
        state.r_b[..., None],
        jnp.logaddexp(state.r_b, state.r_nb)[..., None],
    )  # [N, T, K]
    empty_prefix = state.last < 0
    phi_m1 = jnp.broadcast_to(
        jnp.where(empty_prefix[:, None], 0.0, _NEG), (n, cand.shape[1])
    ).astype(x.dtype)
    phi_shift = jnp.concatenate([phi_m1[:, None, :], phi[:, :-1, :]], axis=1)

    psi_terms = jnp.where(valid[..., None], phi_shift + x_cand, _NEG)
    psi = jnp.maximum(jax.nn.logsumexp(psi_terms, axis=1), _NEG)  # [N, K]
    score = psi - state.psi[:, None]

    if eos_id is not None:
        t_idx = jnp.maximum(input_lengths - 1, 0)
        full_lp = jnp.logaddexp(
            state.r_nb[jnp.arange(n), t_idx], state.r_b[jnp.arange(n), t_idx]
        )
        score = jnp.where(cand == eos_id, (full_lp - state.psi)[:, None],
                          score)
    return score, psi


def ctc_prefix_advance(
    state: CTCPrefixState,
    x: Array,
    input_lengths: Array,
    token: Array,
    psi: Array,
    blank_id: int = 0,
    beam: int = 1,
) -> CTCPrefixState:
    """Rebuild the full prefix state for ONE chosen extension per row —
    the closed forms of `ctc_prefix_score` at K=1 (identical math, so
    states equal the ctc_prefix_select path bit-for-bit up to reduction
    order). `state`/`input_lengths` are the PARENT rows (already
    gathered by the beam's parent indices), `token` [N] the chosen
    extension, `psi` [N] its prefix score from ctc_prefix_score_only.
    x layout as in ctc_prefix_score ([B, T, V] with beam > 1 — the
    parent gather never applies to x: all rows of an utterance share
    its lattice)."""
    t = x.shape[1]
    n = token.shape[0]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    if beam == 1:
        xc = jnp.take_along_axis(x, token[:, None, None], axis=2)[..., 0]
    else:
        b = x.shape[0]
        tb = token.reshape(b, beam)
        xc = jnp.take_along_axis(x, tb[:, None, :], axis=2)  # [B, T, beam]
        xc = jnp.moveaxis(xc, 2, 1).reshape(n, t)
    xc = jnp.where(valid, xc, 0.0)                      # [N, T]
    xb = jnp.where(valid, _rows(x[..., blank_id], beam), 0.0)

    same = token == state.last
    phi = jnp.where(same[:, None], state.r_b,
                    jnp.logaddexp(state.r_b, state.r_nb))
    phi_m1 = jnp.where(state.last < 0, 0.0, _NEG).astype(x.dtype)
    phi_shift = jnp.concatenate([phi_m1[:, None], phi[:, :-1]], axis=1)

    c_cum = jnp.cumsum(xc, axis=1)
    r_nb = c_cum + _cumlogsumexp(phi_shift - (c_cum - xc), axis=1)
    r_nb = jnp.maximum(r_nb, _NEG)
    b_cum = jnp.cumsum(xb, axis=1)
    r_nb_shift = jnp.concatenate(
        [jnp.full((n, 1), _NEG, x.dtype), r_nb[:, :-1]], axis=1)
    r_b = b_cum + _cumlogsumexp(r_nb_shift - (b_cum - xb), axis=1)
    r_b = jnp.maximum(r_b, _NEG)
    return CTCPrefixState(r_nb=r_nb, r_b=r_b, psi=psi, last=token)


def ctc_prefix_select(cand_states: CTCPrefixState, hyp_idx: Array,
                      cand_idx: Array) -> CTCPrefixState:
    """Gather the chosen candidates' states after pruning.
    hyp_idx, cand_idx: [N'] indices into the N and K axes."""
    return CTCPrefixState(
        r_nb=cand_states.r_nb[hyp_idx, cand_idx],
        r_b=cand_states.r_b[hyp_idx, cand_idx],
        psi=cand_states.psi[hyp_idx, cand_idx],
        last=cand_states.last[hyp_idx, cand_idx],
    )


def compact_blank_frames(
    x: Array,
    input_lengths: Array,
    blank_id: int = 0,
    keep_cap: int = 0,
    blank_threshold: float = 0.95,
) -> Tuple[Array, Array, Array]:
    """Shrink the CTC time axis by collapsing blank-dominated frames.

    Trained CTC heads are peaky: most frames assign nearly all mass to
    blank (the basis of blank-skip decoding, e.g. WeNet's prefix beam
    search). The prefix scorer's per-decode-step cost is O(N*T*K), so
    dropping those frames directly scales the joint-beam scorer cost.

    Key identity: if a frame's non-blank mass is treated as exactly zero,
    then over a RUN of such frames the recurrence degenerates to
        r_nb -> -inf,   r_b -> (sum of the run's blank log-probs)
                              + logaddexp(r_nb_in, r_b_in)
    which is exactly ONE synthetic frame whose blank log-prob is the
    run's blank-lp sum and whose other entries are -inf. So compaction
    is a pure pre-pass on the log-prob tensor: keep frames whose blank
    prob < `blank_threshold` verbatim, replace each dropped run by one
    synthetic blank frame, and append one trailing synthetic frame (so
    eos scoring still sees the full-utterance blank tail). The scorer
    itself is unchanged; with blank_threshold=1.0 every valid frame is
    kept and the result is exact (the trailing G frame only merges
    r_nb into r_b AT the final frame, which preserves
    logaddexp(r_nb, r_b), the only quantity eos scoring reads).

    The approximation drops the (< 1 - blank_threshold) non-blank mass
    of dropped frames; with the default 0.95 this is WER-neutral on
    peaky models (validated end-to-end in tests/recipes).

    Args: x [B, T, V] log-softmax CTC probs (apply BEFORE beam tiling —
    the kept set depends on the utterance, not the hypothesis);
    input_lengths [B]; keep_cap: max kept frames per row (0 -> T; rows
    with more candidate frames keep the ones with most non-blank mass,
    degrading gracefully toward all-blank treatment).

    Returns (x2 [B, 2*cap+1, V], lengths2 [B], kept_count [B])."""
    b, t, v = x.shape
    cap = min(keep_cap, t) if keep_cap else t
    blank_lp = x[..., blank_id]                       # [B, T]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    thresh = jnp.log(jnp.asarray(blank_threshold, x.dtype))
    keep = valid & (blank_lp < thresh)

    # cap enforcement: keep the `cap` frames with the most non-blank mass
    score = jnp.where(keep, -blank_lp, -jnp.inf)
    _, kept_t = jax.lax.top_k(score, cap)             # [B, cap] (by score)
    kept_valid = jnp.take_along_axis(keep, kept_t, axis=1)
    kept_count = kept_valid.sum(axis=1)               # [B]
    # time order, invalid entries pushed past the end (sentinel t)
    t_i = jnp.sort(jnp.where(kept_valid, kept_t, t), axis=1)  # [B, cap]
    i_idx = jnp.arange(cap)[None, :]
    is_kept = i_idx < kept_count[:, None]
    t_prev = jnp.concatenate(
        [jnp.full((b, 1), -1, t_i.dtype), t_i[:, :-1]], axis=1
    )

    # blank-lp prefix sums over valid frames; cs_pad[j] = sum over t < j
    blank_cs = jnp.cumsum(jnp.where(valid, blank_lp, 0.0), axis=1)
    cs_pad = jnp.concatenate(
        [jnp.zeros((b, 1), x.dtype), blank_cs], axis=1
    )  # [B, T+1]
    rows = jnp.arange(b)[:, None]
    # dropped run strictly between t_prev and t_i: frames [t_prev+1, t_i-1]
    gap_sum = cs_pad[rows, t_i] - cs_pad[rows, t_prev + 1]   # [B, cap]
    has_gap = is_kept & (t_i - t_prev > 1)

    # output layout: kept frame i lands at i + (#gaps at or before i);
    # its gap frame (if any) directly precedes it
    gaps_incl = jnp.cumsum(has_gap, axis=1)
    pos = i_idx + gaps_incl                            # [B, cap]
    # scan-friendly static axis; extra slots sit beyond lengths2 and are
    # masked by the scorer
    t2 = _pad_time_axis(2 * cap + 1)
    out = jnp.full((b, t2, v), _GAP_NEG, x.dtype)
    out = out.at[:, :, blank_id].set(0.0)              # padded slots: benign

    src = jnp.take_along_axis(x, jnp.minimum(t_i, t - 1)[..., None], axis=1)
    pos_k = jnp.where(is_kept, pos, t2)                # OOB -> dropped
    out = out.at[rows, pos_k].set(src, mode="drop")
    pos_g = jnp.where(has_gap, pos - 1, t2)
    out = out.at[rows, pos_g, blank_id].set(gap_sum, mode="drop")

    # trailing synthetic frame: blanks after the last kept frame
    row1 = jnp.arange(b)
    last_kept_next = jnp.where(
        kept_count > 0,
        jnp.take_along_axis(
            t_i, jnp.maximum(kept_count - 1, 0)[:, None], axis=1
        )[:, 0] + 1,
        0,
    )
    tail_sum = cs_pad[row1, input_lengths] - cs_pad[row1, last_kept_next]
    pos_tail = kept_count + gaps_incl[:, -1]
    out = out.at[row1, pos_tail].set(_GAP_NEG)
    out = out.at[row1, pos_tail, blank_id].set(tail_sum)
    return out, pos_tail + 1, kept_count
