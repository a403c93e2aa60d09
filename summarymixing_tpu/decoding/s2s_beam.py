"""Joint CTC/attention beam search with LM shallow fusion, fully batched
and jit-compiled (fixed beam width, static max length).

Capability parity: speechbrain S2STransformerBeamSearcher + ScorerBuilder
with CTCScorer and TransformerLMScorer (branchformer yaml:227-269: beams
10/66, lm_weight 0.6, ctc_weight_decode 0.4, min/max_decode_ratio 0.0/1.0).

Score model (hybrid CTC/attention, Watanabe et al.):
    score(h) = (1 - ctc_w) * att(h) + ctc_w * ctc_prefix(h) + lm_w * lm(h)
with partial CTC scoring: per step, the top `ctc_candidates` tokens by
(att + lm) are CTC-scored, the rest are pruned (espnet's CTC_SCORING_RATIO
trick) — keeps the step cost O(T * beam * K) instead of O(T * beam * V).

The dynamic hypothesis set of the reference becomes fixed-width tensors
[B, beam, ...] with a finished mask: finished hypotheses only extend with
eos at delta 0 and keep competing on their frozen score (standard
fixed-shape beam bookkeeping; XLA-friendly, zero host sync per step)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from summarymixing_tpu.decoding.ctc_prefix import (
    CTCPrefixState,
    ctc_prefix_advance,
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_score_only,
    ctc_prefix_select,
)

Array = jax.Array
_NEG = -1e9


@dataclass(frozen=True)
class S2SBeamConfig:
    beam_size: int = 10
    ctc_weight: float = 0.4
    lm_weight: float = 0.0
    blank_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    max_length: int = 128     # static decode-length cap
    min_steps: int = 0        # min_decode_ratio * enc_len equivalent
    ctc_candidates: int = 0   # 0 -> 2 * beam_size
    length_norm: bool = True
    # decoder-softmax temperature (reference S2SBeamSearcher `temperature`;
    # the LibriSpeech/CommonVoice test_search stages use 1.15, branchformer
    # yaml:266 / CommonVoice yaml:203). Applied as a re-normalised
    # log-softmax over the decoder's log-probs, which is mathematically
    # identical to softmax(logits / T): the 1/T-scaled log-partition shift
    # is constant per row and cancels in the re-normalisation.
    temperature: float = 1.0
    # score candidates without materialising their [N, K, T] prefix
    # states, rebuilding only the selected beam's states after pruning
    # (exact; skips the two [N, T, K] cumulative-logsumexp scans that
    # dominate scorer bandwidth at test-scale beams). False = the
    # original materialise-then-gather path, kept as oracle.
    ctc_defer_states: bool = True


def s2s_beam_search(
    decode_step_fn: Callable[[Array, Array], Array],
    enc_out: Array,
    enc_lengths: Array,
    ctc_log_probs: Optional[Array],
    config: S2SBeamConfig,
    lm_step_fn: Optional[Callable[[Array, Array], Array]] = None,
    cache=None,
    lm_cache=None,
    nbest: int = 1,
) -> Tuple[Array, Array, Array]:
    """Run beam search.

    decode_step_fn(tokens [N, L], step) -> [N, V] next-token log-probs for
    the prefix tokens[:, :step+1] (N = batch * beam; any encoder state the
    step closure holds must map its N query rows onto utterances itself —
    either pre-tiled via `tile_for_beam`, or kept per-utterance with the
    n // beam row map, see ops/attention.py::_step_grouped). `enc_out` is
    unused by the search itself and only documents the API (the encoder
    state lives in the step closure / cache); pass it in whichever layout
    the closure was built from. `ctc_log_probs` MUST be per-utterance
    [B, T, V] — the prefix scorer maps hypothesis rows itself (n // beam),
    because a beam tile of the lattice inside the decode loop is O(beam)
    HBM on the search's largest tensor (a legacy pre-tiled [N, T, V] is
    accepted and folded back). `enc_lengths` here is the scorer's length
    vector, beam-tiled [N] (it may differ from the encoder mask lengths
    under blank-skip compaction).

    KV-cached mode: pass `cache` (from the model's decode_cache_init with
    rows=N) and a decode_step_fn(last_tokens [N], step, cache) ->
    (log-probs [N, V], cache). On beam pruning, only cache leaves with N
    rows (per-hypothesis state) are parent-gathered; per-utterance leaves
    (the cross-attention K/V) pass through untouched. Each step is
    O(step) instead of O(max_length^2).

    LM shallow fusion (TransformerLMScorer, reference yaml:233-246,
    lm_weight 0.60): pass lm_step_fn. Full-prefix signature
    lm_step_fn(tokens [N, L], step) -> [N, V], or KV-cached by ALSO passing
    `lm_cache` with lm_step_fn(last_tokens [N], step, lm_cache) ->
    ([N, V], lm_cache); the LM cache is gathered on pruning like the
    decoder cache.

    Returns (best_tokens [B, Lmax], best_lengths [B], best_scores [B]) —
    tokens exclude bos and eos. With nbest > 1, returns instead the top
    min(nbest, beam) hypotheses per utterance, score-sorted:
    ([B, n, Lmax], [B, n], [B, n]) — the reference searchers' topk/nbest
    surface (S2SBeamSearcher topk_tokens/topk_scores)."""
    beam = config.beam_size
    batch = enc_lengths.shape[0] // beam
    n = batch * beam
    lmax = config.max_length
    use_ctc = config.ctc_weight > 0.0 and ctc_log_probs is not None
    k_ctc = config.ctc_candidates or 2 * beam
    if ctc_log_probs is not None:
        k_ctc = min(k_ctc, ctc_log_probs.shape[-1])
    att_w = 1.0 - config.ctc_weight

    tokens = jnp.full((n, lmax + 1), config.eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(config.bos_id)
    # only beam 0 of each batch is live initially (identical hyps otherwise)
    scores = jnp.where(
        jnp.arange(n) % beam == 0, 0.0, _NEG
    ).astype(jnp.float32)
    lengths = jnp.zeros((n,), jnp.int32)  # decoded tokens so far (excl bos)
    finished = jnp.zeros((n,), bool)

    if use_ctc:
        # The scorer consumes the CTC lattice UNtiled ([B, T, V]): every
        # beam row of an utterance shares its lattice, and carrying an
        # O(beam) tile of it through the decode loop is what blew past
        # v5e HBM at the reference test configuration (beam 66, V 5000:
        # three ~1.7 GB layout copies; compile-time OOM by 1 GB).
        # Callers pass [B, T, V]; a legacy pre-tiled [N, T, V] is folded
        # back to one row per utterance (rows repeat, so [::beam] is
        # exact).
        if ctc_log_probs.shape[0] == n and beam > 1:
            ctc_log_probs = ctc_log_probs[::beam]
        # Pad the scorer's time axis to a scan-friendly size: the prefix
        # scorer's cumulative ops (associative_scan) want power-of-two
        # divisibility — measured 39.4 ms/step at T=750 vs 8.2 ms at
        # T=384 for the same workload (RESULTS.md). Padded frames lie
        # beyond input_lengths, which the scorer masks everywhere, so
        # this is exact.
        from summarymixing_tpu.decoding.ctc_prefix import _pad_time_axis

        t_pad = _pad_time_axis(ctc_log_probs.shape[1]) - ctc_log_probs.shape[1]
        if t_pad:
            ctc_log_probs = jnp.pad(ctc_log_probs,
                                    ((0, 0), (0, t_pad), (0, 0)))
        ctc_state = ctc_prefix_init(ctc_log_probs, enc_lengths,
                                    config.blank_id, beam=beam)
    else:
        ctc_state = ctc_prefix_init(
            jnp.zeros((n, 1, 2), jnp.float32), jnp.ones((n,), jnp.int32)
        )

    def step_fn(step, carry):
        (tokens, scores, lengths, finished, ctc_state, dec_cache,
         lm_cache_c) = carry
        if dec_cache is not None:
            att_lp, dec_cache = decode_step_fn(tokens[:, step], step, dec_cache)
        else:
            att_lp = decode_step_fn(tokens, step)      # [N, V]
        v = att_lp.shape[-1]
        k = min(k_ctc, v)  # static at trace time
        if config.temperature != 1.0:
            att_lp = jax.nn.log_softmax(att_lp / config.temperature, axis=-1)
        base_lp = att_w * att_lp
        if lm_step_fn is not None and config.lm_weight > 0.0:
            if lm_cache_c is not None:
                lm_lp, lm_cache_c = lm_step_fn(tokens[:, step], step,
                                               lm_cache_c)
            else:
                lm_lp = lm_step_fn(tokens, step)
            base_lp = base_lp + config.lm_weight * lm_lp

        # suppress eos before min_steps
        base_lp = jnp.where(
            (step < config.min_steps) & (jnp.arange(v)[None, :] == config.eos_id),
            _NEG,
            base_lp,
        )
        if use_ctc:
            # the blank id is not a transcript token: the reference's
            # CTCPrefixScorer sets psi[:, blank] = -inf. Without this,
            # psi(g + blank) ~= psi(g) makes blank the single BEST CTC
            # delta and an uncertain attention decoder emits blank into
            # the transcript.
            base_lp = jnp.where(
                jnp.arange(v)[None, :] == config.blank_id, _NEG, base_lp
            )

        cand_psi = None
        if use_ctc:
            cand_lp, cand_ids = jax.lax.top_k(base_lp, k)  # [N, K]
            if config.ctc_defer_states:
                ctc_delta, cand_psi = ctc_prefix_score_only(
                    ctc_state, ctc_log_probs, enc_lengths, cand_ids,
                    config.blank_id, config.eos_id, beam=beam,
                )
                cand_states = None
            else:
                ctc_delta, cand_states = ctc_prefix_score(
                    ctc_state, ctc_log_probs, enc_lengths, cand_ids,
                    config.blank_id, config.eos_id, beam=beam,
                )
            step_scores = cand_lp + config.ctc_weight * ctc_delta  # [N, K]
        else:
            step_scores, cand_ids = jax.lax.top_k(base_lp, k)
            cand_states = None

        # finished hypotheses: only candidate 0 survives, as eos with delta 0
        k_idx = jnp.arange(k)[None, :]
        step_scores = jnp.where(
            finished[:, None], jnp.where(k_idx == 0, 0.0, _NEG), step_scores
        )
        cand_ids = jnp.where(finished[:, None], config.eos_id, cand_ids)

        total = scores[:, None] + step_scores  # [N, K]
        flat = total.reshape(batch, beam * k)
        top_scores, top_idx = jax.lax.top_k(flat, beam)  # [batch, beam]
        parent = top_idx // k + (jnp.arange(batch) * beam)[:, None]
        cand = top_idx % k
        parent = parent.reshape(-1)   # [N]
        cand = cand.reshape(-1)

        new_tokens = tokens[parent]
        chosen_ids = cand_ids[parent, cand]
        new_tokens = new_tokens.at[:, step + 1].set(chosen_ids)
        was_finished = finished[parent]
        now_finished = was_finished | (chosen_ids == config.eos_id)
        # eos does not count toward the decoded length
        new_lengths = jnp.where(now_finished, lengths[parent],
                                lengths[parent] + 1)
        new_scores = top_scores.reshape(-1)
        if use_ctc:
            if config.ctc_defer_states:
                # rebuild states for the `beam` selected extensions only
                # (x stays [B, T, V]: all rows of an utterance share its
                # lattice, and parents never cross utterances — no
                # gather of x needed)
                parent_state = CTCPrefixState(
                    r_nb=ctc_state.r_nb[parent], r_b=ctc_state.r_b[parent],
                    psi=ctc_state.psi[parent], last=ctc_state.last[parent])
                new_ctc = ctc_prefix_advance(
                    parent_state, ctc_log_probs, enc_lengths, chosen_ids,
                    cand_psi[parent, cand], config.blank_id, beam=beam)
            else:
                new_ctc = ctc_prefix_select(cand_states, parent, cand)
            # finished rows keep parent state (frozen)
            new_ctc = CTCPrefixState(
                r_nb=jnp.where(was_finished[:, None],
                               ctc_state.r_nb[parent], new_ctc.r_nb),
                r_b=jnp.where(was_finished[:, None],
                              ctc_state.r_b[parent], new_ctc.r_b),
                psi=jnp.where(was_finished, ctc_state.psi[parent], new_ctc.psi),
                last=jnp.where(was_finished, ctc_state.last[parent],
                               new_ctc.last),
            )
        else:
            new_ctc = ctc_state
        # parent-gather ONLY the per-hypothesis cache state (N rows).
        # Beam-invariant leaves — the cross-attention K/V precomputed
        # from the encoder, kept UNtiled at B rows (decode_cache_init
        # rows=N) — pass through untouched: gathering them was pure HBM
        # traffic (identical rows) and its double-buffered while-body
        # copies were the largest allocations in the beam-66 OOM.
        def _gather_live(c):
            return c[parent] if c.shape[0] == n else c

        if dec_cache is not None:
            dec_cache = jax.tree.map(_gather_live, dec_cache)
        if lm_cache_c is not None:
            lm_cache_c = jax.tree.map(_gather_live, lm_cache_c)
        return (new_tokens, new_scores, new_lengths, now_finished, new_ctc,
                dec_cache, lm_cache_c)

    carry = (tokens, scores, lengths, finished, ctc_state, cache, lm_cache)

    # while_loop instead of fori_loop: once EVERY hypothesis across the
    # batch has emitted eos, further steps are frozen no-ops (finished
    # rows only extend with eos at score-delta 0), so exiting early is
    # exact — and on real speech most utterances finish long before the
    # static max_length cap, making test-scale beam decode data-bound
    # instead of cap-bound. Decode takes no gradients, so while_loop's
    # non-differentiability costs nothing.
    def _cond(step_carry):
        step, c = step_carry
        return (step < lmax) & ~jnp.all(c[3])

    def _body(step_carry):
        step, c = step_carry
        return step + 1, step_fn(step, c)

    _, carry = jax.lax.while_loop(
        _cond, _body, (jnp.asarray(0, jnp.int32), carry)
    )
    tokens, scores, lengths, finished = carry[:4]

    # unfinished hypotheses count full length; length-normalise if configured
    final = scores
    if config.length_norm:
        # eos counts toward length (SB convention: score / (len + 1))
        final = scores / (lengths.astype(jnp.float32) + 1.0)
    final = final.reshape(batch, beam)
    if nbest > 1:
        n_out = min(nbest, beam)
        top_scores, order = jax.lax.top_k(final, n_out)  # [batch, n]
        flat = order + jnp.arange(batch)[:, None] * beam
        return (tokens[flat][:, :, 1:],               # drop bos
                lengths[flat], top_scores)
    best = jnp.argmax(final, axis=1)  # [batch]
    best_flat = best + jnp.arange(batch) * beam
    best_tokens = tokens[best_flat][:, 1:]  # drop bos
    best_lengths = lengths[best_flat]
    best_scores = final[jnp.arange(batch), best]
    return best_tokens, best_lengths, best_scores


def tile_for_beam(x: Array, beam: int) -> Array:
    """[B, ...] -> [B*beam, ...] with each row repeated beam times."""
    return jnp.repeat(x, beam, axis=0)
