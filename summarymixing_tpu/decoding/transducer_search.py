"""Transducer decoding: batched greedy (one jit, scan over frames) and
beam search with optional RNNLM shallow fusion.

Capability parity: speechbrain TransducerBeamSearcher (transducer
yaml:375-393): greedy via beam_size=1 (valid) and beam_size=10 with
state_beam 2.3 / expand_beam 2.3 (arXiv:1904.02619) + lm_weight 0.5 (test).

- Greedy is fully on-device: lax.scan over encoder frames with a bounded
  number of emissions per frame (static shapes; predictor state advanced
  with where-masked selects).
- Beam search follows the reference's per-utterance algorithm host-side,
  calling the jitted predictor/joint steps; hypotheses are python objects
  (the reference does the same — beam search is not the throughput path)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def transducer_greedy_decode(
    enc_proj: Array,
    enc_lengths: Array,
    predictor_init: Callable[[int], tuple],
    predictor_step: Callable,
    joint_step: Callable,
    blank_id: int = 0,
    max_symbols_per_frame: int = 3,
    max_tokens: Optional[int] = None,
    carry: Optional[tuple] = None,
    return_carry: bool = False,
):
    """enc_proj [B, T, J] (already proj_enc'ed). Returns (tokens [B, Umax],
    lengths [B]). All callables must be jit-traceable (bound model methods).

    Streaming: pass the previous chunk's `carry` (from return_carry=True) and
    per-chunk enc_proj/enc_lengths; tokens/lengths accumulate across chunks —
    the incremental decode of reference TransducerBeamSearcher over
    `encode_streaming` chunks (SURVEY.md §3.4), with the decoder state as an
    explicit carry."""
    b, t, j = enc_proj.shape
    if carry is not None:
        pred_state, dec_proj, tokens0, lens0 = carry
        umax = tokens0.shape[1]
    else:
        umax = max_tokens or t * 2
        pred_state = predictor_init(b)
        # initial predictor input: blank/bos token
        pred_state, dec_proj = predictor_step(
            pred_state, jnp.full((b,), blank_id, jnp.int32)
        )
        tokens0 = jnp.zeros((b, umax), jnp.int32)
        lens0 = jnp.zeros((b,), jnp.int32)

    def frame_step(carry, inputs):
        pred_state, dec_proj, tokens, lens = carry
        enc_frame, t_idx = inputs  # [B, J], scalar

        def emit_once(_, inner):
            pred_state, dec_proj, tokens, lens, active = inner
            logits = joint_step(enc_frame, dec_proj)  # [B, V]
            k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = active & (k != blank_id) & (lens < umax) & (
                t_idx < enc_lengths
            )
            tokens = jnp.where(
                emit[:, None]
                & (jnp.arange(umax)[None, :] == lens[:, None]),
                k[:, None],
                tokens,
            )
            new_state, new_proj = predictor_step(pred_state, k)
            sel = lambda new, old: jnp.where(  # noqa: E731
                emit.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            )
            pred_state = jax.tree.map(sel, new_state, pred_state)
            dec_proj = jnp.where(emit[:, None], new_proj, dec_proj)
            lens = jnp.where(emit, lens + 1, lens)
            return pred_state, dec_proj, tokens, lens, emit

        active0 = jnp.ones((b,), bool)
        pred_state, dec_proj, tokens, lens, _ = jax.lax.fori_loop(
            0, max_symbols_per_frame, emit_once,
            (pred_state, dec_proj, tokens, lens, active0),
        )
        return (pred_state, dec_proj, tokens, lens), None

    xs = (jnp.moveaxis(enc_proj, 1, 0), jnp.arange(t))
    (pred_state, dec_proj, tokens, lens), _ = jax.lax.scan(
        frame_step, (pred_state, dec_proj, tokens0, lens0), xs
    )
    if return_carry:
        return tokens, lens, (pred_state, dec_proj, tokens, lens)
    return tokens, lens


@dataclass(eq=False)  # identity equality: list.remove must not compare
class _Hyp:        # jax array fields (ambiguous bool) nor merge equal hyps
    prediction: List[int]
    logp_score: float
    pred_state: tuple
    dec_proj: np.ndarray
    lm_state: Optional[tuple] = None


def transducer_beam_search(
    enc_proj_row: np.ndarray,
    enc_length: int,
    predictor_init: Callable,
    predictor_step: Callable,
    joint_step: Callable,
    blank_id: int = 0,
    bos_id: int = 0,
    beam_size: int = 10,
    state_beam: float = 2.3,
    expand_beam: float = 2.3,
    nbest: int = 1,
    lm_step: Optional[Callable] = None,
    lm_init: Optional[Callable] = None,
    lm_weight: float = 0.0,
) -> List[Tuple[List[int], float]]:
    """Single-utterance transducer beam search (reference algorithm,
    arXiv:1904.02619). enc_proj_row [T, J] numpy. Step callables operate on
    batch-1 jax arrays. Returns nbest (tokens, score/len) sorted best-first.
    """
    state = predictor_init(1)
    state, dec_proj = predictor_step(
        state, jnp.full((1,), bos_id, jnp.int32)
    )
    lm_state = lm_init(1) if (lm_step and lm_weight > 0.0) else None

    beam_hyps = [_Hyp([bos_id], 0.0, state, np.asarray(dec_proj), lm_state)]

    for t in range(int(enc_length)):
        enc_frame = jnp.asarray(enc_proj_row[t : t + 1])
        process_hyps = beam_hyps
        beam_hyps = []
        while True:
            if len(beam_hyps) >= beam_size:
                break
            a_best = max(process_hyps, key=lambda h: h.logp_score)
            if beam_hyps:
                b_best = max(beam_hyps, key=lambda h: h.logp_score)
                if b_best.logp_score >= state_beam + a_best.logp_score:
                    break
            process_hyps.remove(a_best)

            logits = joint_step(enc_frame, jnp.asarray(a_best.dec_proj))
            logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
            if lm_state is not None:
                lm_s, lm_logits = lm_step(a_best.lm_state,
                                          jnp.asarray([a_best.prediction[-1]]))
                lm_lp = np.asarray(jax.nn.log_softmax(lm_logits, axis=-1))[0]
            # blank extension -> candidate final hypothesis for this frame
            beam_hyps.append(_Hyp(
                list(a_best.prediction),
                a_best.logp_score + float(logp[blank_id]),
                a_best.pred_state, a_best.dec_proj, a_best.lm_state,
            ))
            # non-blank expansions within expand_beam of the best logp
            best_logp = float(np.max(np.delete(logp, blank_id)))
            for k in np.argsort(logp)[::-1]:
                k = int(k)
                if k == blank_id:
                    continue
                if float(logp[k]) < best_logp - expand_beam:
                    break
                new_state, new_proj = predictor_step(
                    a_best.pred_state, jnp.asarray([k], jnp.int32)
                )
                score = a_best.logp_score + float(logp[k])
                new_lm_state = a_best.lm_state
                if lm_state is not None:
                    score += lm_weight * float(lm_lp[k])
                    new_lm_state = lm_s
                process_hyps.append(_Hyp(
                    a_best.prediction + [k], score, new_state,
                    np.asarray(new_proj), new_lm_state,
                ))
    beam_hyps.sort(key=lambda h: h.logp_score / max(len(h.prediction), 1),
                   reverse=True)
    return [
        (h.prediction[1:], h.logp_score / max(len(h.prediction), 1))
        for h in beam_hyps[:nbest]
    ]
