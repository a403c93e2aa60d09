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
    explicit carry. `max_tokens` must be sized for the WHOLE stream on the
    first chunk: the carried token buffer cannot grow, so the chunk-derived
    default would silently truncate later chunks (enforced below)."""
    b, t, j = enc_proj.shape
    if return_carry and carry is None and max_tokens is None:
        raise ValueError(
            "streaming decode (return_carry=True) requires max_tokens sized "
            "for the whole stream — the carried token buffer cannot grow "
            "past the first chunk's default"
        )
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


def transducer_beam_search_batched(
    enc_proj: Array,
    enc_lengths: Array,
    predictor_init: Callable,
    predictor_step: Callable,
    joint_step: Callable,
    blank_id: int = 0,
    bos_id: int = 0,
    beam_size: int = 10,
    state_beam: float = 2.3,
    expand_beam: float = 2.3,
    max_expand: Optional[int] = None,
    max_tokens: Optional[int] = None,
    lm_step: Optional[Callable] = None,
    lm_init: Optional[Callable] = None,
    lm_weight: float = 0.0,
    nbest: int = 1,
) -> Tuple[Array, Array, Array]:
    """Fully batched, on-device transducer beam search — the TPU-first
    redesign of the reference's per-utterance host loop (arXiv:1904.02619,
    transducer yaml:375-393: beam 10, state/expand beam 2.3, optional RNNLM
    fusion at lm_weight 0.5).

    Exact-emulation argument: the reference's inner while-loop pops the
    best process hypothesis at most `beam_size` times per frame (each pop
    appends exactly one blank-extended hypothesis to beam_hyps and the loop
    stops at beam_size). A process hypothesis ranked below the top
    `beam_size` of the pool can therefore never be popped this frame, so
    compacting the pool to the top `beam_size` entries after each round is
    lossless. The dynamic pool becomes fixed [B, beam + K] scratch compacted
    to [B, beam], with `beam_size` where-gated rounds per frame; early
    termination (state_beam) becomes a per-row continue mask. Outputs equal
    the host implementation whenever `max_expand` covers every expansion
    within expand_beam of the best (always true for max_expand >= vocab-1).

    enc_proj [B, T, J] (proj_enc applied), enc_lengths [B].
    Returns (tokens [B, Umax], lengths [B], scores [B]) — best hypothesis
    per row, scores length-normalised like the reference
    (logp / (len + 1), bos included in the reference's len). With
    nbest > 1, returns the top min(nbest, beam) hypotheses per row,
    score-sorted: ([B, n, Umax], [B, n], [B, n]) — the reference
    TransducerBeamSearcher's nbest/scores surface."""
    b, t_max, j = enc_proj.shape
    beam = beam_size
    k_exp = max_expand or beam
    umax = max_tokens or t_max
    neg = -1e30

    # initial hypothesis: [bos], score 0, predictor state AFTER feeding bos
    state0 = predictor_init(b)
    state0, proj0 = predictor_step(
        state0, jnp.full((b,), bos_id, jnp.int32)
    )
    use_lm = lm_step is not None and lm_weight > 0.0
    lm_state0 = lm_init(b) if use_lm else None

    def tile_beam(x, n):
        return jnp.broadcast_to(
            x[:, None], (b, n) + x.shape[1:]
        )

    def hyp_pool(n, state, proj, lm_state):
        pool = {
            "score": jnp.full((b, n), neg).at[:, 0].set(0.0),
            "tokens": jnp.zeros((b, n, umax), jnp.int32),
            "len": jnp.zeros((b, n), jnp.int32),
            "last": jnp.full((b, n), bos_id, jnp.int32),
            "proj": tile_beam(proj, n),
            "state": jax.tree.map(lambda x: tile_beam(x, n), state),
        }
        if use_lm:
            pool["lm"] = jax.tree.map(lambda x: tile_beam(x, n), lm_state)
        return pool

    def gather_pool(pool, idx):
        """idx [B] -> per-field gather of one hypothesis per row."""
        def g(x):
            ix = idx.reshape((b,) + (1,) * (x.ndim - 1))
            return jnp.take_along_axis(x, ix, axis=1)[:, 0]
        return jax.tree.map(g, pool)

    def select_rows(pool, idx):
        """idx [B, n] -> pool reordered/gathered along the pool axis."""
        def g(x):
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ix, axis=1)
        return jax.tree.map(g, pool)

    init_final = hyp_pool(beam, state0, proj0, lm_state0)

    def frame_step(carry_final, inputs):
        enc_frame, t_idx = inputs          # [B, J], scalar
        valid_t = t_idx < enc_lengths      # [B]

        proc = jax.tree.map(lambda x: x, carry_final)   # beam_hyps -> process
        final = jax.tree.map(lambda x: x, carry_final)
        final["score"] = jnp.full((b, beam), neg)
        n_final = jnp.zeros((b,), jnp.int32)

        def round_fn(_, inner):
            proc, final, n_final = inner
            p_best = jnp.max(proc["score"], axis=1)          # [B]
            p_idx = jnp.argmax(proc["score"], axis=1)        # [B]
            f_best = jnp.max(final["score"], axis=1)
            stop = (n_final >= beam) | (
                (n_final > 0) & (f_best >= state_beam + p_best)
            ) | (p_best <= neg / 2)
            act = valid_t & ~stop                            # [B]

            sel = gather_pool(proc, p_idx)
            # pop: deactivate the selected slot
            pop_mask = jax.nn.one_hot(p_idx, proc["score"].shape[1],
                                      dtype=bool)
            proc_score = jnp.where(act[:, None] & pop_mask, neg,
                                   proc["score"])

            logits = joint_step(enc_frame, sel["proj"])      # [B, V]
            logp = jax.nn.log_softmax(logits, axis=-1)
            v = logp.shape[-1]

            if use_lm:
                lm_new, lm_logits = lm_step(sel["lm"], sel["last"])
                lm_lp = jax.nn.log_softmax(lm_logits, axis=-1)

            # ---- blank extension -> final pool slot n_final ----
            f_slot = jax.nn.one_hot(n_final, beam, dtype=bool)  # [B, beam]
            put = act[:, None] & f_slot

            def put_final(dst, src):
                m = put.reshape((b, beam) + (1,) * (dst.ndim - 2))
                return jnp.where(m, jnp.expand_dims(src, 1), dst)

            new_final = {
                "score": jnp.where(
                    put, (sel["score"] + logp[:, blank_id])[:, None],
                    final["score"]),
                "tokens": put_final(final["tokens"], sel["tokens"]),
                "len": jnp.where(put, sel["len"][:, None], final["len"]),
                "last": jnp.where(put, sel["last"][:, None], final["last"]),
                "proj": put_final(final["proj"], sel["proj"]),
                "state": jax.tree.map(put_final, final["state"],
                                      sel["state"]),
            }
            if use_lm:
                new_final["lm"] = jax.tree.map(put_final, final["lm"],
                                               sel["lm"])
            n_final = n_final + act.astype(jnp.int32)

            # ---- non-blank expansions (top-K within expand_beam) ----
            k = min(k_exp, v - 1)
            nb_logp = logp.at[:, blank_id].set(neg)
            top_lp, top_ids = jax.lax.top_k(nb_logp, k)      # [B, K]
            # a hypothesis whose token buffer is full can only take the
            # blank path (same guard as greedy's lens < umax): without it
            # `len` would grow past umax while writes clamp to the last
            # slot, so reported lens would exceed the tokens width
            keep = ((top_lp >= top_lp[:, :1] - expand_beam) & act[:, None]
                    & (sel["len"] < umax)[:, None])
            exp_score = sel["score"][:, None] + top_lp
            if use_lm:
                exp_score = exp_score + lm_weight * jnp.take_along_axis(
                    lm_lp, top_ids, axis=1)
            exp_score = jnp.where(keep, exp_score, neg)

            # advance the predictor for all K expansions at once
            st_k = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[:, None], (b, k) + x.shape[1:]
                ).reshape((b * k,) + x.shape[1:]),
                sel["state"],
            )
            new_state, new_proj = predictor_step(
                st_k, top_ids.reshape(-1))
            new_state = jax.tree.map(
                lambda x: x.reshape((b, k) + x.shape[1:]), new_state)
            new_proj = new_proj.reshape(b, k, -1)

            # expansion token histories: sel.tokens + token at position len
            wpos = jnp.minimum(sel["len"], umax - 1)         # [B]
            onehot_u = (jnp.arange(umax)[None, None, :]
                        == wpos[:, None, None])              # [B,1,U]
            exp_tokens = jnp.where(
                onehot_u, top_ids[:, :, None],
                sel["tokens"][:, None, :])                   # [B,K,U]
            exp = {
                "score": exp_score,
                "tokens": exp_tokens,
                "len": jnp.broadcast_to(
                    jnp.minimum(sel["len"] + 1, umax)[:, None], (b, k)),
                "last": top_ids,
                "proj": new_proj,
                "state": new_state,
            }
            if use_lm:
                exp["lm"] = jax.tree.map(
                    lambda x: jnp.broadcast_to(
                        x[:, None], (b, k) + x.shape[1:]), lm_new)

            # ---- compact [beam + K] -> top beam (exactness argument
            # in the docstring) ----
            proc2 = {"score": jnp.concatenate([proc_score, exp["score"]], 1)}
            for key in ("tokens", "len", "last", "proj"):
                proc2[key] = jnp.concatenate([proc[key], exp[key]], axis=1)
            proc2["state"] = jax.tree.map(
                lambda a, x: jnp.concatenate([a, x], axis=1),
                proc["state"], exp["state"])
            if use_lm:
                proc2["lm"] = jax.tree.map(
                    lambda a, x: jnp.concatenate([a, x], axis=1),
                    proc["lm"], exp["lm"])
            _, top_idx = jax.lax.top_k(proc2["score"], beam)
            proc2 = select_rows(proc2, top_idx)
            return proc2, new_final, n_final

        proc, final_new, n_final = jax.lax.fori_loop(
            0, beam, round_fn, (proc, final, n_final))
        out = jax.tree.map(
            lambda new, old: jnp.where(
                valid_t.reshape((b,) + (1,) * (new.ndim - 1)), new, old
            ),
            final_new, carry_final,
        )
        return out, None

    xs = (jnp.moveaxis(enc_proj, 1, 0), jnp.arange(t_max))
    final, _ = jax.lax.scan(frame_step, init_final, xs)

    # reference normalisation: score / len(prediction), bos included
    norm = final["score"] / jnp.maximum(
        final["len"].astype(jnp.float32) + 1.0, 1.0)
    norm = jnp.where(final["score"] <= neg / 2, neg, norm)
    if nbest > 1:
        # the reference TransducerBeamSearcher's nbest surface: top
        # min(nbest, beam) hypotheses per row, score-sorted
        n_out = min(nbest, beam)
        top_scores, order = jax.lax.top_k(norm, n_out)    # [B, n]
        picked = select_rows({"tokens": final["tokens"],
                              "len": final["len"]}, order)
        return picked["tokens"], picked["len"], top_scores
    best = jnp.argmax(norm, axis=1)
    sel = gather_pool({"tokens": final["tokens"], "len": final["len"]},
                      best)
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return sel["tokens"], sel["len"], best_scores


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
