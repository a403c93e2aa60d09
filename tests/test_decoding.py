"""Decoding tests: CTC prefix scorer vs CTC forward probability, beam
search on an overfit joint model, LM modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.decoding.ctc_prefix import (
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_select,
)
from summarymixing_tpu.decoding.s2s_beam import (
    S2SBeamConfig,
    s2s_beam_search,
    tile_for_beam,
)
from summarymixing_tpu.losses import ctc_loss
from summarymixing_tpu.models.lm import RNNLM, TransformerLM


def test_ctc_prefix_scorer_sums_to_ctc_forward(rng):
    """Rolling the prefix scorer over the tokens of y and finishing with
    eos must reproduce log p_ctc(y) from the CTC loss — the strongest
    end-to-end check of the scorer recursions."""
    t_len, v = 8, 6
    blank, eos = 0, 5
    y = [2, 3, 3, 1]
    logits = rng.standard_normal((1, t_len, v)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lens = jnp.asarray([t_len])

    state = ctc_prefix_init(lp, lens, blank)
    total = 0.0
    for tok in y:
        cand = jnp.asarray([[tok, 4]])  # include a distractor candidate
        delta, cand_states = ctc_prefix_score(state, lp, lens, cand, blank, eos)
        total += float(delta[0, 0])
        state = ctc_prefix_select(
            cand_states, jnp.asarray([0]), jnp.asarray([0])
        )
    # eos step: delta = full-sequence ctc prob minus prefix psi
    cand = jnp.asarray([[eos, 4]])
    delta, _ = ctc_prefix_score(state, lp, lens, cand, blank, eos)
    total += float(delta[0, 0])

    want = -float(ctc_loss(
        lp, lens, jnp.asarray([y]), jnp.asarray([len(y)]),
        blank_id=blank, reduction="none",
    )[0])
    np.testing.assert_allclose(total, want, rtol=1e-4, atol=1e-4)


def test_ctc_prefix_parallel_matches_scan_oracle(rng):
    """The closed-form (associative-scan) scorer must match the
    sequential lax.scan formulation on scores AND carried states, over
    multiple chained steps with ragged lengths."""
    from summarymixing_tpu.decoding.ctc_prefix import (
        ctc_prefix_init,
        ctc_prefix_score,
        ctc_prefix_select,
    )

    n, t, v, k = 3, 17, 9, 4
    x = jnp.asarray(
        np.log(rng.dirichlet(np.ones(v), size=(n, t))), jnp.float32
    )
    lens = jnp.asarray([17, 11, 5], jnp.int32)

    st_p = ctc_prefix_init(x, lens)
    st_s = ctc_prefix_init(x, lens)
    for step in range(3):
        cand = jnp.asarray(
            rng.integers(1, v, (n, k)).astype(np.int32))
        sc_p, cs_p = ctc_prefix_score(st_p, x, lens, cand, eos_id=2,
                                      impl="parallel")
        sc_s, cs_s = ctc_prefix_score(st_s, x, lens, cand, eos_id=2,
                                      impl="scan")
        np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_s),
                                   rtol=1e-5, atol=1e-5)
        # compare carried states on VALID frames only (the parallel form
        # leaves garbage in each row's padding suffix by design)
        for fld in ("r_nb", "r_b"):
            a = np.asarray(getattr(cs_p, fld))
            b = np.asarray(getattr(cs_s, fld))
            for i, L in enumerate(np.asarray(lens)):
                np.testing.assert_allclose(a[i, :, :L], b[i, :, :L],
                                           rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cs_p.psi),
                                   np.asarray(cs_s.psi),
                                   rtol=1e-5, atol=1e-5)
        hyp = jnp.arange(n)
        pick = jnp.asarray(rng.integers(0, k, (n,)).astype(np.int32))
        st_p = ctc_prefix_select(cs_p, hyp, pick)
        st_s = ctc_prefix_select(cs_s, hyp, pick)


def test_ctc_prefix_scorer_repeat_vs_distinct(rng):
    """Extending with the same token as last requires an intervening blank,
    so p(aa) must be <= p(ab) when emissions are symmetric-ish; sanity check
    that the same/distinct branches differ."""
    t_len, v = 6, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((1, t_len, v)), jnp.float32), axis=-1
    )
    lens = jnp.asarray([t_len])
    state = ctc_prefix_init(lp, lens, 0)
    d1, cs = ctc_prefix_score(state, lp, lens, jnp.asarray([[1, 2]]), 0)
    state1 = ctc_prefix_select(cs, jnp.asarray([0]), jnp.asarray([0]))
    d2, _ = ctc_prefix_score(state1, lp, lens, jnp.asarray([[1, 2]]), 0)
    assert not np.allclose(float(d2[0, 0]), float(d2[0, 1]))


def _train_tiny_joint(rng, steps=220):
    from tests.test_train_e2e import make_trainer, synth_batch
    from summarymixing_tpu.parallel.mesh import make_mesh
    trainer = make_trainer(
        num_decoder_layers=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    batch = synth_batch(rng, b=8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    for _ in range(steps):
        state, m = trainer.train_step(state, batch)
    return trainer, state, batch, m


def test_beam_search_decodes_overfit_model(rng):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    trainer, state, batch, metrics = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config

    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode
    )
    ctc_lp = model.apply(
        {"params": state["params"]}, enc_out, method=model.ctc_head
    )

    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def decode_step(tokens, step):
        return model.apply(
            {"params": state["params"]}, tokens, enc_t, len_t, step,
            method=model.decode_position,
        )

    config = S2SBeamConfig(
        beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
        bos_id=cfg.bos_id, eos_id=cfg.eos_id, blank_id=cfg.blank_id,
        max_length=6, min_steps=1,
    )
    toks, lens, scores = s2s_beam_search(
        decode_step, enc_t, len_t, ctc_t, config
    )
    toks, lens = np.asarray(toks), np.asarray(lens)
    refs = np.asarray(batch["tokens"])
    correct = 0
    for i in range(refs.shape[0]):
        hyp = list(toks[i, : lens[i]])
        if hyp == list(refs[i]):
            correct += 1
    # overfit tiny model: beam search should recover most training labels
    assert correct >= refs.shape[0] // 2, (
        correct, toks[:4], lens[:4], refs[:4], float(metrics["loss"])
    )


def test_beam_temperature_matches_logit_scaling(rng):
    """S2SBeamConfig.temperature re-normalises the decoder's LOG-PROBS
    (log_softmax(lp / T)); the reference's S2SBeamSearcher applies
    softmax(logits / T). The two must select identical hypotheses with
    identical scores: the 1/T-scaled log-partition is a per-row constant
    that cancels in re-normalisation (reference test_search
    temperature: 1.15, branchformer yaml:266)."""
    b, beam, v, t_enc, temp = 3, 4, 12, 6, 1.15
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(key, (b * beam, 24, v)) * 3.0
    enc = jnp.zeros((b * beam, t_enc, 4))
    lens = jnp.full((b * beam,), t_enc, jnp.int32)

    def step_lp(tokens, step):
        return jax.nn.log_softmax(logits[:, step], axis=-1)

    def step_scaled(tokens, step):
        return jax.nn.log_softmax(logits[:, step] / temp, axis=-1)

    base = dict(beam_size=beam, ctc_weight=0.0, lm_weight=0.0,
                bos_id=1, eos_id=2, blank_id=0, max_length=8, min_steps=2)
    toks_a, lens_a, sc_a = s2s_beam_search(
        step_lp, enc, lens, None, S2SBeamConfig(temperature=temp, **base))
    toks_b, lens_b, sc_b = s2s_beam_search(
        step_scaled, enc, lens, None, S2SBeamConfig(**base))
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b),
                               rtol=1e-5, atol=1e-5)
    # and T != 1 is not a no-op on the scores
    _, _, sc_c = s2s_beam_search(step_lp, enc, lens, None,
                                 S2SBeamConfig(**base))
    assert not np.allclose(np.asarray(sc_a), np.asarray(sc_c))


def test_beam_search_early_exit_is_exact(rng):
    """Raising max_length must not change the result once every beam has
    emitted eos: the while_loop exits at the all-finished step, so the
    extra cap is never walked (and with the overfit model, hypotheses
    finish after ~4 tokens)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    trainer, state, batch, _ = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config

    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode
    )
    ctc_lp = model.apply(
        {"params": state["params"]}, enc_out, method=model.ctc_head
    )
    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def decode_step(tokens, step):
        return model.apply(
            {"params": state["params"]}, tokens, enc_t, len_t, step,
            method=model.decode_position,
        )

    outs = []
    for lmax in (6, 24):
        config = S2SBeamConfig(
            beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
            bos_id=cfg.bos_id, eos_id=cfg.eos_id, blank_id=cfg.blank_id,
            max_length=lmax, min_steps=1,
        )
        toks, lens, scores = s2s_beam_search(
            decode_step, enc_t, len_t, ctc_t, config
        )
        outs.append((np.asarray(toks), np.asarray(lens),
                     np.asarray(scores)))
    (t0, l0, s0), (t1, l1, s1) = outs
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    for i in range(t0.shape[0]):
        np.testing.assert_array_equal(t0[i, : l0[i]], t1[i, : l1[i]])


def test_transformer_lm_shapes(rng):
    lm = TransformerLM(vocab=20, d_model=32, nhead=2, num_layers=2, d_ffn=64)
    toks = jnp.asarray(rng.integers(0, 20, (2, 7)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    out = lm.apply(params, toks)
    assert out.shape == (2, 7, 20)
    # causality
    toks2 = toks.at[:, 5].set(3)
    out2 = lm.apply(params, toks2)
    np.testing.assert_allclose(np.asarray(out)[:, :5], np.asarray(out2)[:, :5],
                               atol=1e-5, rtol=1e-5)


def test_rnnlm_step_matches_full(rng):
    lm = RNNLM(vocab=12, embedding_dim=8, rnn_layers=2, rnn_neurons=16,
               dnn_neurons=8)
    toks = jnp.asarray(rng.integers(0, 12, (3, 5)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    full = lm.apply(params, toks)
    assert full.shape == (3, 5, 12)

    def run_steps(params, toks):
        mdl = lm.bind(params)
        carry = mdl.initial_state(3)
        outs = []
        for i in range(5):
            carry, lg = mdl.step(carry, toks[:, i])
            outs.append(lg)
        return jnp.stack(outs, axis=1)

    stepped = run_steps(params, toks)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5, rtol=1e-5)


def test_beam_search_with_lm_fusion(rng):
    """LM shallow fusion: beam search must run with an lm_step_fn and the
    LM weight must influence the chosen hypotheses."""
    from summarymixing_tpu.models.lm import TransformerLM

    batch, beam, t, d, vocab = 2, 3, 6, 16, 12
    enc_out = jnp.asarray(rng.standard_normal((batch * beam, t, d)), jnp.float32)
    enc_lens = jnp.full((batch * beam,), t, jnp.int32)

    # a fake acoustic decode_step: logits from a fixed projection of enc mean
    proj = jnp.asarray(rng.standard_normal((d, vocab)) * 0.5, jnp.float32)

    def decode_step(tokens, step):
        ctx = jnp.mean(enc_out, axis=1) @ proj
        return jax.nn.log_softmax(ctx, axis=-1)

    lm = TransformerLM(vocab=vocab, d_model=16, nhead=2, num_layers=1, d_ffn=32)
    toks0 = jnp.zeros((batch * beam, 7), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(0), toks0)

    def lm_step(tokens, step):
        logits = lm.apply(lm_params, tokens)
        return jax.nn.log_softmax(logits[:, step], axis=-1)

    cfg0 = S2SBeamConfig(beam_size=beam, ctc_weight=0.0, lm_weight=0.0,
                         max_length=6, min_steps=1)
    cfg1 = S2SBeamConfig(beam_size=beam, ctc_weight=0.0, lm_weight=5.0,
                         max_length=6, min_steps=1)
    t0, l0, s0 = s2s_beam_search(decode_step, enc_out, enc_lens, None, cfg0,
                                 lm_step_fn=lm_step)
    t1, l1, s1 = s2s_beam_search(decode_step, enc_out, enc_lens, None, cfg1,
                                 lm_step_fn=lm_step)
    assert t0.shape == t1.shape
    assert np.isfinite(np.asarray(s0)).all() and np.isfinite(np.asarray(s1)).all()
    # a heavy LM weight should change at least one decoded sequence
    assert not np.array_equal(np.asarray(t0), np.asarray(t1))


def test_cached_decoder_step_matches_prefix(rng):
    """KV-cached incremental decoding must reproduce the full-prefix
    decoder exactly (position by position)."""
    from summarymixing_tpu.models.transformer import TransformerDecoder
    from summarymixing_tpu.ops.masks import lookahead_mask

    b, u, t, d = 2, 5, 7, 16
    dec = TransformerDecoder(num_layers=2, d_model=d, d_ffn=32, nhead=2,
                             normalize_before=True)
    tgt = jnp.asarray(rng.standard_normal((b, u, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), tgt, mem)
    full = dec.apply(params, tgt, mem, tgt_mask=lookahead_mask(u))

    bound = dec.bind(params)
    cache = bound.init_cache(mem, max_len=u)
    outs = []
    for pos in range(u):
        h, cache = bound.step(tgt[:, pos], pos, cache)
        outs.append(h)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5, rtol=1e-5)


def test_cached_beam_matches_uncached(rng):
    """Beam search with KV cache == beam search recomputing full prefixes."""
    trainer, state, batch, _ = _train_tiny_joint(rng, steps=60)
    model = trainer.model
    cfg = trainer.config
    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode
    )
    ctc_lp = model.apply({"params": state["params"]}, enc_out,
                         method=model.ctc_head)
    beam = 3
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)
    from summarymixing_tpu.ops.masks import length_to_mask
    enc_pad = length_to_mask(len_t, enc_t.shape[1])

    config = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
                           bos_id=cfg.bos_id, eos_id=cfg.eos_id,
                           blank_id=cfg.blank_id, max_length=6, min_steps=1)

    def step_plain(tokens, step):
        return model.apply({"params": state["params"]}, tokens, enc_t, len_t,
                           step, method=model.decode_position)

    t0, l0, s0 = s2s_beam_search(step_plain, enc_t, len_t, ctc_t, config)

    cache = model.apply({"params": state["params"]}, enc_t,
                        config.max_length + 1, method=model.decode_cache_init)

    def step_cached(last_tok, step, cache):
        return model.apply({"params": state["params"]}, last_tok, step, cache,
                           enc_pad, method=model.decode_step_cached)

    t1, l1, s1 = s2s_beam_search(step_cached, enc_t, len_t, ctc_t, config,
                                 cache=cache)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4)

    # nbest surface: rank-0 of the sorted n-best == the 1-best result,
    # and scores are non-increasing across ranks
    tn, ln, sn = s2s_beam_search(step_plain, enc_t, len_t, ctc_t, config,
                                 nbest=beam)
    assert tn.shape == (t0.shape[0], beam, t0.shape[1])
    np.testing.assert_array_equal(np.asarray(tn[:, 0]), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(ln[:, 0]), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(sn[:, 0]), np.asarray(s0),
                               rtol=1e-4)
    sn = np.asarray(sn)
    assert (np.diff(sn, axis=1) <= 1e-6).all(), sn


def test_transformer_lm_cached_step_matches_full(rng):
    """KV-cached LM stepping == full-sequence forward, position by position."""
    lm = TransformerLM(vocab=14, d_model=16, nhead=2, num_layers=2, d_ffn=32)
    toks = jnp.asarray(rng.integers(0, 14, (3, 6)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    full = lm.apply(params, toks)
    bound = lm.bind(params)
    cache = bound.init_cache(3, 6)
    outs = []
    for pos in range(6):
        lg, cache = bound.step(toks[:, pos], pos, cache)
        outs.append(lg)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5, rtol=1e-5)


def test_beam_search_cached_lm_matches_full_prefix(rng):
    """KV-cached LM fusion (lm_cache + step signature) must produce the
    same hypotheses and scores as the full-prefix lm_step_fn."""
    from summarymixing_tpu.models.lm import TransformerLM

    batch, beam, t, d, vocab = 2, 3, 6, 16, 12
    enc_out = jnp.asarray(rng.standard_normal((batch * beam, t, d)),
                          jnp.float32)
    enc_lens = jnp.full((batch * beam,), t, jnp.int32)
    proj = jnp.asarray(rng.standard_normal((d, vocab)) * 0.5, jnp.float32)

    def decode_step(tokens, step):
        ctx = jnp.mean(enc_out, axis=1) @ proj
        return jax.nn.log_softmax(ctx, axis=-1)

    lmax = 6
    lm = TransformerLM(vocab=vocab, d_model=16, nhead=2, num_layers=2,
                       d_ffn=32)
    toks0 = jnp.zeros((batch * beam, lmax + 1), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(0), toks0)

    def lm_step_full(tokens, step):
        logits = lm.apply(lm_params, tokens)
        return jax.nn.log_softmax(logits[:, step] / 1.15, axis=-1)

    def lm_step_cached(last_tok, step, cache):
        logits, cache = lm.apply(lm_params, last_tok, step, cache,
                                 method=lm.step)
        return jax.nn.log_softmax(logits / 1.15, axis=-1), cache

    cfg = S2SBeamConfig(beam_size=beam, ctc_weight=0.0, lm_weight=2.0,
                        max_length=lmax, min_steps=1)
    t_full, l_full, s_full = s2s_beam_search(
        decode_step, enc_out, enc_lens, None, cfg, lm_step_fn=lm_step_full)
    lm_cache = lm.apply(lm_params, batch * beam, lmax + 1,
                        method=lm.init_cache)
    t_cached, l_cached, s_cached = s2s_beam_search(
        decode_step, enc_out, enc_lens, None, cfg,
        lm_step_fn=lm_step_cached, lm_cache=lm_cache)
    np.testing.assert_array_equal(np.asarray(t_full), np.asarray(t_cached))
    np.testing.assert_array_equal(np.asarray(l_full), np.asarray(l_cached))
    np.testing.assert_allclose(np.asarray(s_full), np.asarray(s_cached),
                               rtol=1e-5, atol=1e-5)


def test_lm_fusion_wer_not_worse_on_overfit(rng):
    """VERDICT r1 items 1/10 'done' criterion: with an in-domain LM trained
    on the same transcripts, fused-beam WER must be <= the no-LM beam WER
    on the overfit corpus."""
    import optax
    from summarymixing_tpu.models.lm import TransformerLM
    from summarymixing_tpu.training.metrics import ErrorRateStats

    trainer, state, batch, _ = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config

    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode)
    ctc_lp = model.apply(
        {"params": state["params"]}, enc_out, method=model.ctc_head)

    # tiny LM trained on the same label sequences (bos=1, eos=2)
    vocab = 8
    lm = TransformerLM(vocab=vocab, d_model=16, nhead=2, num_layers=1,
                       d_ffn=32)
    toks = np.asarray(batch["tokens"])
    inp = np.concatenate([np.ones((toks.shape[0], 1), np.int32), toks], 1)
    tgt = np.concatenate([toks, 2 * np.ones((toks.shape[0], 1), np.int32)], 1)
    lm_params = lm.init(jax.random.PRNGKey(0), jnp.asarray(inp))["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(lm_params)

    @jax.jit
    def lm_train(p, opt, inp, tgt):
        def loss(p):
            lg = lm.apply({"params": p}, inp)
            lp = jax.nn.log_softmax(lg, -1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))
        l, g = jax.value_and_grad(loss)(p)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, l

    ji, jt = jnp.asarray(inp), jnp.asarray(tgt)
    for _ in range(120):
        lm_params, opt, _ = lm_train(lm_params, opt, ji, jt)

    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def decode_step(tokens, step):
        return model.apply(
            {"params": state["params"]}, tokens, enc_t, len_t, step,
            method=model.decode_position)

    def lm_step(last_tok, step, cache):
        logits, cache = lm.apply({"params": lm_params}, last_tok, step,
                                 cache, method=lm.step)
        return jax.nn.log_softmax(logits / 1.15, -1), cache

    def wer_of(lm_weight):
        bc = S2SBeamConfig(beam_size=beam, ctc_weight=0.4,
                           lm_weight=lm_weight, bos_id=cfg.bos_id,
                           eos_id=cfg.eos_id, blank_id=cfg.blank_id,
                           max_length=6, min_steps=1)
        lm_cache = (lm.apply({"params": lm_params}, enc_t.shape[0],
                             bc.max_length + 1, method=lm.init_cache)
                    if lm_weight > 0 else None)
        toks_o, lens_o, _ = s2s_beam_search(
            decode_step, enc_t, len_t, ctc_t, bc,
            lm_step_fn=lm_step if lm_weight > 0 else None,
            lm_cache=lm_cache)
        toks_o, lens_o = np.asarray(toks_o), np.asarray(lens_o)
        stats = ErrorRateStats()
        refs = [list(map(str, row)) for row in toks]
        hyps = [[str(x) for x in toks_o[i, : lens_o[i]]]
                for i in range(toks.shape[0])]
        stats.append(refs, hyps)
        return stats.summarize()["WER"]

    w_plain = wer_of(0.0)
    w_fused = wer_of(0.3)
    assert w_fused <= w_plain + 1e-9, (w_plain, w_fused)


def test_summary_decoder_beam_search(rng):
    """The paper's Summary Decoder variant (reference README.md:35)
    decodes through BOTH beam paths: full-prefix decode_position and the
    cached running-mean step (the recipes' default), which must agree."""
    from tests.test_train_e2e import make_trainer, synth_batch
    from summarymixing_tpu.parallel.mesh import make_mesh

    trainer = make_trainer(num_decoder_layers=1,
                           mesh=make_mesh(devices=jax.devices()[:1]),
                           decoder_attention_type="SummaryMixing")
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    for _ in range(40):
        state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))

    model = trainer.model
    cfg = trainer.config
    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode)
    ctc_lp = model.apply({"params": state["params"]}, enc_out,
                         method=model.ctc_head)
    beam = 3
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def step_plain(tokens, step):
        return model.apply({"params": state["params"]}, tokens, enc_t, len_t,
                           step, method=model.decode_position)

    config = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
                           bos_id=cfg.bos_id, eos_id=cfg.eos_id,
                           blank_id=cfg.blank_id, max_length=6, min_steps=1)
    toks, lens, scores = s2s_beam_search(step_plain, enc_t, len_t, ctc_t,
                                         config)
    assert toks.shape[0] == 4 and int(np.max(np.asarray(lens))) <= 6
    assert np.isfinite(np.asarray(scores)).all()

    # cached running-mean path == full-prefix path
    from summarymixing_tpu.ops.masks import length_to_mask

    enc_pad = length_to_mask(len_t, enc_t.shape[1])
    cache = model.apply({"params": state["params"]}, enc_t,
                        config.max_length + 1, method=model.decode_cache_init)

    def step_cached(last_tok, step, cache):
        return model.apply({"params": state["params"]}, last_tok, step,
                           cache, enc_pad, method=model.decode_step_cached)

    t2, l2, s2 = s2s_beam_search(step_cached, enc_t, len_t, ctc_t, config,
                                 cache=cache)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)


def test_beam_never_emits_blank(rng):
    """The reference CTCPrefixScorer sets psi[:, blank] = -inf: a literal
    blank extension scores psi(g+blank) ~= psi(g), the best possible CTC
    delta, so without masking an uncertain attention decoder emits blank
    into the transcript."""
    trainer, state, batch, _ = _train_tiny_joint(rng, steps=5)  # uncertain
    model = trainer.model
    cfg = trainer.config
    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode)
    ctc_lp = model.apply({"params": state["params"]}, enc_out,
                         method=model.ctc_head)
    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def step(tokens, s):
        return model.apply({"params": state["params"]}, tokens, enc_t, len_t,
                           s, method=model.decode_position)

    config = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
                           bos_id=cfg.bos_id, eos_id=cfg.eos_id,
                           blank_id=cfg.blank_id, max_length=8, min_steps=1)
    toks, lens, _ = s2s_beam_search(step, enc_t, len_t, ctc_t, config)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i in range(toks.shape[0]):
        assert cfg.blank_id not in toks[i, : lens[i]], toks[i, : lens[i]]


def test_streaming_greedy_requires_max_tokens():
    """return_carry=True without max_tokens would silently truncate later
    chunks at the first chunk's budget — must raise instead."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_greedy_decode,
    )

    def predictor_init(b):
        return {"h": jnp.zeros((b, 1))}

    def predictor_step(state, tok):
        return state, jnp.zeros((tok.shape[0], 4))

    def joint_step(enc_frame, proj):
        return jnp.zeros((enc_frame.shape[0], 5))

    with pytest.raises(ValueError, match="max_tokens"):
        transducer_greedy_decode(
            jnp.zeros((1, 4, 3)), jnp.asarray([4]), predictor_init,
            predictor_step, joint_step, return_carry=True)


# ---------------------------------------------------------------------------
# Blank-skip compaction of the prefix scorer's time axis
# (ctc_prefix.py::compact_blank_frames)
# ---------------------------------------------------------------------------


_FLOOR = -500.0  # scores below this mean "impossible path"; the full
# scorer saturates them at -1e5, the compacted one at ~-1e3 (_GAP_NEG) —
# numerically different, semantically both -inf (and once a prefix is
# impossible, clamped-psi DELTAS are meaningless on both sides)


def _chain_compare(x1, lens1, x2, lens2, steps=3, k=4, seed=7, atol=0.0):
    """Roll the full and compacted scorers side by side over the same
    random non-eos candidates, argmax-selecting from the FULL scores, and
    assert per-step match on rows whose prefix is still possible."""
    n = x1.shape[0]
    st1 = ctc_prefix_init(x1, lens1)
    st2 = ctc_prefix_init(x2, lens2)
    r = np.random.default_rng(seed)
    alive = np.ones((n,), bool)
    compared = 0
    for _ in range(steps):
        cand = jnp.asarray(r.integers(3, x1.shape[2], size=(n, k)))
        a, cs1 = ctc_prefix_score(st1, x1, lens1, cand, 0, eos_id=2)
        b, cs2 = ctc_prefix_score(st2, x2, lens2, cand, 0, eos_id=2)
        a, b = np.asarray(a), np.asarray(b)
        possible = (a > _FLOOR) & alive[:, None]
        if atol:
            np.testing.assert_allclose(a[possible], b[possible], atol=atol)
        else:
            np.testing.assert_array_equal(a[possible], b[possible])
        assert (b[alive[:, None] & ~(a > _FLOOR)] < _FLOOR).all()
        compared += int(possible.sum())
        pick = jnp.argmax(jnp.asarray(a), axis=1)
        alive &= a[np.arange(n), np.asarray(pick)] > _FLOOR
        st1 = ctc_prefix_select(cs1, jnp.arange(n), pick)
        st2 = ctc_prefix_select(cs2, jnp.arange(n), pick)
    assert compared > 0  # the comparison must not be vacuous


def test_compact_blank_frames_exact_at_threshold_one(rng):
    """threshold=1.0 keeps every valid frame -> the compacted tensor is
    the original plus a zero-blank trailing frame, and the scorer chain
    must match bit-for-bit."""
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    x = jnp.asarray(
        np.log(rng.dirichlet(np.ones(6), size=(3, 12))), jnp.float32)
    lens = jnp.asarray([12, 9, 1])
    x2, lens2, kept = compact_blank_frames(x, lens, 0, 0, 1.0)
    np.testing.assert_array_equal(np.asarray(kept), [12, 9, 1])
    np.testing.assert_array_equal(np.asarray(lens2), [13, 10, 2])
    _chain_compare(x, lens, x2, lens2)


def test_compact_blank_frames_peaky(rng):
    """On a peaky distribution (blank-certain frames dominate) the
    compacted axis shrinks and scores stay close to the full scorer."""
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    t_len, v = 48, 8
    probs = np.full((2, t_len, v), 1e-9)
    probs[:, :, 0] = 1.0
    for t in (3, 11, 12, 30, 41):
        probs[:, t, :] = rng.dirichlet(np.ones(v) * 0.3, size=2)
    probs /= probs.sum(-1, keepdims=True)
    x = jnp.asarray(np.log(probs), jnp.float32)
    lens = jnp.asarray([t_len, 44])
    x2, lens2, kept = compact_blank_frames(x, lens, 0, 0, 0.95)
    assert int(np.asarray(kept).max()) == 5
    assert int(np.asarray(lens2).max()) <= 11  # 5 kept + <=5 gaps + tail
    _chain_compare(x, lens, x2, lens2, seed=9, atol=1e-3)


def test_compact_blank_frames_all_blank_row():
    """A fully blank-certain utterance: no kept frames; eos scores the
    total blank mass, any real token is (effectively) impossible."""
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    probs = np.full((1, 10, 4), 1e-9)
    probs[:, :, 0] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    x = jnp.asarray(np.log(probs), jnp.float32)
    lens = jnp.asarray([10])
    x2, lens2, kept = compact_blank_frames(x, lens, 0, 0, 0.95)
    assert int(kept[0]) == 0 and int(lens2[0]) == 1
    st = ctc_prefix_init(x2, lens2)
    sc, _ = ctc_prefix_score(st, x2, lens2, jnp.asarray([[1, 2]]), 0,
                             eos_id=2)
    # eos == full-utterance blank sum; non-eos suppressed
    full_blank = float(np.log(probs[0, :, 0]).sum())
    np.testing.assert_allclose(float(sc[0, 1]), full_blank, atol=1e-5)
    assert float(sc[0, 0]) < -500.0


def test_compact_blank_frames_cap_overflow(rng):
    """More informative frames than the cap: keeps the most non-blank
    ones, everything stays finite and runnable."""
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    x = jnp.asarray(
        np.log(rng.dirichlet(np.ones(6), size=(2, 20))), jnp.float32)
    lens = jnp.asarray([20, 15])
    x2, lens2, kept = compact_blank_frames(x, lens, 0, 4, 0.999999)
    # 2*4+1 = 9 slots, padded to the next power of two for the scans
    assert x2.shape[1] == 16 and int(np.asarray(kept).max()) == 4
    st = ctc_prefix_init(x2, lens2)
    for seed in (5, 6):
        cand = jnp.asarray(
            np.random.default_rng(seed).integers(3, 6, size=(2, 3)))
        sc, cs = ctc_prefix_score(st, x2, lens2, cand, 0, eos_id=2)
        assert np.isfinite(np.asarray(sc)).all()
        st = ctc_prefix_select(cs, jnp.arange(2), jnp.argmax(sc, axis=1))


def test_beam_search_with_compaction_matches_full(rng):
    """End to end: beam search fed compacted CTC log-probs (peaky case)
    decodes the same tokens as with the full tensor."""
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    batch, beam, t_len, v, d = 2, 4, 32, 10, 16
    # peaky ctc head: blank almost everywhere, spikes at a few frames
    probs = np.full((batch, t_len, v), 1e-8)
    probs[:, :, 0] = 1.0
    spike_toks = [3, 5, 8]
    for bi in range(batch):
        for j, t in enumerate((4, 13, 27)):
            probs[bi, t, :] = 1e-4
            probs[bi, t, spike_toks[j]] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    ctc_lp = jnp.asarray(np.log(probs), jnp.float32)
    enc_lens = jnp.asarray([t_len, 28])

    # attention decoder that softly prefers the true sequence then eos
    # (the realistic regime: decoder and CTC agree on the possible paths)
    att_tables = np.full((5, v), -8.0)
    for j, tok in enumerate(spike_toks):
        att_tables[j, tok] = 0.0
    att_tables[3, 2] = 0.0  # eos
    att_tables[4, 2] = 0.0

    def step(tokens, step_i):
        tab = jax.nn.log_softmax(
            jnp.asarray(att_tables, jnp.float32), axis=-1)
        row = tab[jnp.minimum(step_i, 4)]
        return jnp.broadcast_to(row, (batch * beam, v))

    cfg = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, max_length=8,
                        blank_id=0, bos_id=1, eos_id=2)
    enc_dummy = jnp.zeros((batch * beam, t_len, 4), jnp.float32)
    t0, l0, s0 = s2s_beam_search(
        step, enc_dummy, tile_for_beam(enc_lens, beam),
        tile_for_beam(ctc_lp, beam), cfg)

    ctc2, lens2, _ = compact_blank_frames(ctc_lp, enc_lens, 0, 6, 0.95)
    assert ctc2.shape[1] < t_len
    t1, l1, s1 = s2s_beam_search(
        step, enc_dummy, tile_for_beam(lens2, beam),
        tile_for_beam(ctc2, beam), cfg)
    np.testing.assert_array_equal(np.asarray(l0), [3, 3])
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for i in range(batch):
        np.testing.assert_array_equal(
            np.asarray(t0)[i, : int(l0[i])], np.asarray(t1)[i, : int(l1[i])])
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-3)


def test_deferred_ctc_states_match_materialized(rng):
    """ctc_defer_states=True (score-only + rebuild-selected) must equal
    the materialise-then-gather oracle path exactly: same tokens,
    lengths, and scores, across ragged lengths and multiple steps."""
    import dataclasses

    from summarymixing_tpu.decoding.ctc_prefix import (
        ctc_prefix_advance,
        ctc_prefix_init,
        ctc_prefix_score,
        ctc_prefix_score_only,
        ctc_prefix_select,
    )

    # unit level first: chained score/select vs score_only/advance
    n, t, v, k = 3, 17, 9, 4
    x = jnp.asarray(rng.standard_normal((n, t, v)), jnp.float32)
    x = jax.nn.log_softmax(x, axis=-1)
    lens = jnp.asarray([17, 11, 5], jnp.int32)
    state_a = ctc_prefix_init(x, lens)
    state_b = ctc_prefix_init(x, lens)
    for step in range(4):
        cand = jnp.asarray(
            rng.integers(1, v, (n, k)), jnp.int32)
        sc_a, cand_states = ctc_prefix_score(state_a, x, lens, cand,
                                             blank_id=0, eos_id=None)
        sc_b, psi_b = ctc_prefix_score_only(state_b, x, lens, cand,
                                            blank_id=0, eos_id=None)
        np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b),
                                   rtol=1e-5, atol=1e-5)
        pick = jnp.asarray(rng.integers(0, k, (n,)), jnp.int32)
        rows = jnp.arange(n)
        state_a = ctc_prefix_select(cand_states, rows, pick)
        state_b = ctc_prefix_advance(state_b, x, lens, cand[rows, pick],
                                     psi_b[rows, pick], blank_id=0)
        for fa, fb in zip(state_a, state_b):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-5, atol=1e-4)

    # end-to-end: full beam search both ways on an overfit model
    trainer, state, batch, _ = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config
    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode)
    ctc_lp = model.apply({"params": state["params"]}, enc_out,
                         method=model.ctc_head)
    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    ctc_t = tile_for_beam(ctc_lp, beam)

    def decode_step(tokens, step):
        return model.apply({"params": state["params"]}, tokens, enc_t,
                           len_t, step, method=model.decode_position)

    base = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
                         bos_id=cfg.bos_id, eos_id=cfg.eos_id,
                         blank_id=cfg.blank_id, max_length=6, min_steps=1)
    out_def = s2s_beam_search(
        decode_step, enc_t, len_t, ctc_t,
        dataclasses.replace(base, ctc_defer_states=True))
    out_mat = s2s_beam_search(
        decode_step, enc_t, len_t, ctc_t,
        dataclasses.replace(base, ctc_defer_states=False))
    np.testing.assert_array_equal(np.asarray(out_def[0]),
                                  np.asarray(out_mat[0]))
    np.testing.assert_array_equal(np.asarray(out_def[1]),
                                  np.asarray(out_mat[1]))
    np.testing.assert_allclose(np.asarray(out_def[2]),
                               np.asarray(out_mat[2]), rtol=1e-5)


@pytest.mark.parametrize("mode", ["SummaryMixing", "SummaryMixing-expdecay",
                                  "SummaryMixing-fast"])
def test_summary_decoder_cached_step_matches_prefix(mode, rng):
    """The Summary Decoder's running-mean cached step must reproduce the
    full-prefix decoder exactly, position by position — the causal
    summary is an O(1) recurrence (geometric for expdecay), so caching
    is cheaper than MHA's KV buffer, not merely possible."""
    from summarymixing_tpu.models.transformer import TransformerDecoder
    from summarymixing_tpu.ops.masks import lookahead_mask

    b, u, t, d = 2, 5, 7, 16
    dec = TransformerDecoder(num_layers=2, d_model=d, d_ffn=32, nhead=2,
                             normalize_before=True,
                             attention_type="SummaryMixing", mode=mode,
                             local_proj_hid_dim=(16,), local_proj_out_dim=16,
                             summary_hid_dim=(16,))
    tgt = jnp.asarray(rng.standard_normal((b, u, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), tgt, mem)
    full = dec.apply(params, tgt, mem, tgt_mask=lookahead_mask(u))

    bound = dec.bind(params)
    cache = bound.init_cache(mem, max_len=u)
    outs = []
    for pos in range(u):
        h, cache = bound.step(tgt[:, pos], pos, cache)
        outs.append(h)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5, rtol=1e-5)


def test_beam_untiled_ctc_matches_tiled(rng):
    """The memory-lean CTC layout — lattice left at [B, T, V], scorer
    rows mapped by n // beam (the fix that lets the reference beam-66
    test config fit v5e HBM) — must produce bit-identical beams to the
    legacy pre-tiled [N, T, V] path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    trainer, state, batch, _ = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config

    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(
        {"params": state["params"]}, feats, feat_lens, method=model.encode
    )
    ctc_lp = model.apply(
        {"params": state["params"]}, enc_out, method=model.ctc_head
    )

    beam = 4
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)

    def decode_step(tokens, step):
        return model.apply(
            {"params": state["params"]}, tokens, enc_t, len_t, step,
            method=model.decode_position,
        )

    for defer in (True, False):
        config = S2SBeamConfig(
            beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
            bos_id=cfg.bos_id, eos_id=cfg.eos_id, blank_id=cfg.blank_id,
            max_length=6, min_steps=1, ctc_defer_states=defer,
        )
        t1, l1, s1 = s2s_beam_search(decode_step, enc_t, len_t,
                                     ctc_lp, config)           # untiled
        t2, l2, s2 = s2s_beam_search(decode_step, enc_t, len_t,
                                     tile_for_beam(ctc_lp, beam), config)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6, atol=1e-6)


def test_beam_untiled_cross_kv_matches_tiled(rng):
    """decode_cache_init(enc UNTILED, rows=N) — per-utterance cross-attn
    K/V shared across an utterance's beams via the n // beam row map
    (ops/attention.py::_step_grouped), per-hypothesis self state at N
    rows, and the beam loop gathering only N-row leaves — must decode
    identically to the legacy fully-tiled cache. This is what removes
    the O(beam) enc/KV copies that OOM'd v5e HBM at the reference
    test config (beam 66)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    trainer, state, batch, _ = _train_tiny_joint(rng)
    model = trainer.model
    cfg = trainer.config
    params = {"params": state["params"]}

    feats = trainer.fbank(batch["wav"])
    feat_lens = trainer.fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    enc_out, enc_lens = model.apply(params, feats, feat_lens,
                                    method=model.encode)
    ctc_lp = model.apply(params, enc_out, method=model.ctc_head)

    beam = 4
    n = enc_out.shape[0] * beam
    from summarymixing_tpu.ops.masks import length_to_mask

    config = S2SBeamConfig(beam_size=beam, ctc_weight=0.4, lm_weight=0.0,
                           bos_id=cfg.bos_id, eos_id=cfg.eos_id,
                           blank_id=cfg.blank_id, max_length=6, min_steps=1)

    # legacy: everything beam-tiled
    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)
    pad_t = length_to_mask(len_t, enc_t.shape[1])
    cache_t = model.apply(params, enc_t, config.max_length + 1,
                          method=model.decode_cache_init)

    def step_tiled(last_tok, step, cache):
        return model.apply(params, last_tok, step, cache, pad_t,
                           method=model.decode_step_cached)

    t0_, l0_, s0_ = s2s_beam_search(step_tiled, enc_t, len_t, ctc_lp,
                                    config, cache=cache_t)

    # memory-lean: enc state per-utterance, self state per-hypothesis
    pad_b = length_to_mask(enc_lens, enc_out.shape[1])  # [B, T]
    cache_u = model.apply(params, enc_out, config.max_length + 1, n,
                          method=model.decode_cache_init)
    # the cross-attn K/V really is untiled (B rows, not N)
    assert jax.tree.leaves(cache_u)[0].shape[0] in (enc_out.shape[0], n)
    assert any(leaf.shape[0] == enc_out.shape[0]
               for leaf in jax.tree.leaves(cache_u))

    def step_untiled(last_tok, step, cache):
        return model.apply(params, last_tok, step, cache, pad_b,
                           method=model.decode_step_cached)

    t1_, l1_, s1_ = s2s_beam_search(step_untiled, enc_out, len_t, ctc_lp,
                                    config, cache=cache_u)
    np.testing.assert_array_equal(np.asarray(t0_), np.asarray(t1_))
    np.testing.assert_array_equal(np.asarray(l0_), np.asarray(l1_))
    np.testing.assert_allclose(np.asarray(s0_), np.asarray(s1_),
                               rtol=1e-5, atol=1e-5)
