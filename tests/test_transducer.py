"""Transducer model + search + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.decoding.transducer_search import (
    transducer_beam_search,
    transducer_greedy_decode,
)
from summarymixing_tpu.models.transducer import (
    TransducerModel,
    one_hot_no_blank,
)

VOCAB = 11


def test_one_hot_no_blank():
    toks = jnp.asarray([[0, 3, 10]])
    oh = one_hot_no_blank(toks, VOCAB, blank_id=0)
    assert oh.shape == (1, 3, 10)
    assert float(oh[0, 0].sum()) == 0.0  # blank -> all zeros
    assert float(oh[0, 1, 2]) == 1.0     # token 3 -> index 2 after removal


def make_model():
    return TransducerModel(vocab=VOCAB, dec_dim=12, joint_dim=20)


def test_transducer_model_shapes(rng):
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    toks_bos = jnp.asarray(rng.integers(0, VOCAB, (2, 4)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks_bos, method=m.init_all)
    logits = m.apply(params, enc, toks_bos)
    assert logits.shape == (2, 7, 4, VOCAB)
    ctc = m.apply(params, enc, method=m.ctc_head)
    assert ctc.shape == (2, 7, VOCAB)


def test_predictor_step_matches_full(rng):
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (2, 5)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks, method=m.init_all)
    full = m.apply(params, toks, method=lambda mdl, t: mdl.predictor(t))
    bound = m.bind(params)
    carry = bound.predictor_init(2)
    outs = []
    for i in range(5):
        carry, proj = bound.predictor_step(carry, toks[:, i])
        outs.append(proj)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5, rtol=1e-5)


def _greedy(bound, enc_proj, enc_lens, **kw):
    return transducer_greedy_decode(
        enc_proj, enc_lens,
        bound.predictor_init, bound.predictor_step, bound.joint_step, **kw,
    )


def test_greedy_decode_runs_and_respects_length(rng):
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((3, 9, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (3, 4)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.asarray([9, 5, 1])
    tokens, out_lens = jax.jit(
        lambda ep, el: _greedy(bound, ep, el, max_symbols_per_frame=2)
    )(enc_proj, lens)
    tokens, out_lens = np.asarray(tokens), np.asarray(out_lens)
    assert (out_lens <= 2 * np.asarray(lens)).all()
    for i in range(3):
        assert (tokens[i, out_lens[i]:] == 0).all()


def test_greedy_matches_stepwise_reference(rng):
    """Batched scan greedy == a straightforward per-utterance python greedy."""
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (2, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(7), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.asarray([6, 4])
    tokens, out_lens = _greedy(bound, enc_proj, lens, max_symbols_per_frame=3,
                               max_tokens=40)

    for b in range(2):
        state = bound.predictor_init(1)
        state, proj = bound.predictor_step(state, jnp.asarray([0]))
        hyp = []
        for t in range(int(lens[b])):
            for _ in range(3):
                lg = bound.joint_step(enc_proj[b : b + 1, t], proj)
                k = int(jnp.argmax(lg, -1)[0])
                if k == 0:
                    break
                hyp.append(k)
                state, proj = bound.predictor_step(state, jnp.asarray([k]))
        got = list(np.asarray(tokens)[b, : int(out_lens[b])])
        assert got == hyp, (b, got, hyp)


def test_beam_search_beats_or_matches_greedy_score(rng):
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (1, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(3), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = np.asarray(bound.encode_proj(enc))[0]
    nbest = transducer_beam_search(
        enc_proj, 5,
        bound.predictor_init, bound.predictor_step, bound.joint_step,
        beam_size=4, nbest=2,
    )
    assert len(nbest) == 2
    assert nbest[0][1] >= nbest[1][1]
    assert all(tok != 0 for tok in nbest[0][0])


def test_transducer_trainer_overfits(rng):
    from summarymixing_tpu.frontend.features import Fbank
    from summarymixing_tpu.models.asr import TransformerASR
    from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
    from summarymixing_tpu.parallel.mesh import make_mesh
    from summarymixing_tpu.training.optim import make_adamw
    from summarymixing_tpu.training.transducer_trainer import (
        TransducerTrainer,
        TransducerTrainerConfig,
    )
    from tests.test_train_e2e import synth_batch

    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=16,
        summary_hid_dim=(16,), dropout_rate=0.0,
    )
    enc_model = SpeechRecognizer(
        asr=asr, vocab_size=VOCAB, frontend_channels=(4, 4),
        frontend_dropout=0.0,
    )
    td_model = TransducerModel(
        vocab=VOCAB, dec_dim=12, joint_dim=20,
        emb_dropout=0.0, dec_dropout=0.0,
    )
    trainer = TransducerTrainer(
        enc_model, td_model, make_adamw(3e-3),
        config=TransducerTrainerConfig(ctc_weight=0.3),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch = synth_batch(rng, b=4, n=3200)
    batch["tokens"] = jnp.asarray(
        np.random.default_rng(1).integers(1, VOCAB, (4, 3)).astype(np.int32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m0 = trainer.train_step(state, batch)
    for _ in range(40):
        state, metrics = trainer.train_step(state, batch)
    assert float(metrics["loss"]) < float(m0["loss"])
    assert np.isfinite(float(metrics["transducer"]))


def test_ctc_aux_epoch_gate(rng):
    """After number_of_ctc_epochs the CTC aux is gated off entirely
    (lax.cond): reported ctc loss is exactly 0, the total equals the
    transducer term (+ any CE), and the step is still applied."""
    from summarymixing_tpu.models.asr import TransformerASR
    from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
    from summarymixing_tpu.parallel.mesh import make_mesh
    from summarymixing_tpu.training.optim import make_adamw
    from summarymixing_tpu.training.transducer_trainer import (
        TransducerTrainer,
        TransducerTrainerConfig,
    )
    from tests.test_train_e2e import synth_batch

    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=16,
        summary_hid_dim=(16,), dropout_rate=0.0,
    )
    enc_model = SpeechRecognizer(
        asr=asr, vocab_size=VOCAB, frontend_channels=(4, 4),
        frontend_dropout=0.0,
    )
    td_model = TransducerModel(
        vocab=VOCAB, dec_dim=12, joint_dim=20,
        emb_dropout=0.0, dec_dropout=0.0,
    )
    trainer = TransducerTrainer(
        enc_model, td_model, make_adamw(3e-3),
        config=TransducerTrainerConfig(
            ctc_weight=0.3, number_of_ctc_epochs=1),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch = synth_batch(rng, b=2, n=3200)
    batch["tokens"] = jnp.asarray(
        np.random.default_rng(1).integers(1, VOCAB, (2, 3)).astype(np.int32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    state, m_on = trainer.train_step(state, batch)
    assert float(m_on["ctc"]) > 0.0
    assert float(m_on["nonfinite_skipped"]) == 0

    state["epoch"] = jnp.asarray(2, jnp.int32)
    prev_step = int(state["step"])
    state, m_off = trainer.train_step(state, batch)
    assert float(m_off["ctc"]) == 0.0
    np.testing.assert_allclose(
        float(m_off["loss"]), float(m_off["transducer"]), rtol=1e-6)
    assert float(m_off["nonfinite_skipped"]) == 0
    assert np.isfinite(float(m_off["grad_norm"]))
    assert int(state["step"]) == prev_step + 1


def test_ce_aux_loss(rng):
    from summarymixing_tpu.losses import nll_loss
    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    toks_bos = jnp.asarray(rng.integers(0, VOCAB, (2, 4)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks_bos, method=m.init_all)
    ce_lp = m.apply(params, toks_bos, method=m.ce_head)
    assert ce_lp.shape == (2, 4, VOCAB)
    l = nll_loss(ce_lp[:, :-1], toks_bos[:, 1:], jnp.asarray([3, 3]))
    assert np.isfinite(float(l))


def test_batched_beam_matches_host_reference(rng):
    """On-device batched beam search == the host per-utterance algorithm
    (VERDICT r1 item 6 'done' criterion) with max_expand covering the whole
    vocab, across lengths and rows."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search_batched,
    )

    m = make_model()
    enc = jnp.asarray(rng.standard_normal((3, 7, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (3, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(5), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.asarray([7, 5, 2])

    b_toks, b_lens, b_scores = jax.jit(
        lambda ep, el: transducer_beam_search_batched(
            ep, el, bound.predictor_init, bound.predictor_step,
            bound.joint_step, beam_size=4, max_expand=VOCAB - 1,
        )
    )(enc_proj, lens)
    b_toks, b_lens = np.asarray(b_toks), np.asarray(b_lens)

    enc_np = np.asarray(enc_proj)
    for i in range(3):
        nbest = transducer_beam_search(
            enc_np[i], int(lens[i]),
            bound.predictor_init, bound.predictor_step, bound.joint_step,
            beam_size=4, nbest=1,
        )
        host_toks, host_score = nbest[0]
        got = list(b_toks[i, : b_lens[i]])
        assert got == list(host_toks), (i, got, host_toks)
        np.testing.assert_allclose(float(b_scores[i]), host_score,
                                   rtol=1e-4, atol=1e-4)


def test_batched_beam_with_rnnlm_matches_host(rng):
    """RNNLM shallow fusion parity between the batched and host searches."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search_batched,
    )
    from summarymixing_tpu.models.lm import RNNLM

    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (2, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(9), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.asarray([5, 4])

    lm = RNNLM(vocab=VOCAB, embedding_dim=6, rnn_layers=1, rnn_neurons=10,
               dnn_neurons=8)
    lm_params = lm.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 3), jnp.int32))
    lm_bound = lm.bind(lm_params)

    b_toks, b_lens, b_scores = transducer_beam_search_batched(
        enc_proj, lens, bound.predictor_init, bound.predictor_step,
        bound.joint_step, beam_size=3, max_expand=VOCAB - 1,
        lm_step=lm_bound.step, lm_init=lm_bound.initial_state,
        lm_weight=0.5,
    )
    b_toks, b_lens = np.asarray(b_toks), np.asarray(b_lens)

    enc_np = np.asarray(enc_proj)
    for i in range(2):
        nbest = transducer_beam_search(
            enc_np[i], int(lens[i]),
            bound.predictor_init, bound.predictor_step, bound.joint_step,
            beam_size=3, nbest=1,
            lm_step=lm_bound.step, lm_init=lm_bound.initial_state,
            lm_weight=0.5,
        )
        host_toks, host_score = nbest[0]
        got = list(b_toks[i, : b_lens[i]])
        assert got == list(host_toks), (i, got, host_toks)
        np.testing.assert_allclose(float(b_scores[i]), host_score,
                                   rtol=1e-4, atol=1e-4)


def test_batched_beam_nbest_matches_host(rng):
    """nbest > 1 returns score-sorted hypotheses whose rank-0 equals the
    1-best result and which match the host search's nbest list."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search,
        transducer_beam_search_batched,
    )

    m = make_model()
    enc = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (2, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(9), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.asarray([5, 4])
    kw = dict(beam_size=3, max_expand=VOCAB - 1)

    t1, l1, s1 = transducer_beam_search_batched(
        enc_proj, lens, bound.predictor_init, bound.predictor_step,
        bound.joint_step, **kw)
    tn, ln, sn = transducer_beam_search_batched(
        enc_proj, lens, bound.predictor_init, bound.predictor_step,
        bound.joint_step, nbest=3, **kw)
    tn, ln, sn = np.asarray(tn), np.asarray(ln), np.asarray(sn)
    assert tn.shape == (2, 3, t1.shape[1])
    np.testing.assert_array_equal(tn[:, 0], np.asarray(t1))
    np.testing.assert_array_equal(ln[:, 0], np.asarray(l1))
    np.testing.assert_allclose(sn[:, 0], np.asarray(s1), rtol=1e-5)
    assert (np.diff(sn, axis=1) <= 1e-6).all(), sn

    enc_np = np.asarray(enc_proj)
    for i in range(2):
        host = transducer_beam_search(
            enc_np[i], int(lens[i]), bound.predictor_init,
            bound.predictor_step, bound.joint_step, beam_size=3, nbest=3)
        for r, (h_toks, h_score) in enumerate(host):
            assert list(tn[i, r, : ln[i, r]]) == list(h_toks), (i, r)
            np.testing.assert_allclose(float(sn[i, r]), h_score,
                                       rtol=1e-4, atol=1e-4)


def test_batched_beam_len_never_exceeds_token_buffer():
    """A model that keeps emitting non-blanks must not grow `len` past the
    token buffer: once a hypothesis fills max_tokens slots it can only take
    the blank path (regression: len used to increment unbounded while the
    write position clamped to the last slot)."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search_batched,
    )

    v = 5

    def predictor_init(b):
        return {"h": jnp.zeros((b, 1))}

    def predictor_step(state, tok):
        return state, jnp.zeros((tok.shape[0], 4))

    def joint_step(enc_frame, proj):
        # blank (id 0) strongly disfavored -> expansions every round
        logits = jnp.full((enc_frame.shape[0], v), 0.0).at[:, 0].add(-5.0)
        return logits + jnp.arange(v, dtype=jnp.float32)[None, :] * 0.01

    # max_expand=1 makes each pop chain one level deeper, so with
    # beam_size pops in the single frame hypotheses reach depth
    # beam_size-1 — past umax=2, and length normalisation then selects the
    # deepest. The unfixed code returned len 5 with a 2-wide buffer here.
    umax = 2
    enc_proj = jnp.zeros((2, 1, 3))
    lens = jnp.asarray([1, 1])
    toks, out_lens, _scores = transducer_beam_search_batched(
        enc_proj, lens, predictor_init, predictor_step, joint_step,
        beam_size=6, max_expand=1, max_tokens=umax,
    )
    assert toks.shape[-1] == umax
    assert int(np.max(np.asarray(out_lens))) <= umax


def test_concat_joint_variant(rng):
    """joint="concat" (reference transducer yaml:322-324 option) is
    selectable end-to-end and produces valid logits."""
    m = TransducerModel(vocab=VOCAB, dec_dim=12, joint_dim=20,
                        joint_type="concat")
    enc = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, VOCAB, (2, 3)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks, method=m.init_all)
    logits = m.apply(params, enc, toks)
    assert logits.shape == (2, 5, 3, VOCAB)
    assert np.isfinite(np.asarray(logits)).all()


def test_trainer_joint_chunk_matches_dense(rng):
    """joint_chunk > 0 (chunked joint, losses/transducer.py::
    transducer_loss_chunked) must reproduce the dense trainer's loss and
    one AdamW step exactly (dropout 0 so the rng-plumbing difference is
    inert)."""
    from summarymixing_tpu.frontend.features import Fbank
    from summarymixing_tpu.models.asr import TransformerASR
    from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
    from summarymixing_tpu.parallel.mesh import make_mesh
    from summarymixing_tpu.training.optim import make_adamw
    from summarymixing_tpu.training.transducer_trainer import (
        TransducerTrainer,
        TransducerTrainerConfig,
    )
    from tests.test_train_e2e import synth_batch

    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=16,
        summary_hid_dim=(16,), dropout_rate=0.0,
    )
    enc_model = SpeechRecognizer(
        asr=asr, vocab_size=VOCAB, frontend_channels=(4, 4),
        frontend_dropout=0.0,
    )
    td_model = make_model()
    mesh = make_mesh(devices=jax.devices()[:1])
    batch = synth_batch(rng, b=2, n=3200)
    batch["tokens"] = jnp.asarray(
        np.random.default_rng(3).integers(1, VOCAB, (2, 3)).astype(np.int32))
    cfgs = dict(ctc_weight=0.3, augment=None, dct=None)
    metrics = {}
    states = {}
    for name, jc in (("dense", 0), ("chunked", 3)):
        trainer = TransducerTrainer(
            enc_model, td_model, make_adamw(1e-3), Fbank(),
            TransducerTrainerConfig(joint_chunk=jc, **cfgs), mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        loss, _ = trainer.eval_step(state, batch)
        new_state, m = trainer.train_step(state, batch)
        metrics[name] = (float(loss["loss"]), float(m["loss"]))
        states[name] = new_state["params"]
    np.testing.assert_allclose(metrics["dense"], metrics["chunked"],
                               rtol=2e-5, atol=2e-5)
    errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        states["dense"], states["chunked"])
    assert max(jax.tree.leaves(errs)) < 5e-5, max(jax.tree.leaves(errs))
