"""Streaming tests: chunked streaming_step must reproduce the full forward
pass run with the equivalent dynamic-chunk-training masks (the property that
makes DCT-trained models stream losslessly; reference Conformer.py:539-638,
TransformerASR.py:562-679)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.models.asr import DynChunkTrainConfig, TransformerASR
from summarymixing_tpu.models.conformer import ConformerEncoder
from summarymixing_tpu.ops.masks import chunked_context_mask

D = 32


def make_encoder():
    return ConformerEncoder(
        num_layers=2, d_model=D, d_ffn=64, nhead=2, kernel_size=5,
        attention_type="SummaryMixing", mode="SummaryMixing-fast",
        local_proj_hid_dim=(16,), local_proj_out_dim=D, summary_hid_dim=(24,),
    )


def test_conformer_streaming_matches_full_dct_forward(rng):
    b, chunk, n_chunks, left_chunks = 2, 4, 5, 2
    t = chunk * n_chunks
    x = jnp.asarray(rng.standard_normal((b, t, D)), jnp.float32)
    enc = make_encoder()
    mask = chunked_context_mask(t, chunk, left_chunks)
    params = enc.init(jax.random.PRNGKey(0), x, src_mask=mask,
                      chunk_size=jnp.asarray(chunk))
    full = enc.apply(params, x, src_mask=mask, chunk_size=jnp.asarray(chunk))

    state = enc.apply(
        params, b, left_chunks * chunk, method=enc.init_streaming_state
    )
    outs = []
    for c in range(n_chunks):
        xc = x[:, c * chunk : (c + 1) * chunk]
        out, state = enc.apply(
            params, xc, state, method=enc.streaming_step
        )
        outs.append(out)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(streamed), atol=2e-4, rtol=2e-4
    )


def test_asr_streaming_matches_full_encode(rng):
    b, chunk, n_chunks, left_chunks = 1, 4, 4, 1
    t = chunk * n_chunks
    feat = 24
    src = jnp.asarray(rng.standard_normal((b, t, feat)), jnp.float32)
    asr = TransformerASR(
        tgt_vocab=10, input_size=feat, d_model=D, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=64,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=D,
        summary_hid_dim=(24,), dropout_rate=0.0,
    )
    dct = DynChunkTrainConfig(chunk_size=chunk, left_context_size=left_chunks)
    params = asr.init(jax.random.PRNGKey(0), src)
    full = asr.apply(params, src, dynchunktrain=dct, method=asr.encode)

    state = asr.apply(params, b, dct, method=asr.init_streaming_state)
    outs = []
    for c in range(n_chunks):
        chunk_x = src[:, c * chunk : (c + 1) * chunk]
        out, state = asr.apply(
            params, chunk_x, state, method=asr.encode_streaming
        )
        outs.append(out)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(streamed), atol=2e-4, rtol=2e-4
    )


def test_streaming_state_is_jittable(rng):
    """The whole chunk step (incl. state) must go through jit — states are
    pytrees (flax.struct), no Python mutation."""
    enc = make_encoder()
    x = jnp.asarray(rng.standard_normal((1, 4, D)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    state = enc.apply(params, 1, 8, method=enc.init_streaming_state)

    @jax.jit
    def step(params, x, state):
        return enc.apply(params, x, state, method=enc.streaming_step)

    out1, state = step(params, x, state)
    out2, state = step(params, x, state)
    assert out1.shape == out2.shape == (1, 4, D)
    assert state.layers[0].frames_seen.shape == (1,)
    assert int(state.layers[0].frames_seen[0]) == 8


def test_streaming_transducer_pipeline(rng):
    """Full streaming ASR: chunked encoder (streaming_step) + incremental
    transducer greedy with carried predictor state must equal the
    full-utterance decode over the DCT-masked forward (reference §3.4)."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_greedy_decode,
    )
    from summarymixing_tpu.models.transducer import TransducerModel

    b, chunk, n_chunks, left_chunks, vocab = 2, 4, 4, 2, 9
    t = chunk * n_chunks
    x = jnp.asarray(rng.standard_normal((b, t, D)), jnp.float32)
    enc = make_encoder()
    mask = chunked_context_mask(t, chunk, left_chunks)
    eparams = enc.init(jax.random.PRNGKey(0), x, src_mask=mask,
                       chunk_size=jnp.asarray(chunk))
    td = TransducerModel(vocab=vocab, dec_dim=12, joint_dim=16)
    toks0 = jnp.zeros((b, 3), jnp.int32)
    enc_full = enc.apply(eparams, x, src_mask=mask,
                         chunk_size=jnp.asarray(chunk))
    tparams = td.init(jax.random.PRNGKey(1), enc_full, toks0,
                      method=td.init_all)
    bound = td.bind(tparams)

    # full-utterance decode over the DCT forward
    full_tokens, full_lens = transducer_greedy_decode(
        bound.encode_proj(enc_full), jnp.full((b,), t, jnp.int32),
        bound.predictor_init, bound.predictor_step, bound.joint_step,
        max_tokens=24,
    )

    # streaming: chunked encoder + carried greedy decode
    state = enc.apply(eparams, b, left_chunks * chunk,
                      method=enc.init_streaming_state)
    carry = None
    for c in range(n_chunks):
        xc = x[:, c * chunk : (c + 1) * chunk]
        enc_c, state = enc.apply(eparams, xc, state,
                                 method=enc.streaming_step)
        out = transducer_greedy_decode(
            bound.encode_proj(enc_c), jnp.full((b,), chunk, jnp.int32),
            bound.predictor_init, bound.predictor_step, bound.joint_step,
            max_tokens=24, carry=carry, return_carry=True,
        )
        stream_tokens, stream_lens, carry = out

    np.testing.assert_array_equal(np.asarray(full_tokens),
                                  np.asarray(stream_tokens))
    np.testing.assert_array_equal(np.asarray(full_lens),
                                  np.asarray(stream_lens))
