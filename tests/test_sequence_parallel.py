"""Sequence parallelism: time-sharded encode == single-device encode.

The reference has no sequence parallelism (SURVEY.md §2.4); this is the
TPU-native extension parallel/sequence.py adds. These tests run on the
8-virtual-CPU-device mesh from conftest.py and assert the time-sharded
graph (GSPMD-inserted mean-psum + conv halo exchanges) is numerically
equivalent to the unsharded one, including with ragged padding — the
property that makes the masked time-mean shard-invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.parallel.sequence import (
    make_seq_mesh,
    sequence_parallel_encode,
    sequence_parallel_ctc_decode,
)

VOCAB = 40


def _make_model(encoder_module: str, mode: str = "SummaryMixing"):
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=16, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=32,
        encoder_module=encoder_module, attention_type="SummaryMixing",
        mode=mode, causal=False, kernel_size=5,
        csgu_linear_units=32,
        local_proj_hid_dim=(16,), local_proj_out_dim=16,
        summary_hid_dim=(16,), summary_out_dim=16, dropout_rate=0.0,
    )
    return SpeechRecognizer(
        asr=asr, vocab_size=VOCAB, frontend_channels=(4, 4),
        frontend_dropout=0.0,
    )


def _feats(rng, b=4, t=64):
    feats = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    # ragged lengths so the masked time-mean must ignore frames that live
    # on different shards for different utterances
    lens = jnp.asarray([t, t - 9, t // 2, t - 1][:b], jnp.int32)
    return feats, lens


@pytest.mark.parametrize(
    "encoder_module,mode",
    [
        ("branchformer", "SummaryMixing"),
        ("conformer", "SummaryMixing-fast"),
    ],
)
def test_time_sharded_encode_matches_single_device(rng, encoder_module, mode):
    model = _make_model(encoder_module, mode)
    feats, lens = _feats(rng)
    params = model.init(jax.random.PRNGKey(0), feats, lens)

    ref_enc, ref_len = model.apply(params, feats, lens, method=model.encode)

    mesh = make_seq_mesh(n_data=2, n_seq=4)
    assert mesh.shape == {"data": 2, "seq": 4, "model": 1}
    sp_encode = sequence_parallel_encode(model, mesh)
    sp_enc, sp_len = sp_encode(params, feats, lens)

    np.testing.assert_array_equal(np.asarray(sp_len), np.asarray(ref_len))
    np.testing.assert_allclose(
        np.asarray(sp_enc), np.asarray(ref_enc), rtol=2e-5, atol=2e-6
    )
    # the result really is distributed: time axis lives on the seq axis
    spec = sp_enc.sharding.spec
    assert tuple(spec)[:2] == ("data", "seq")


def test_time_sharded_greedy_ctc_matches_single_device(rng):
    from summarymixing_tpu.decoding.ctc import collapse_ctc, ctc_greedy_decode

    model = _make_model("branchformer")
    feats, lens = _feats(rng)
    params = model.init(jax.random.PRNGKey(0), feats, lens)

    enc, out_len = model.apply(params, feats, lens, method=model.encode)
    ref_ids, ref_keep = ctc_greedy_decode(
        model.apply(params, enc, method=model.ctc_head), out_len
    )

    mesh = make_seq_mesh(n_data=2, n_seq=4)
    sp_decode = sequence_parallel_ctc_decode(model, mesh)
    sp_ids, sp_keep, sp_len = sp_decode(params, feats, lens)

    np.testing.assert_array_equal(np.asarray(sp_len), np.asarray(out_len))
    assert collapse_ctc(sp_ids, sp_keep) == collapse_ctc(ref_ids, ref_keep)


def test_seq_mesh_rejects_non_divisible():
    with pytest.raises(ValueError, match="does not use all"):
        make_seq_mesh(n_data=3, n_seq=2)


def test_time_sharding_rejects_odd_lengths(rng):
    """T not divisible by n_seq is rejected with a clear message: silently
    zero-padding here would shift which frontend conv taps see real data
    at the sequence boundary and change the last valid subsampled frame
    (verified empirically: padding 50 -> 52 perturbs frame ceil(50/4)-1 by
    O(1)). Padding belongs upstream in the bucketing."""
    model = _make_model("branchformer")
    feats, lens = _feats(rng, b=2, t=50)  # 50 % 4 != 0
    params = model.init(jax.random.PRNGKey(0), feats, lens)
    mesh = make_seq_mesh(n_data=2, n_seq=4)
    with pytest.raises(ValueError, match="not divisible by the seq"):
        sequence_parallel_encode(model, mesh)(params, feats, lens)
