"""W8A8 int8 inference path (ops/quant.py): quantization error bounds,
Int8Dense vs Dense, checkpoint interchangeability, and model-level drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from summarymixing_tpu.ops.convolution import ConvolutionBranch
from summarymixing_tpu.ops.quant import (
    Int8Dense,
    int8_matmul,
    quantize_act,
    quantize_weight,
)


@pytest.fixture
def rng():
    return np.random.default_rng(666)


def test_quantize_act_roundtrip_bound(rng):
    x = jnp.asarray(rng.standard_normal((4, 7, 64)).astype(np.float32)) * 3.0
    q, s = quantize_act(x)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    # symmetric absmax quant: error <= scale/2 = absmax/254 per element
    absmax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(back - x)) <= absmax / 254.0 + 1e-6).all()


def test_quantize_weight_per_channel(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    # scale one output channel way up: per-channel scales must keep the
    # others' precision unaffected
    w = w.at[:, 3].mul(100.0)
    q, s = quantize_weight(w)
    back = q.astype(jnp.float32) * s[None, :]
    colmax = np.abs(np.asarray(w)).max(axis=0)
    assert (np.abs(np.asarray(back - w)) <= colmax / 254.0 + 1e-6).all()


def test_int8_matmul_matches_fp(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 96)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((96, 48)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((48,)).astype(np.float32) * 0.01)
    ref = x @ w + b
    q_a, s_a = quantize_act(x)
    q_w, s_w = quantize_weight(w)
    got = int8_matmul(q_a, s_a, q_w, s_w, b, dtype=jnp.float32)
    # int8 x int8 with per-row/per-channel scales: ~1% relative error
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got - ref)).mean() / denom < 0.01


def test_int8_dense_param_tree_matches_dense(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
    p_fp = nn.Dense(8).init(jax.random.PRNGKey(0), x)
    p_q = Int8Dense(8, dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p_fp) == jax.tree.structure(p_q)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(p_fp), jax.tree.leaves(p_q))
    )
    # same params -> close outputs (checkpoints are interchangeable)
    y_fp = nn.Dense(8).apply(p_fp, x)
    y_q = Int8Dense(8, dtype=jnp.float32).apply(p_fp, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_fp),
                               atol=0.05, rtol=0.05)


def test_convolution_branch_int8_close_to_fp(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
    kw = dict(input_size=32, linear_units=128, kernel_size=5)
    fp = ConvolutionBranch(**kw)
    q8 = ConvolutionBranch(act_int8=True, **kw)
    params = fp.init(jax.random.PRNGKey(1), x)
    # identical param tree: the int8 path is a pure inference-time rewrite
    params_q = q8.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_q)
    y_fp = fp.apply(params, x)
    y_q8 = q8.apply(params, x)
    err = np.abs(np.asarray(y_q8 - y_fp)).mean()
    ref = np.abs(np.asarray(y_fp)).mean()
    assert err / ref < 0.02, (err, ref)


def test_asr_encode_int8_drift_small(rng):
    """Model-level: 2-layer Branchformer encode with W8A8 cgMLP stays
    close to the fp path (same params), and the jitted int8 graph runs."""
    from summarymixing_tpu.models.asr import TransformerASR

    kw = dict(
        tgt_vocab=40, input_size=40, d_model=32, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", csgu_linear_units=64, kernel_size=5,
        local_proj_hid_dim=(32,), local_proj_out_dim=32,
        summary_hid_dim=(32,), summary_out_dim=32, dropout_rate=0.0,
    )
    fp = TransformerASR(**kw)
    q8 = TransformerASR(act_int8=True, **kw)
    x = jnp.asarray(rng.standard_normal((2, 20, 40)).astype(np.float32))
    wav_len = jnp.asarray([1.0, 0.75])
    tgt = jnp.zeros((2, 3), jnp.int32)
    params = fp.init(jax.random.PRNGKey(0), x, tgt, wav_len)
    enc_fp = fp.apply(params, x, wav_len=wav_len, method=fp.encode)
    enc_q8 = jax.jit(
        lambda p, x, l: q8.apply(p, x, wav_len=l, method=q8.encode))(
            params, x, wav_len)
    err = np.abs(np.asarray(enc_q8 - enc_fp)).mean()
    ref = np.abs(np.asarray(enc_fp)).mean()
    assert err / ref < 0.05, (err, ref)


def test_act_int8_wer_parity_trained(rng):
    """WER-level int8 validation (VERDICT r4 task #6, toy scale): train the
    tiny e2e Branchformer CTC model in fp, then greedy-decode the SAME
    trained params through an act_int8 twin trainer — the W8A8 inference
    rewrite must not change what the model transcribes. Complements the
    activation-drift bounds above with the metric that matters
    (benchmarks/int8_decode_bench.py measures the speed half)."""
    from dataclasses import replace

    from summarymixing_tpu.training.metrics import ErrorRateStats
    from summarymixing_tpu.training.trainer import ASRTrainer
    from tests.test_train_e2e import make_trainer, synth_batch

    trainer = make_trainer(num_decoder_layers=0)
    batch = synth_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    for _ in range(150):
        state, metrics = trainer.train_step(state, batch)

    q8_model = replace(trainer.model,
                       asr=replace(trainer.model.asr, act_int8=True))
    q8_trainer = ASRTrainer(q8_model, trainer.tx, trainer.fbank,
                            trainer.config, mesh=trainer.mesh)

    refs = [list(map(int, row)) for row in np.asarray(batch["tokens"])]

    def wer_of(tr):
        _, hyps = tr.eval_step(state, batch)
        stats = ErrorRateStats()
        stats.append(refs, hyps)
        return stats.summarize()["WER"]

    wer_fp = wer_of(trainer)
    wer_q8 = wer_of(q8_trainer)
    assert wer_fp < 15.0, wer_fp
    # parity: int8 decode of fp-trained weights within 2 WER points
    assert wer_q8 <= wer_fp + 2.0, (wer_fp, wer_q8)
