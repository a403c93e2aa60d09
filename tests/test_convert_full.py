"""Full-model checkpoint conversion parity (VERDICT r1 item 2): a clean-room
torch build of the reference flagship (reference-named state dict) is
converted by utils/convert.py::convert_full_model and must produce the SAME
encoder outputs (<= 1e-4), CTC/seq log-probs, and greedy transcript through
the flax SpeechRecognizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.ops.linear import gelu_exact
from summarymixing_tpu.utils.convert import convert_full_model

from torch_full_oracle import build_oracle, oracle_forward

D, V, NENC, NDEC = 16, 12, 2, 1


def build_flax_model():
    asr = TransformerASR(
        tgt_vocab=V, input_size=40, d_model=D, nhead=1,
        num_encoder_layers=NENC, num_decoder_layers=NDEC, d_ffn=24,
        dropout_rate=0.0, encoder_module="branchformer",
        attention_type="SummaryMixing", mode="SummaryMixing", causal=False,
        normalize_before=True, kernel_size=5, csgu_linear_units=16,
        local_proj_hid_dim=(8,), local_proj_out_dim=16,
        summary_hid_dim=(8,), summary_out_dim=16,
        branchformer_activation=gelu_exact, activation=gelu_exact,
    )
    return SpeechRecognizer(
        asr=asr, vocab_size=V, frontend_channels=(4, 2),
        frontend_strides=(2, 2), frontend_dropout=0.0,
    )


@pytest.fixture(scope="module")
def converted():
    from summarymixing_tpu.utils.convert import (
        TrackedStateDict,
        assert_fully_consumed,
    )

    torch_model = build_oracle(nhead=1, seed=3)
    sd = TrackedStateDict(
        {k: v.numpy() for k, v in torch_model.state_dict().items()})
    params = convert_full_model(sd, nhead=1, mode="SummaryMixing",
                                num_encoder_layers=NENC,
                                num_decoder_layers=NDEC)
    # key-consumption strictness (VERDICT r3 missing #2): every oracle
    # state-dict key must have been read — an unconsumed key means the
    # converter and the reference module layout disagree
    assert_fully_consumed(sd, "oracle model.ckpt")
    return torch_model, params


def test_unconsumed_keys_fail_loud():
    """An unmodelled parameter block in the state dict must abort the
    conversion (key-consumption strictness), not silently convert."""
    from summarymixing_tpu.utils.convert import (
        TrackedStateDict,
        assert_fully_consumed,
    )

    torch_model = build_oracle(nhead=1, seed=3)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    sd["1.encoder.layers.0.extra_adapter.weight"] = np.zeros((4, 4),
                                                             np.float32)
    tracked = TrackedStateDict(sd)
    convert_full_model(tracked, nhead=1, mode="SummaryMixing",
                       num_encoder_layers=NENC, num_decoder_layers=NDEC)
    with pytest.raises(KeyError, match="extra_adapter"):
        assert_fully_consumed(tracked, "oracle model.ckpt")
    # deterministic buffers (PositionalEncoding.pe, Transformer.py:322)
    # are ignorable, not unconsumed
    sd2 = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    sd2["1.positional_encoding.pe"] = np.zeros((1, 8, D), np.float32)
    tracked2 = TrackedStateDict(sd2)
    convert_full_model(tracked2, nhead=1, mode="SummaryMixing",
                       num_encoder_layers=NENC, num_decoder_layers=NDEC)
    rep = assert_fully_consumed(tracked2, "oracle model.ckpt")
    assert rep["ignored"] == ["1.positional_encoding.pe"]


def test_full_model_conversion_parity(converted, rng):
    torch_model, params = converted
    model = build_flax_model()

    feats = rng.standard_normal((2, 16, 80)).astype(np.float32)
    tokens_bos = np.concatenate(
        [np.ones((2, 1)), rng.integers(3, V, (2, 4))], axis=1
    ).astype(np.int64)

    enc_t, ctc_t, seq_t = oracle_forward(torch_model, feats, tokens_bos)

    feat_lens = jnp.full((2,), 16, jnp.int32)
    out = model.apply({"params": params}, jnp.asarray(feats), feat_lens,
                      jnp.asarray(tokens_bos.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out["enc_out"]), enc_t,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["ctc_log_probs"]), ctc_t,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["seq_log_probs"]), seq_t,
                               atol=1e-4, rtol=1e-4)


def test_converted_greedy_transcripts_identical(converted, rng):
    """Step-by-step greedy decode (argmax over the seq head) must agree
    token-for-token between the torch oracle and the converted flax model."""
    import torch

    torch_model, params = converted
    model = build_flax_model()
    feats = rng.standard_normal((1, 16, 80)).astype(np.float32)
    feat_lens = jnp.full((1,), 16, jnp.int32)

    cnn, asr, seq_lin, _ = torch_model
    with torch.no_grad():
        enc_torch = asr.encode(cnn(torch.as_tensor(feats)))
    enc_flax, enc_len = model.apply(
        {"params": params}, jnp.asarray(feats), feat_lens,
        method=model.encode)

    hyp_t, hyp_f = [1], [1]   # bos
    for step in range(5):
        with torch.no_grad():
            dec = asr.decode(torch.as_tensor([hyp_t]), enc_torch)
            nxt_t = int(torch.argmax(seq_lin(dec)[0, -1]))
        lp = model.apply({"params": params},
                         jnp.asarray([hyp_f], jnp.int32), enc_flax, enc_len,
                         step, method=model.decode_position)
        nxt_f = int(jnp.argmax(lp[0]))
        assert nxt_t == nxt_f, (step, nxt_t, nxt_f)
        hyp_t.append(nxt_t)
        hyp_f.append(nxt_f)


def test_convert_checkpoint_cli(tmp_path, rng):
    """recipes/convert_checkpoint.py: torch model.ckpt + normalizer.ckpt
    -> orbax run dir; restored params reproduce the torch oracle's
    encoder outputs through the recipe-built model."""
    import os
    import subprocess
    import sys as _sys

    import torch

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    torch_model = build_oracle(nhead=1, seed=3)
    torch.save(torch_model.state_dict(), tmp_path / "model.ckpt")
    torch.save(
        {"glob_mean": torch.zeros(80), "glob_std": torch.ones(80),
         "count": torch.tensor(100.0)},
        tmp_path / "normalizer.ckpt",
    )
    recipe = tmp_path / "oracle.yaml"
    recipe.write_text(
        """
name: convert_cli_smoke
tokenizer_type: char
model:
  attention_type: SummaryMixing
  mode: SummaryMixing
  encoder_module: branchformer
  d_model: 16
  nhead: 1
  num_encoder_layers: 2
  num_decoder_layers: 1
  d_ffn: 24
  transformer_dropout: 0.0
  activation: gelu_exact
  csgu_linear_units: 16
  csgu_kernel_size: 5
  local_proj_hid_dim: [8]
  local_proj_out_dim: 16
  summary_hid_dim: [8]
  summary_out_dim: 16
  input_size: 40
  output_neurons: 12
  frontend_channels: [4, 2]
training:
  precision: fp32
"""
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [_sys.executable, os.path.join(REPO, "recipes/convert_checkpoint.py"),
         str(recipe), "--torch-ckpt", str(tmp_path / "model.ckpt"),
         "--norm-ckpt", str(tmp_path / "normalizer.ckpt"),
         "--output", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "converted" in res.stdout

    from summarymixing_tpu.config import build_model, load_recipe
    from summarymixing_tpu.frontend.features import NormStats
    from summarymixing_tpu.training.checkpoint import CheckpointManager

    cfg = load_recipe(str(recipe))
    model, fbank, td = build_model(cfg)
    assert td is None
    feats = rng.standard_normal((2, 16, 80)).astype(np.float32)
    feat_lens = jnp.full((2,), 16, jnp.int32)
    init_bos = jnp.ones((2, 3), jnp.int32)
    template = {
        # init WITH target tokens so the decoder branch creates its params
        "params": model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                             feat_lens, init_bos)["params"],
        "norm_stats": NormStats.init(80),
        "step": jnp.zeros((), jnp.int32),
        "epoch": jnp.zeros((), jnp.int32),
    }
    restored = CheckpointManager(str(tmp_path / "run" / "save")).restore(
        template
    )
    assert restored is not None
    assert float(restored["norm_stats"]["count"]) == 100.0

    tokens_bos = np.concatenate(
        [np.ones((2, 1)), rng.integers(3, V, (2, 4))], axis=1
    ).astype(np.int64)
    enc_t, _, _ = oracle_forward(torch_model, feats, tokens_bos)
    out = model.apply({"params": restored["params"]}, jnp.asarray(feats),
                      feat_lens, jnp.asarray(tokens_bos.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out["enc_out"]), enc_t,
                               atol=1e-4, rtol=1e-4)


def test_transducer_model_conversion_parity(rng):
    """Conformer-transducer checkpoint conversion (the second flagship,
    VERDICT r1 item 2): encoder outputs and joint/CTC log-probs must match
    the clean-room torch oracle after convert_transducer_model."""

    from summarymixing_tpu.models.transducer import TransducerModel
    from summarymixing_tpu.utils.convert import convert_transducer_model
    from torch_full_oracle import (
        build_transducer_oracle,
        transducer_oracle_forward,
    )

    from summarymixing_tpu.utils.convert import (
        TrackedStateDict,
        assert_fully_consumed,
    )

    VOC, DM, NL = 10, 16, 2
    torch_model = build_transducer_oracle(vocab=VOC, d_model=DM,
                                          n_layers=NL, seed=11)
    sd = TrackedStateDict(
        {k: v.numpy() for k, v in torch_model.state_dict().items()})
    params = convert_transducer_model(sd, nhead=4, mode="SummaryMixing-fast",
                                      num_encoder_layers=NL)
    assert_fully_consumed(sd, "oracle transducer model.ckpt")

    asr = TransformerASR(
        tgt_vocab=VOC, input_size=40, d_model=DM, nhead=4,
        num_encoder_layers=NL, num_decoder_layers=0, d_ffn=24,
        dropout_rate=0.0, encoder_module="conformer",
        attention_type="SummaryMixing", mode="SummaryMixing-fast",
        causal=False, kernel_size=5, local_proj_hid_dim=(8,),
        local_proj_out_dim=16, summary_hid_dim=(8,),
        branchformer_activation=gelu_exact, activation=gelu_exact,
        conformer_activation=gelu_exact,
    )
    enc_model = SpeechRecognizer(
        asr=asr, vocab_size=VOC, frontend_channels=(4, 2),
        frontend_dropout=0.0,
    )
    td = TransducerModel(vocab=VOC, dec_dim=12, joint_dim=20,
                         activation=gelu_exact)

    feats = rng.standard_normal((2, 16, 80)).astype(np.float32)
    tokens_bos = np.concatenate(
        [np.zeros((2, 1)), rng.integers(1, VOC, (2, 3))], axis=1
    ).astype(np.int64)

    enc_t, joint_t, ctc_t = transducer_oracle_forward(
        torch_model, feats, tokens_bos, VOC)

    feat_lens = jnp.full((2,), 16, jnp.int32)
    enc_f, _ = enc_model.apply({"params": params["encoder"]},
                               jnp.asarray(feats), feat_lens,
                               method=enc_model.encode)
    np.testing.assert_allclose(np.asarray(enc_f), enc_t, atol=1e-4,
                               rtol=1e-4)
    logits = td.apply({"params": params["transducer"]}, enc_f,
                      jnp.asarray(tokens_bos.astype(np.int32)))
    joint_f = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(joint_f), joint_t, atol=1e-4,
                               rtol=1e-4)
    ctc_f = td.apply({"params": params["transducer"]}, enc_f,
                     method=td.ctc_head)
    np.testing.assert_allclose(np.asarray(ctc_f), ctc_t, atol=1e-4,
                               rtol=1e-4)
