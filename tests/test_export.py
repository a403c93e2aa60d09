"""AOT export (utils/export.py + recipes/export_model.py): polymorphic
StableHLO artifact == live model, container format, vocab-aware
transcribe, and the CLI end-to-end from a trained run."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.frontend.features import (
    Fbank,
    InputNormalization,
    NormStats,
)
from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.utils.export import (
    ExportedASR,
    export_ctc_infer,
    make_ctc_infer_fn,
    pack_artifact,
    save_artifact,
    unpack_artifact,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def tiny_setup():
    asr = TransformerASR(
        tgt_vocab=40, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=32,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=32,
        kernel_size=5, local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(16,), summary_out_dim=16, dropout_rate=0.0)
    model = SpeechRecognizer(asr=asr, vocab_size=40,
                             frontend_channels=(4, 4))
    fbank = Fbank()
    wav = jnp.zeros((2, 16000), jnp.float32)
    lens = jnp.full((2,), 16000, jnp.int32)
    feats = fbank(wav)
    params = model.init(jax.random.PRNGKey(0), feats,
                        fbank.frame_lengths(lens))["params"]
    stats = NormStats.init(80)
    infer = make_ctc_infer_fn(model, fbank, InputNormalization(), params,
                              stats)
    return infer


def test_polymorphic_export_matches_live(tiny_setup, tmp_path):
    from jax import export as jexport

    payload = export_ctc_infer(tiny_setup)
    back = jexport.deserialize(bytearray(payload))
    rng = np.random.default_rng(1)
    for b, n in [(2, 16000), (5, 32000)]:  # both axes vary, one artifact
        wav = jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1
        lens = jnp.full((b,), n, jnp.int32)
        ref = jax.jit(tiny_setup)(wav, lens)
        got = back.call(wav, lens)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_fixed_shape_export(tiny_setup):
    from jax import export as jexport

    payload = export_ctc_infer(tiny_setup, fixed_shape=(2, 16000))
    back = jexport.deserialize(bytearray(payload))
    wav = jnp.ones((2, 16000), jnp.float32) * 0.01
    lens = jnp.full((2,), 16000, jnp.int32)
    got = back.call(wav, lens)
    ref = jax.jit(tiny_setup)(wav, lens)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))


def test_container_roundtrip(tmp_path):
    meta = {"blank_id": 0, "vocab": ["", "", "", "", "a"],
            "token_type": "char"}
    data = pack_artifact(b"\x01\x02payload", meta)
    meta2, payload2 = unpack_artifact(data)
    assert meta2 == meta and payload2 == b"\x01\x02payload"
    with pytest.raises(ValueError, match="artifact"):
        unpack_artifact(b"NOTMAGIC" + data[8:])


def test_exported_asr_file_roundtrip(tiny_setup, tmp_path):
    path = str(tmp_path / "m.smtexp")
    save_artifact(path, export_ctc_infer(tiny_setup),
                  {"blank_id": 0, "time_multiple": 320,
                   "sample_rate": 16000, "token_type": "char",
                   "vocab": [""] * 40})
    asr = ExportedASR.load(path)
    wav = np.zeros((1, 16000), np.float32)
    ids, keep, enc_lens = asr(wav, np.full((1,), 16000, np.int32))
    assert np.asarray(ids).shape == np.asarray(keep).shape
    # transcribe pads odd lengths to the time grid
    texts = asr.transcribe(np.zeros(16100, np.float32))
    assert isinstance(texts, list) and len(texts) == 1


def test_transcribe_vocab_joining():
    # stub the compiled call; verify the char and subword joiners
    def fake_call(wav, lens):
        ids = jnp.asarray([[4, 5, 6, 0]])
        keep = jnp.asarray([[True, True, True, False]])
        return ids, keep, jnp.asarray([4])

    char = ExportedASR(
        meta={"token_type": "char", "time_multiple": 320,
              "vocab": ["", "", "", "", "h", "i", "!"]},
        _call=fake_call)
    assert char.transcribe(np.zeros(320, np.float32)) == ["hi!"]

    sub = ExportedASR(
        meta={"token_type": "unigram", "time_multiple": 320,
              "vocab": ["", "", "", "", "▁he", "llo", "▁yo"]},
        _call=fake_call)
    assert sub.transcribe(np.zeros(320, np.float32)) == ["hello yo"]


def test_export_cli_end_to_end(tmp_path):
    from tests.test_recipes import _make_dataset

    manifest = _make_dataset(str(tmp_path))
    recipe = tmp_path / "tiny.yaml"
    recipe.write_text("""
name: tiny_export
seed: 1
tokenizer_type: char
model:
  attention_type: SummaryMixing
  mode: SummaryMixing
  encoder_module: branchformer
  d_model: 32
  nhead: 2
  num_encoder_layers: 1
  num_decoder_layers: 0
  d_ffn: 32
  csgu_linear_units: 32
  csgu_kernel_size: 5
  local_proj_hid_dim: [16]
  local_proj_out_dim: 32
  summary_hid_dim: [16]
  summary_out_dim: 16
  input_size: 80
  output_neurons: 40
  frontend_channels: [4, 4]
training:
  number_of_epochs: 1
  precision: fp32
  ctc_weight: 1.0
  lr_adam: 0.001
  n_warmup_steps: 10
  grad_accumulation_factor: 1
  max_batch_length: 10.0
  num_buckets: 2
  max_batch_ex: 8
  ckpt_interval_minutes: 999
augment:
  speed_perturb: false
""")
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes/train.py"), str(recipe),
         "--train-manifest", manifest, "--valid-manifest", manifest,
         "--output", str(out), "--steps", "1"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]

    artifact = tmp_path / "model.smtexp"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes/export_model.py"),
         str(recipe), "--ckpt", str(out / "save"),
         "--output", str(artifact), "--check"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "check ok" in res.stdout

    # the artifact transcribes with no recipe/checkpoint plumbing
    asr = ExportedASR.load(str(artifact))
    assert asr.meta["token_type"] == "char"
    wav = (np.sin(np.arange(16000) * 0.05) * 0.5).astype(np.float32)
    texts = asr.transcribe(wav)
    assert isinstance(texts[0], str)


def test_transducer_polymorphic_export():
    from jax import export as jexport

    from summarymixing_tpu.models.transducer import TransducerModel
    from summarymixing_tpu.utils.export import make_transducer_infer_fn

    asr = TransformerASR(
        tgt_vocab=20, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(16,), summary_out_dim=32, dropout_rate=0.0)
    enc_model = SpeechRecognizer(asr=asr, vocab_size=20,
                                 frontend_channels=(4, 4))
    td_model = TransducerModel(vocab=20, dec_dim=12, joint_dim=16,
                               emb_dropout=0.0, dec_dropout=0.0)
    fbank = Fbank()
    wav = jnp.zeros((2, 16000), jnp.float32)
    lens = jnp.full((2,), 16000, jnp.int32)
    feats = fbank(wav)
    flens = fbank.frame_lengths(lens)
    enc_params = enc_model.init(jax.random.PRNGKey(0), feats, flens)["params"]
    enc_out, _ = enc_model.apply({"params": enc_params}, feats, flens,
                                 method=enc_model.encode)
    td_params = td_model.init(jax.random.PRNGKey(1), enc_out,
                              jnp.zeros((2, 3), jnp.int32))["params"]
    params = {"encoder": enc_params, "transducer": td_params}
    infer = make_transducer_infer_fn(enc_model, td_model, fbank,
                                     InputNormalization(), params,
                                     NormStats.init(80))
    payload = export_ctc_infer(infer)  # same polymorphic export machinery
    back = jexport.deserialize(bytearray(payload))
    rng = np.random.default_rng(2)
    for b, n in [(2, 16000), (4, 32000)]:
        w = jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1
        ln = jnp.full((b,), n, jnp.int32)
        ref = jax.jit(infer)(w, ln)
        got = back.call(w, ln)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
