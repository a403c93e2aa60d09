"""Fusion-LM checkpoint conversion parity (VERDICT r2 item 2): clean-room
torch builds of the reference TransformerLM / RNNLM (reference-named state
dicts, tests/torch_lm_oracle.py) converted by utils/convert.py must produce
the SAME logits through the flax LMs — closing the Pretrainer route
(published lm.ckpt + tokenizer.ckpt -> evaluate.py --beam --lm-ckpt)."""

import os
import subprocess
import sys as _sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from summarymixing_tpu.models.lm import RNNLM, TransformerLM
from summarymixing_tpu.utils.convert import (
    convert_rnnlm,
    convert_transformer_lm,
)

from torch_lm_oracle import RNNLMTorch, TransformerLMTorch

V = 13
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tlm_pair():
    from summarymixing_tpu.utils.convert import (
        TrackedStateDict,
        assert_fully_consumed,
    )

    torch.manual_seed(5)
    oracle = TransformerLMTorch(V, d_model=16, nhead=2, n_layers=2, d_ffn=24)
    sd = TrackedStateDict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})
    params = convert_transformer_lm(sd)
    assert_fully_consumed(sd, "oracle lm.ckpt")
    assert params.pop("__output_proj__") == "sb"
    lm = TransformerLM(vocab=V, d_model=16, nhead=2, num_layers=2, d_ffn=24,
                       output_proj="sb")
    return oracle, lm, {"params": params}


def test_transformer_lm_conversion_parity(tlm_pair, rng):
    oracle, lm, params = tlm_pair
    tokens = rng.integers(0, V, (3, 7)).astype(np.int64)
    with torch.no_grad():
        want = oracle(torch.as_tensor(tokens)).numpy()
    got = np.asarray(lm.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_transformer_lm_converted_cached_step(tlm_pair, rng):
    """The KV-cached step path (what beam fusion actually runs) must agree
    with the torch oracle per position, through the converted sb head."""
    oracle, lm, params = tlm_pair
    tokens = rng.integers(0, V, (2, 6)).astype(np.int64)
    with torch.no_grad():
        want = oracle(torch.as_tensor(tokens)).numpy()
    cache = lm.apply(params, 2, 8, method=lm.init_cache)
    for pos in range(tokens.shape[1]):
        logits, cache = lm.apply(params, jnp.asarray(tokens[:, pos]),
                                 pos, cache, method=lm.step)
        np.testing.assert_allclose(np.asarray(logits), want[:, pos],
                                   atol=1e-4, rtol=1e-4)


def test_rnnlm_conversion_parity(rng):
    torch.manual_seed(7)
    from summarymixing_tpu.utils.convert import (
        TrackedStateDict,
        assert_fully_consumed,
    )

    oracle = RNNLMTorch(V, embedding_dim=8, rnn_neurons=16, rnn_layers=2,
                        dnn_neurons=12)
    sd = TrackedStateDict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})
    params = convert_rnnlm(sd)
    assert_fully_consumed(sd, "oracle rnnlm lm.ckpt")
    lm = RNNLM(vocab=V, embedding_dim=8, rnn_layers=2, rnn_neurons=16,
               dnn_neurons=12)
    tokens = rng.integers(0, V, (3, 9)).astype(np.int64)
    with torch.no_grad():
        want = oracle(torch.as_tensor(tokens)).numpy()
    got = np.asarray(lm.apply({"params": params},
                              jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_rnnlm_converter_rejects_unmodelled_blocks():
    """A state dict with an extra normalisation block must raise (silently
    dropping it would convert to different numerics)."""
    torch.manual_seed(7)
    oracle = RNNLMTorch(V)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    sd["dnn_norm.norm.weight"] = np.ones(12, np.float32)
    sd["dnn_norm.norm.bias"] = np.zeros(12, np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        convert_rnnlm(sd)


def _write_spm_model(path, words):
    """A tiny unigram ModelProto: control ids 0-2 + word pieces."""
    from summarymixing_tpu.data.sentencepiece_model import (
        serialize_model_proto,
    )

    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += [("▁" + w, -float(i + 1), 1) for i, w in enumerate(words)]
    with open(path, "wb") as f:
        f.write(serialize_model_proto(pieces))


def test_ref_dir_conversion_and_fused_beam_decode(tmp_path, rng):
    """The full Pretrainer route on a reference-format directory
    {model.ckpt, lm.ckpt, tokenizer.ckpt, normalizer.ckpt}: one
    convert_checkpoint.py --ref-dir call, then evaluate.py --beam
    --lm-ckpt decodes raw wavs through the converted ASR model, the
    converted TransformerLM (sb head) AND the published-format
    sentencepiece tokenizer via the pure-python reader."""
    import wave

    from torch_full_oracle import build_oracle

    V12 = 12
    ref = tmp_path / "ref"
    ref.mkdir()
    torch_model = build_oracle(nhead=1, seed=3)
    torch.save(torch_model.state_dict(), ref / "model.ckpt")
    torch.manual_seed(5)
    lm_oracle = TransformerLMTorch(V12, d_model=16, nhead=2, n_layers=2,
                                   d_ffn=24)
    torch.save(lm_oracle.state_dict(), ref / "lm.ckpt")
    torch.save({"glob_mean": torch.zeros(80), "glob_std": torch.ones(80),
                "count": torch.tensor(100.0)}, ref / "normalizer.ckpt")
    _write_spm_model(ref / "tokenizer.ckpt", ["ba", "do", "ki"])

    recipe = tmp_path / "oracle.yaml"
    recipe.write_text("""
name: convert_lm_smoke
tokenizer_type: sentencepiece
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
lm:
  model_type: transformer
  d_model: 16
  nhead: 2
  num_layers: 2
  d_ffn: 24
training:
  precision: fp32
  num_buckets: 2
decoding:
  valid_beam_size: 2
  test_beam_size: 2
  lm_weight: 0.3
  ctc_weight_decode: 0.4
""")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [_sys.executable, os.path.join(REPO, "recipes/convert_checkpoint.py"),
         str(recipe), "--ref-dir", str(ref),
         "--output", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "converted LM (transformer" in res.stdout
    assert (tmp_path / "run" / "tokenizer.model").exists()
    assert (tmp_path / "run" / "lm" / "lm_config.json").exists()

    # tiny wav manifest (contents are irrelevant: this drives the
    # pipeline, not WER)
    rows = ["ID,duration,wav,spk_id,wrd"]
    for i in range(2):
        w = tmp_path / f"u{i}.wav"
        with wave.open(str(w), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(4800) / 16000))
            f.writeframes((audio * 32767).astype(np.int16).tobytes())
        rows.append(f"u{i},0.3,{w},spk0,ba do")
    manifest = tmp_path / "test.csv"
    manifest.write_text("\n".join(rows) + "\n")

    res = subprocess.run(
        [_sys.executable, os.path.join(REPO, "recipes/evaluate.py"),
         str(recipe), "--test-manifest", str(manifest),
         "--ckpt", str(tmp_path / "run" / "save"), "--beam",
         "--lm-ckpt", str(tmp_path / "run" / "lm")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert '"decode": "beam+lm"' in res.stdout, res.stdout[-2000:]
