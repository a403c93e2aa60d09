"""Self-contained streaming pipeline (streaming.py) + its AOT export:
the chunked fbank/CNN frontend must reproduce the offline frontend
bit-for-bit-ish, the raw-audio step must emit the same tokens as the
reference-shaped live streaming loop (evaluate.py::_streaming_decode:
offline frontend + encode_streaming + incremental greedy), and the
exported init/step artifact must match the live fns at unseen batch
sizes (symbolic b)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.decoding.transducer_search import (
    transducer_greedy_decode,
)
from summarymixing_tpu.frontend.features import (
    Fbank,
    InputNormalization,
    NormStats,
)
from summarymixing_tpu.models.asr import DynChunkTrainConfig, TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.models.transducer import TransducerModel
from summarymixing_tpu.streaming import (
    StreamGeometry,
    make_streaming_infer_fns,
    run_stream,
    streamed_frontend_chunk,
)
from summarymixing_tpu.utils.export import (
    ExportedStreamingASR,
    export_streaming,
    pack_artifact,
    save_artifact,
    unpack_artifact,
)

VOCAB = 12
D = 32
C = 4  # encoder frames per chunk


@pytest.fixture(scope="module")
def setup():
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=4 * 20, d_model=D, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=64,
        encoder_module="conformer", attention_type="SummaryMixing",
        mode="SummaryMixing-fast", causal=False, kernel_size=5,
        local_proj_hid_dim=(16,), local_proj_out_dim=D,
        summary_hid_dim=(24,), dropout_rate=0.0,
    )
    enc_model = SpeechRecognizer(asr=asr, vocab_size=VOCAB,
                                 frontend_channels=(4, 4),
                                 frontend_dropout=0.0)
    td_model = TransducerModel(vocab=VOCAB, dec_dim=12, joint_dim=20,
                               emb_dropout=0.0, dec_dropout=0.0)
    fbank = Fbank()
    rng = np.random.default_rng(0)
    b = 2
    chunk_samples = C * 4 * fbank.hop_length
    n = 3 * chunk_samples + 1000  # ragged tail
    wav = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    wav[:, :100] *= 30.0  # global peak in chunk 0 => exact top_db cap
    wav_lens = np.asarray([n, n - chunk_samples - 777], np.int32)

    # offline reference on the stream-covered length (bucketed-eval
    # semantics: the batch array extends past each row's valid length)
    n_cov = -(-n // chunk_samples) * chunk_samples
    wav_cov = jnp.pad(jnp.asarray(wav), ((0, 0), (0, n_cov - n)))
    feats = fbank(wav_cov)
    feat_lens = fbank.frame_lengths(jnp.asarray(wav_lens))
    eparams_tree = enc_model.init(jax.random.PRNGKey(0), feats, feat_lens)
    tdp = td_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, D)),
                        jnp.zeros((1, 2), jnp.int32),
                        method=td_model.init_all)
    params = {"encoder": eparams_tree["params"],
              "transducer": tdp["params"]}
    return dict(enc_model=enc_model, td_model=td_model, fbank=fbank,
                params=params, norm_stats=NormStats.init(fbank.n_mels),
                normalizer=InputNormalization(), wav=wav,
                wav_cov=wav_cov, wav_lens=wav_lens,
                chunk_samples=chunk_samples)


def _live_reference(s, max_tokens_factor=6):
    """evaluate.py::_streaming_decode shape: offline fbank+CNN, chunked
    encode_streaming, incremental greedy with a whole-stream buffer."""
    enc_model, td_model, fbank = s["enc_model"], s["td_model"], s["fbank"]
    eparams = {"params": s["params"]["encoder"]}
    bound = td_model.bind({"params": s["params"]["transducer"]})
    feats = fbank(s["wav_cov"])
    feats, _ = s["normalizer"](feats, s["norm_stats"])
    src = enc_model.apply(eparams, feats, method=enc_model.frontend)
    enc_lens = enc_model.apply(
        eparams, fbank.frame_lengths(jnp.asarray(s["wav_lens"])),
        method=enc_model.subsampled_length)
    t_enc = src.shape[1]
    b = src.shape[0]
    st = enc_model.apply(eparams, b,
                         DynChunkTrainConfig(chunk_size=C,
                                             left_context_size=2),
                         method=enc_model.streaming_init)
    n_chunks = -(-t_enc // C)
    pad = n_chunks * C - t_enc
    if pad:
        src = jnp.pad(src, ((0, 0), (0, pad), (0, 0)))
    carry, toks, lens = None, None, None
    enc_chunks = []
    for c in range(n_chunks):
        enc_c, st = enc_model.apply(
            eparams, src[:, c * C:(c + 1) * C], st,
            method=enc_model.encode_streaming_chunk)
        enc_chunks.append(enc_c)
        valid = jnp.clip(enc_lens - c * C, 0, C)
        toks, lens, carry = transducer_greedy_decode(
            bound.encode_proj(enc_c), valid, bound.predictor_init,
            bound.predictor_step, bound.joint_step, blank_id=0,
            max_tokens=max_tokens_factor * t_enc, carry=carry,
            return_carry=True)
    return (np.asarray(toks), np.asarray(lens), enc_chunks,
            np.asarray(enc_lens), src)


def test_streamed_frontend_matches_offline(setup):
    s = setup
    enc_model, fbank = s["enc_model"], s["fbank"]
    eparams = {"params": s["params"]["encoder"]}
    geom = StreamGeometry(chunk_frames=C, hop=fbank.hop_length,
                          win=fbank.win_length, sub=4)
    chunk_samples = s["chunk_samples"]
    _, _, _, enc_lens, src = _live_reference(s)
    b = src.shape[0]
    n_chunks = s["wav_cov"].shape[1] // chunk_samples

    full = jnp.pad(s["wav_cov"],
                   ((0, 0), (geom.lead, geom.lookahead)))
    db_max = jnp.full((b,), -jnp.inf)

    def cnn_apply(f, off):
        return enc_model.apply(eparams, f, off, method=enc_model.frontend)

    for p in range(n_chunks):
        window = jax.lax.dynamic_slice(
            full, (0, p * chunk_samples), (b, geom.window_len))
        got, db_max = streamed_frontend_chunk(
            fbank, s["normalizer"], s["norm_stats"], cnn_apply, geom,
            window, jnp.asarray(p), db_max)
        ref = src[:, p * C:(p + 1) * C]
        # frames past enc_lens are undefined (offline zero-pads, the
        # stream keeps computing silence frames)
        gidx = p * C + jnp.arange(C)
        vmask = (gidx[None, :] < enc_lens[:, None])[:, :, None]
        err = float(jnp.max(jnp.abs(jnp.where(vmask, got - ref, 0.0))))
        assert err < 2e-4, (p, err)


def test_stream_tokens_match_live_incremental(setup):
    s = setup
    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C,
        left_context_chunks=2, blank_id=0)
    assert info["chunk_samples"] == s["chunk_samples"]
    toks_live, lens_live, _, _, _ = _live_reference(s)
    toks_s, lens_s = run_stream(init_fn, step_fn, s["wav"], s["wav_lens"],
                                info["chunk_samples"])
    toks_s, lens_s = np.asarray(toks_s), np.asarray(lens_s)
    np.testing.assert_array_equal(lens_live, lens_s)
    for i in range(len(lens_s)):
        np.testing.assert_array_equal(
            toks_live[i, : lens_live[i]], toks_s[i, : lens_s[i]])


def test_step_rejects_wrong_chunk_size(setup):
    s = setup
    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C)
    carry = init_fn(jnp.zeros((1,), jnp.int32))
    with pytest.raises(ValueError, match="samples per chunk"):
        step_fn(carry, jnp.zeros((1, 123), jnp.float32),
                jnp.zeros((1,), jnp.int32))


def test_chunk_too_small_for_lookahead(setup):
    s = setup
    with pytest.raises(ValueError, match="lookahead"):
        make_streaming_infer_fns(
            s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
            s["params"], s["norm_stats"], chunk_frames=1)


def test_multi_payload_container_roundtrip():
    meta = {"x": 1}
    payloads = {"init": b"abc", "step": b"defgh"}
    data = pack_artifact(payloads, meta)
    meta2, got = unpack_artifact(data)
    assert meta2 == meta and got == payloads
    # single-payload form unchanged
    meta3, single = unpack_artifact(pack_artifact(b"zzz", meta))
    assert single == b"zzz" and meta3 == meta


def test_streaming_export_cli_end_to_end(tmp_path):
    """Train a tiny transducer run, export --streaming --check, reload
    and transcribe with no model code (the judge-facing CLI contract)."""
    import subprocess
    import sys

    from tests.test_recipes import _make_dataset

    repo = os.path.join(os.path.dirname(__file__), "..")
    manifest = _make_dataset(str(tmp_path))
    recipe = tmp_path / "tiny_td.yaml"
    from tests.test_recipes import TINY_TD_YAML

    recipe.write_text(TINY_TD_YAML.format(name="tiny_td_stream_export"))
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "recipes/train.py"),
         str(recipe), "--train-manifest", manifest,
         "--valid-manifest", manifest, "--output", str(out),
         "--steps", "2"],
        capture_output=True, text=True, timeout=560, env=env, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]

    artifact = tmp_path / "stream.smtexp"
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "recipes/export_model.py"),
         str(recipe), "--ckpt", str(out / "save"),
         "--output", str(artifact), "--streaming",
         "--chunk-frames", "4", "--left-context", "2", "--check"],
        capture_output=True, text=True, timeout=560, env=env, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "check ok" in res.stdout

    art = ExportedStreamingASR.load(str(artifact))
    assert art.meta["family"] == "transducer_streaming"
    assert art.meta["chunk_frames"] == 4
    wav = (np.sin(np.arange(16000) * 0.05) * 0.5).astype(np.float32)
    texts = art.transcribe(wav)
    assert isinstance(texts[0], str)


def test_export_roundtrip_unseen_batch(setup, tmp_path):
    s = setup
    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C,
        left_context_chunks=2)
    payloads = export_streaming(init_fn, step_fn, info["chunk_samples"])
    vocab = [""] * 3 + list("abcdefghi")
    meta = {"family": "transducer_streaming", "sample_rate": 16000,
            "token_type": "char", "vocab": vocab, "blank_id": 0, **info}
    path = os.path.join(tmp_path, "stream.smtexp")
    save_artifact(path, payloads, meta)

    art = ExportedStreamingASR.load(path)
    # batch 3 was never traced (export is batch-symbolic)
    wav3 = np.concatenate([s["wav"], s["wav"][:1]], axis=0)
    lens3 = np.concatenate([s["wav_lens"], s["wav_lens"][:1]])
    texts = art.transcribe(wav3, lens3)
    toks, lens = run_stream(init_fn, step_fn, jnp.asarray(wav3),
                            jnp.asarray(lens3), info["chunk_samples"])
    toks, lens = np.asarray(toks), np.asarray(lens)
    ref = ["".join(vocab[t] for t in toks[i, : lens[i]]
                   if 0 <= t < len(vocab)) for i in range(3)]
    assert texts == ref
    # ragged rows decoded differently proves lens are honored
    assert texts[0] != texts[1]


def test_exact_chunk_multiple_final_frame(setup):
    """A stream whose length is an exact chunk multiple has one encoder
    frame past its last input chunk (frame count = 1 + N//hop); the
    flush must decode it (regression: it was silently dropped)."""
    s = dict(setup)
    cs = s["chunk_samples"]
    rng = np.random.default_rng(3)
    n = 4 * cs  # exact multiple for BOTH rows
    wav = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    wav[:, :100] *= 30.0
    s["wav"] = wav
    s["wav_lens"] = np.asarray([n, n], np.int32)
    # the offline reference array extends past the valid audio (bucketed
    # eval always quantizes the array length up) — the stream's implicit
    # infinite zero tail matches THAT, not an array that ends exactly at
    # the valid length (whose CNN would zero-pad at its own boundary)
    s["wav_cov"] = jnp.pad(jnp.asarray(wav), ((0, 0), (0, cs)))
    toks_live, lens_live, _, enc_lens, src = _live_reference(s)
    # the premise: the last frame really is past the last input chunk
    assert int(enc_lens[0]) == 4 * C + 1

    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C,
        left_context_chunks=2, blank_id=0)
    toks_s, lens_s = run_stream(init_fn, step_fn, wav, s["wav_lens"], cs)
    toks_s, lens_s = np.asarray(toks_s), np.asarray(lens_s)
    np.testing.assert_array_equal(lens_live, lens_s)
    for i in range(2):
        np.testing.assert_array_equal(
            toks_live[i, : lens_live[i]], toks_s[i, : lens_s[i]])


def test_streaming_step_shards_over_data_mesh(setup):
    """The streaming step is row-parallel end to end (no cross-row ops),
    so a serving fleet can shard stream slots over a device mesh and XLA
    runs each row's chunk on its own chip: outputs must equal the
    single-device step bit-for-bit on an 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    s = setup
    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C,
        left_context_chunks=2, blank_id=0)
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    rows = NamedSharding(mesh, P("data"))

    b = 8
    rng = np.random.default_rng(5)
    cs = info["chunk_samples"]
    wav = jnp.asarray(rng.standard_normal((b, 2 * cs)) * 0.1, jnp.float32)
    nv = jnp.full((b,), cs, jnp.int32)

    def shard(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b:
            return jax.device_put(x, rows)
        return x

    carry_ref = jax.jit(init_fn)(jnp.zeros((b,), jnp.int32))
    carry_sh = jax.tree.map(shard, carry_ref)
    step = jax.jit(step_fn)
    for k in range(2):
        chunk = wav[:, k * cs:(k + 1) * cs]
        carry_ref, t_ref, n_ref = step(carry_ref, chunk, nv)
        carry_sh, t_sh, n_sh = step(jax.tree.map(shard, carry_sh),
                                    jax.device_put(chunk, rows),
                                    jax.device_put(nv, rows))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_sh))
    leaves_r = jax.tree.leaves(carry_ref)
    leaves_s = jax.tree.leaves(carry_sh)
    for a, c in zip(leaves_r, leaves_s):
        # sharded compilation may reassociate float reductions; tokens
        # above are exact, carries are allclose
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)
