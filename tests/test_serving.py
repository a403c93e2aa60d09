"""Serving (summarymixing_tpu/serving.py + recipes/serve.py): dynamic
batcher semantics with a stub infer fn, audio-bytes decoding, and an HTTP
integration round trip against a freshly trained smoke run."""

import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
import wave as wave_mod

import numpy as np
import pytest

from summarymixing_tpu.serving import (
    DynamicBatchingServer,
    RequestError,
    ServingConfig,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def _cfg(**kw):
    base = dict(batch_size=4, max_wait_ms=30.0, sample_rate=16000,
                bucket_edges_s=(1.0, 2.0, 4.0))
    base.update(kw)
    return ServingConfig(**base)


class EchoInfer:
    """Stub infer: returns 'len=<n>' per row; records batch geometry."""

    def __init__(self, fail=False, delay=0.0):
        self.calls = []
        self.fail = fail
        self.delay = delay

    def __call__(self, wav, lens):
        self.calls.append((wav.shape, tuple(int(x) for x in lens)))
        if self.fail:
            raise RuntimeError("backend exploded")
        if self.delay:
            time.sleep(self.delay)
        return [f"len={int(n)}" for n in lens]


def test_single_request_roundtrip():
    infer = EchoInfer()
    with DynamicBatchingServer(infer, _cfg()) as srv:
        out = srv.submit(np.ones(1600, np.float32))
        assert out == "len=1600"
        st = srv.stats()
        assert st["served"] == 1 and st["p50_ms"] is not None


def test_concurrent_requests_share_batches():
    infer = EchoInfer(delay=0.01)
    results = {}
    with DynamicBatchingServer(infer, _cfg(max_wait_ms=100.0)) as srv:
        def call(i):
            results[i] = srv.submit(np.ones(1000 + i, np.float32))
        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == {i: f"len={1000 + i}" for i in range(8)}
    # 8 requests through batch_size-4 batches: at most 3 infer calls and
    # at least one multi-request batch
    assert len(infer.calls) <= 3
    assert any(len(set(lens)) > 1 or shape[0] > 1
               for shape, lens in infer.calls)


def test_bucketed_static_shapes():
    infer = EchoInfer()
    with DynamicBatchingServer(infer, _cfg()) as srv:
        srv.submit(np.ones(100, np.float32))       # -> 1 s bucket
        srv.submit(np.ones(17000, np.float32))     # -> 2 s bucket
        srv.submit(np.ones(16000 * 3, np.float32))  # -> 4 s bucket
        srv.submit(np.ones(200, np.float32))       # -> 1 s bucket again
    shapes = [s for s, _ in infer.calls]
    assert shapes == [(4, 16000), (4, 32000), (4, 64000), (4, 16000)]
    # only 3 distinct shapes compiled for 4 calls
    assert len(set(shapes)) == 3


def test_partial_batch_repeat_padded():
    infer = EchoInfer()
    with DynamicBatchingServer(infer, _cfg(max_wait_ms=1.0)) as srv:
        srv.submit(np.ones(500, np.float32))
    (_, lens), = infer.calls
    assert lens == (500, 500, 500, 500)  # empty rows repeat row 0


def test_error_propagates_and_server_survives():
    infer = EchoInfer(fail=True)
    with DynamicBatchingServer(infer, _cfg()) as srv:
        with pytest.raises(RequestError, match="backend exploded"):
            srv.submit(np.ones(100, np.float32))
        infer.fail = False
        assert srv.submit(np.ones(100, np.float32)) == "len=100"
        assert srv.stats()["errors"] == 1


def test_submit_validation_and_timeout():
    infer = EchoInfer(delay=0.5)
    with DynamicBatchingServer(infer, _cfg(max_audio_s=1.0)) as srv:
        with pytest.raises(ValueError, match="empty"):
            srv.submit(np.zeros(0, np.float32))
        with pytest.raises(ValueError, match="max_audio_s"):
            srv.submit(np.zeros(32000, np.float32))
        with pytest.raises(TimeoutError):
            srv.submit(np.ones(100, np.float32), timeout=0.05)


def test_decode_audio_bytes():
    # the bytes decoder lives in dataio (recipes.serve aliases it);
    # importing recipes.serve here would drag in the whole recipe stack
    from summarymixing_tpu.data.dataio import load_audio_bytes as \
        decode_audio_bytes

    x = (np.sin(np.arange(3200) * 0.1) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    audio = decode_audio_bytes(buf.getvalue(), 16000)
    np.testing.assert_allclose(audio, x / 32768.0, atol=1e-7)

    from summarymixing_tpu.data.flac import encode_flac

    flac = encode_flac(x.astype(np.int64), 16000)
    audio2 = decode_audio_bytes(flac, 16000)
    np.testing.assert_allclose(audio2, audio, atol=1e-7)

    with pytest.raises(ValueError, match="WAV .*or FLAC"):
        decode_audio_bytes(b"garbage bytes here", 16000)
    with pytest.raises(ValueError, match="sample rate"):
        decode_audio_bytes(flac, 8000)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_http_server_end_to_end(tmp_path):
    from tests.test_recipes import _make_dataset

    manifest = _make_dataset(str(tmp_path))
    recipe = tmp_path / "tiny.yaml"
    recipe.write_text("""
name: tiny_serve
seed: 1
tokenizer_type: char
model:
  attention_type: SummaryMixing
  mode: SummaryMixing-lite
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
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes/train.py"), str(recipe),
         "--train-manifest", manifest, "--valid-manifest", manifest,
         "--output", str(out), "--steps", "1"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]

    port = _free_port()
    # log to a file, NOT a pipe: XLA's warnings overflow an undrained
    # pipe buffer and block the server before it listens
    log_path = tmp_path / "serve.log"
    log_f = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "recipes/serve.py"), str(recipe),
         "--ckpt", str(out / "save"), "--port", str(port),
         "--batch-size", "2", "--max-wait-ms", "5"],
        stdout=log_f, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 300
        while True:
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    assert json.load(r)["ok"]
                break
            except (urllib.error.URLError, ConnectionError):
                if proc.poll() is not None:
                    raise AssertionError(
                        "server died:\n" + log_path.read_text()[-3000:])
                if time.time() > deadline:
                    proc.terminate()
                    raise AssertionError(
                        "server never listened:\n"
                        + log_path.read_text()[-3000:])
                time.sleep(1.0)

        x = (np.sin(np.arange(16000) * 0.05) * 16000).astype(np.int16)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        req = urllib.request.Request(base + "/transcribe",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.load(r)
        assert "text" in body and isinstance(body["text"], str)

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            st = json.load(r)
        assert st["served"] == 1

        bad = urllib.request.Request(base + "/transcribe",
                                     data=b"not audio", method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=10)
        assert exc.value.code == 400
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        log_f.close()


def test_backlog_drains_full_batches():
    # worker busy while requests pile up: expired-deadline batches must
    # still drain the queue instead of degenerating to batch-size 1
    infer = EchoInfer(delay=0.05)
    results = {}
    with DynamicBatchingServer(infer, _cfg(max_wait_ms=1.0)) as srv:
        def call(i):
            results[i] = srv.submit(np.ones(1000 + i, np.float32))
        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == {i: f"len={1000 + i}" for i in range(8)}
    assert len(infer.calls) <= 5, infer.calls  # un-drained would be 8


def test_malformed_wav_is_value_error():
    from summarymixing_tpu.data.dataio import load_audio_bytes

    with pytest.raises(ValueError, match="malformed WAV"):
        load_audio_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk", 16000)
