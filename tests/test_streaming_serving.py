"""StreamingSessionServer: independent live streams multiplexed onto
fixed device slots must each decode exactly what a standalone stream
produces, regardless of interleaving, stagger, or slot reuse."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.serving import StreamingSessionServer
from summarymixing_tpu.streaming import make_streaming_infer_fns, run_stream
from tests.test_streaming_export import C, setup  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def fns(setup):  # noqa: F811
    s = setup
    init_fn, step_fn, info = make_streaming_infer_fns(
        s["enc_model"], s["td_model"], s["fbank"], s["normalizer"],
        s["params"], s["norm_stats"], chunk_frames=C,
        left_context_chunks=2, blank_id=0)
    return init_fn, step_fn, info, s


def _reference_tokens(init_fn, step_fn, info, wav, wav_len):
    toks, lens = run_stream(init_fn, step_fn,
                            jnp.asarray(wav[None]),
                            jnp.asarray([wav_len], jnp.int32),
                            info["chunk_samples"])
    toks, lens = np.asarray(toks), np.asarray(lens)
    return [int(t) for t in toks[0, : lens[0]]]


def test_staggered_sessions_match_standalone(fns):
    init_fn, step_fn, info, s = fns
    cs = info["chunk_samples"]
    rng = np.random.default_rng(7)
    # three streams of different lengths/content; ragged tails
    wavs = [
        (rng.standard_normal((3 * cs + 1000,)) * 0.1).astype(np.float32),
        (rng.standard_normal((2 * cs + 137,)) * 0.1).astype(np.float32),
        (rng.standard_normal((4 * cs,)) * 0.1).astype(np.float32),
    ]
    for w in wavs:
        w[:50] *= 30.0  # peak early: exact top_db cap in every path
    refs = [_reference_tokens(init_fn, step_fn, info, w, len(w))
            for w in wavs]

    with StreamingSessionServer(init_fn, step_fn, cs, slots=4,
                                max_wait_ms=5.0) as srv:
        # staggered: session 1 opens after session 0 already streamed a
        # chunk; session 2 after session 1; feeds interleave arbitrarily
        got = [[] for _ in wavs]
        sids = [None] * len(wavs)
        pos = [0] * len(wavs)

        def feed_some(i, n):
            take = wavs[i][pos[i]: pos[i] + n]
            pos[i] += len(take)
            if len(take):
                got[i].extend(srv.feed(sids[i], take))

        sids[0] = srv.open()
        feed_some(0, cs)            # stream 0 one chunk ahead
        sids[1] = srv.open()
        feed_some(1, cs // 2)       # sub-chunk feed: buffered host-side
        feed_some(0, 2 * cs + 17)
        sids[2] = srv.open()
        feed_some(2, 3 * cs)
        feed_some(1, 2 * cs)
        feed_some(0, len(wavs[0]))  # rest
        feed_some(2, len(wavs[2]))
        feed_some(1, len(wavs[1]))
        for i in range(3):
            got[i].extend(srv.close(sids[i]))
        assert got == refs
        stats = srv.stats()
        assert stats["ticks"] > 0 and stats["active_sessions"] == 0


def test_concurrent_sessions_from_threads(fns):
    """Real thread-per-client interleaving: every stream still decodes
    its standalone tokens, and ticks pack multiple ready slots."""
    init_fn, step_fn, info, s = fns
    cs = info["chunk_samples"]
    rng = np.random.default_rng(11)
    n_streams = 4
    wavs = [(rng.standard_normal((3 * cs + 100 * i,)) * 0.1)
            .astype(np.float32) for i in range(n_streams)]
    for w in wavs:
        w[:50] *= 30.0
    refs = [_reference_tokens(init_fn, step_fn, info, w, len(w))
            for w in wavs]
    results = [None] * n_streams
    errors = []

    with StreamingSessionServer(init_fn, step_fn, cs, slots=n_streams,
                                max_wait_ms=20.0) as srv:
        def client(i):
            try:
                sid = srv.open()
                toks = []
                w = wavs[i]
                for start in range(0, len(w), cs):
                    toks.extend(srv.feed(sid, w[start: start + cs]))
                toks.extend(srv.close(sid))
                results[i] = toks
            except BaseException as e:  # surface in the main thread
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_streams)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert results == refs
        # batching actually happened (not all ticks were singletons)
        assert srv.stats()["mean_ready_per_tick"] > 1.0


def test_slot_exhaustion_and_reuse(fns):
    init_fn, step_fn, info, s = fns
    cs = info["chunk_samples"]
    wav = np.zeros((cs,), np.float32)
    with StreamingSessionServer(init_fn, step_fn, cs, slots=1) as srv:
        sid = srv.open()
        with pytest.raises(RuntimeError, match="busy"):
            srv.open()
        srv.feed(sid, wav)
        srv.close(sid)
        sid2 = srv.open()  # slot reused after close
        srv.feed(sid2, wav)
        srv.close(sid2)
        with pytest.raises(KeyError):
            srv.feed(sid, wav)  # old session is gone


def test_inflight_session_not_idle_evicted(fns):
    """A session waiting on in-flight work is not idle even when its
    last_active is stale: a single tick can exceed idle_timeout_s (on
    the real TPU the first _step compile takes minutes)."""
    import time

    init_fn, step_fn, info, s = fns
    cs = info["chunk_samples"]
    with StreamingSessionServer(init_fn, step_fn, cs, slots=2,
                                idle_timeout_s=0.01) as srv:
        sid = srv.open()
        sess = srv._sessions[sid]
        sess.inflight = 1           # as _submit_chunks sets before queueing
        sess.last_active = time.monotonic() - 10.0
        with srv._lock:
            srv._evict_idle_locked()
        assert sid in srv._sessions  # survived despite stale last_active
        sess.inflight = 0
        with srv._lock:
            srv._evict_idle_locked()
        assert sid not in srv._sessions  # truly idle -> evicted


def test_completed_chunk_tokens_survive_later_failure(fns):
    """Tokens of chunks the device already consumed are recorded per
    completed job: if a LATER chunk of the same feed fails, the earlier
    tokens must stay retrievable via tokens()/close()."""
    init_fn, step_fn, info, s = fns
    cs = info["chunk_samples"]
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((3 * cs,)) * 0.1).astype(np.float32)
    with StreamingSessionServer(init_fn, step_fn, cs, slots=2,
                                max_wait_ms=1.0) as srv:
        sid = srv.open()
        sess = srv._sessions[sid]
        with sess.lock:
            from summarymixing_tpu.serving import _ChunkJob

            jobs = [_ChunkJob(slot=sess.slot, gen=sess.gen,
                              chunk=wav[k * cs:(k + 1) * cs], n_valid=cs)
                    for k in range(3)]
            # last job is stale (wrong gen): the worker fails it while
            # the first two decode normally
            jobs[2].gen -= 1
            with pytest.raises(Exception):
                srv._submit_chunks(sess, jobs, timeout=60.0)
            recorded = list(sess.tokens)
        # the completed jobs' tokens were recorded despite the raise
        assert jobs[0].tokens is not None and jobs[1].tokens is not None
        assert recorded == jobs[0].tokens + jobs[1].tokens
        assert srv.tokens(sid) == recorded
        # ...and stay retrievable AFTER the stream is closed (the
        # finished-transcript map outlives the slot)
        flush = srv.close(sid)
        assert srv.tokens(sid) == recorded + flush


def test_streaming_http_end_to_end(tmp_path):
    """Full CLI path: train a tiny transducer run, start serve.py
    --streaming, drive the /stream session lifecycle over HTTP with raw
    float32 chunks, verify text accumulation and slot lifecycle."""
    import json
    import os
    import subprocess
    import sys
    import time
    import urllib.error
    import urllib.request

    from tests.test_recipes import _make_dataset
    from tests.test_serving import _free_port

    repo = os.path.join(os.path.dirname(__file__), "..")
    manifest = _make_dataset(str(tmp_path))
    recipe = tmp_path / "tiny_td.yaml"
    from tests.test_recipes import TINY_TD_YAML

    recipe.write_text(TINY_TD_YAML.format(name="tiny_td_stream_serve"))
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

    port = _free_port()
    log_path = tmp_path / "serve.log"
    log_f = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "recipes/serve.py"),
         str(recipe), "--ckpt", str(out / "save"), "--port", str(port),
         "--batch-size", "2", "--max-wait-ms", "5", "--streaming",
         "--chunk-frames", "4", "--left-context", "2"],
        stdout=log_f, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo)
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

        def post(path, data=b"", timeout=300):
            req = urllib.request.Request(base + path, data=data,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.load(r)

        sid = post("/stream/start")["id"]
        chunk_samples = 4 * 4 * 160
        wav = (np.sin(np.arange(3 * chunk_samples + 500) * 0.05) * 0.5
               ).astype(np.float32)
        got_text = ""
        for s in range(0, len(wav), chunk_samples):
            rsp = post(f"/stream/{sid}",
                       wav[s: s + chunk_samples].tobytes())
            assert rsp["text"].startswith(got_text)
            got_text = rsp["text"]
        final = post(f"/stream/{sid}/end")
        assert isinstance(final["text"], str)
        assert final["text"].startswith(got_text)

        # closed session is gone
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(f"/stream/{sid}", wav[:chunk_samples].tobytes(),
                 timeout=10)
        assert exc.value.code == 404
        # malformed raw chunk
        sid2 = post("/stream/start")["id"]
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(f"/stream/{sid2}", b"abc", timeout=10)
        assert exc.value.code == 400
        post(f"/stream/{sid2}/end")

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            st = json.load(r)
        assert st["active_sessions"] == 0 and st["ticks"] > 0
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        log_f.close()
