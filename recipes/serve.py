"""HTTP transcription server: dynamic-batched online serving of a
trained run.

Production counterpart of recipes/transcribe.py (offline batch): exposes
a trained checkpoint over HTTP with the dynamic batcher from
summarymixing_tpu/serving.py, so concurrent callers share full-size
static-shape device batches (the decode operating point measured in
benchmarks/RESULTS.md) while each sees low latency. The reference has no
serving story beyond SpeechBrain's one-call-per-utterance
EncoderDecoderASR interface; this is the TPU-native replacement.

Endpoints:
  GET  /healthz      -> {"ok": true}
  GET  /stats        -> batcher latency/occupancy stats
  POST /transcribe   -> body: WAV or FLAC bytes; response {"text": ...}

With --streaming (transducer recipes), live low-latency streams are
served instead, multiplexed onto fixed device slots
(summarymixing_tpu/serving.py::StreamingSessionServer over the chunked
pipeline in summarymixing_tpu/streaming.py):
  POST /stream/start        -> {"id": ...}
  POST /stream/<id>         -> body: audio chunk (WAV/FLAC container or
                               raw float32 PCM); response
                               {"text_delta", "text", "tokens"}
  POST /stream/<id>/end     -> flush + free slot; final {"text", ...}

Usage:
  python recipes/serve.py <recipe.yaml> --ckpt results/run/save \
      [--avg 10] [--port 8080] [--batch-size 8] [--max-wait-ms 20] \
      [--warmup] [--streaming --chunk-frames 16 --left-context 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # so `import evaluate` also works under pytest

import evaluate as _eval  # noqa: E402  (same dir; sets the compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from summarymixing_tpu.config import build_model, load_recipe  # noqa: E402
from summarymixing_tpu.data.dataio import load_audio_bytes  # noqa: E402
from summarymixing_tpu.parallel.mesh import make_mesh  # noqa: E402
from summarymixing_tpu.serving import (  # noqa: E402
    DynamicBatchingServer,
    ServingConfig,
)
from summarymixing_tpu.training.optim import make_adamw  # noqa: E402


# bytes-level decoding lives with the rest of the audio IO; a
# ValueError here covers every malformed-client-input case (HTTP 400)
decode_audio_bytes = load_audio_bytes


def build_infer(cfg, ckpt_dir: str, avg: int, batch_size: int):
    """Load the run and return (infer(wav [B,N], lens [B]) -> [str],
    tokenizer). Handles both attention (greedy CTC) and transducer runs,
    mirroring recipes/transcribe.py."""
    import time as _time

    t0 = _time.time()

    def _stage(msg):
        print(f"[serve +{_time.time() - t0:.1f}s] {msg}", flush=True)

    _stage("loading tokenizer")
    tokenizer = _eval.resolve_tokenizer(cfg, _eval.run_dir_of(ckpt_dir))
    _stage("building model")
    model, fbank, td_model = build_model(cfg)
    mesh = make_mesh(devices=jax.devices()[:1])
    sr = cfg.features.sample_rate
    dummy_tokens = jnp.ones((batch_size, 4), jnp.int32)
    dummy_lens = jnp.full((batch_size,), 4, jnp.int32)

    def make_batch(wav, lens):
        return {"wav": jnp.asarray(wav), "wav_lens": jnp.asarray(lens),
                "tokens": dummy_tokens, "token_lens": dummy_lens}

    example = make_batch(np.zeros((batch_size, sr), np.float32),
                         np.full((batch_size,), sr, np.int32))

    if td_model is not None:
        from summarymixing_tpu.decoding.transducer_search import (
            transducer_greedy_decode,
        )

        trainer = _eval.make_transducer_eval_trainer(cfg, model, td_model,
                                                     fbank, mesh)
        state = _eval.restore_eval_state(
            trainer.init_state(jax.random.PRNGKey(0), example),
            ckpt_dir, avg)
        bound = td_model.bind({"params": state["params"]["transducer"]})

        def infer(wav, lens):
            _, (enc_out, enc_lens) = trainer.eval_step(
                state, make_batch(wav, lens))
            toks, tok_lens = transducer_greedy_decode(
                bound.encode_proj(enc_out), enc_lens,
                bound.predictor_init, bound.predictor_step,
                bound.joint_step, blank_id=cfg.model.blank_index)
            toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
            return [tokenizer.decode(toks[i, : tok_lens[i]])
                    for i in range(len(toks))]
    else:
        from summarymixing_tpu.training.trainer import (
            ASRTrainer,
            TrainerConfig,
        )

        trainer = ASRTrainer(
            model, make_adamw(1e-4), fbank,
            TrainerConfig(ctc_weight=cfg.training.ctc_weight, augment=None,
                          blank_id=cfg.model.blank_index,
                          bos_id=cfg.model.bos_index,
                          eos_id=cfg.model.eos_index),
            mesh=mesh,
        )
        _stage("initializing params")
        init = trainer.init_state(jax.random.PRNGKey(0), example)
        _stage("restoring checkpoint")
        state = _eval.restore_eval_state(init, ckpt_dir, avg)
        _stage("ready")

        def infer(wav, lens):
            _, hyps = trainer.eval_step(state, make_batch(wav, lens))
            return [tokenizer.decode(h) for h in hyps]

    return infer, tokenizer


def build_streaming(cfg, ckpt_dir: str, avg: int, slots: int,
                    chunk_frames: int, left_context: int,
                    max_wait_ms: float):
    """(StreamingSessionServer, tokenizer, chunk_samples) from a trained
    transducer run."""
    from summarymixing_tpu.frontend.features import InputNormalization
    from summarymixing_tpu.serving import StreamingSessionServer
    from summarymixing_tpu.streaming import make_streaming_infer_fns

    tokenizer = _eval.resolve_tokenizer(cfg, _eval.run_dir_of(ckpt_dir))
    model, fbank, td_model = build_model(cfg)
    if td_model is None:
        raise SystemExit("--streaming requires a transducer recipe")
    mesh = make_mesh(devices=jax.devices()[:1])
    sr = cfg.features.sample_rate
    example = {
        "wav": jnp.zeros((2, sr), jnp.float32),
        "wav_lens": jnp.full((2,), sr, jnp.int32),
        "tokens": jnp.ones((2, 4), jnp.int32),
        "token_lens": jnp.full((2,), 4, jnp.int32),
    }
    trainer = _eval.make_transducer_eval_trainer(cfg, model, td_model,
                                                 fbank, mesh)
    state = _eval.restore_eval_state(
        trainer.init_state(jax.random.PRNGKey(0), example), ckpt_dir, avg)
    normalizer = InputNormalization(
        update_until_epoch=cfg.features.normalize_update_until_epoch)
    init_fn, step_fn, info = make_streaming_infer_fns(
        model, td_model, fbank, normalizer, state["params"],
        state["norm_stats"], chunk_frames=chunk_frames,
        left_context_chunks=left_context, blank_id=cfg.model.blank_index)
    server = StreamingSessionServer(init_fn, step_fn,
                                    info["chunk_samples"], slots=slots,
                                    max_wait_ms=max_wait_ms)
    return server, tokenizer, info["chunk_samples"]


def decode_chunk_bytes(data: bytes, sample_rate: int) -> np.ndarray:
    """Audio chunk: a WAV/FLAC container, or raw little-endian float32
    PCM (the natural format for mid-stream chunks, which have no
    header)."""
    if data[:4] in (b"RIFF", b"fLaC"):
        return decode_audio_bytes(data, sample_rate)
    if len(data) % 4:
        raise ValueError("raw chunk must be float32 PCM "
                         "(length divisible by 4)")
    return np.frombuffer(data, "<f4").astype(np.float32)


def make_streaming_handler(server, tokenizer, sample_rate: int):
    """HTTP session endpoints over StreamingSessionServer. The handler
    keeps each session's full token history and re-decodes it on every
    update (subword piece boundaries are not delta-decodable in
    general); `text_delta` is the text suffix new since the last
    response."""
    hist = {}   # sid -> {"tokens": [...], "text": str, "lock": Lock}
    lock = threading.Lock()

    def get_hist(sid):
        with lock:
            h = hist.get(sid)
        if h is None:
            raise KeyError(f"unknown session {sid!r}")
        return h

    def update_held(h, sid, new_tokens, final=False):
        """Extend the token history and re-decode. Caller holds
        h['lock'] — EVERY history mutation (feed and end alike) is
        serialised per session, so pipelined POSTs cannot interleave."""
        h["tokens"].extend(new_tokens)
        full = tokenizer.decode(h["tokens"])
        delta = full[len(h["text"]):] if full.startswith(h["text"]) \
            else full
        h["text"] = full
        if final:
            with lock:
                hist.pop(sid, None)
        return {"text": full, "text_delta": delta, "tokens": new_tokens}

    def feed_and_update(sid, audio):
        h = get_hist(sid)
        with h["lock"]:
            new = server.feed(sid, audio)
            return update_held(h, sid, new)

    def end_and_update(sid):
        h = get_hist(sid)
        with h["lock"]:
            new = server.close(sid)
            return update_held(h, sid, new, final=True)

    def prune_hist():
        """Drop handler histories whose server-side session is gone
        (idle-evicted vanished clients never POST again)."""
        alive = server.active_ids()
        with lock:
            for sid in [s for s in hist if s not in alive]:
                hist.pop(sid, None)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                parts = self.path.strip("/").split("/")
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                if parts == ["stream", "start"]:
                    prune_hist()
                    sid = server.open()
                    with lock:
                        hist[sid] = {"tokens": [], "text": "",
                                     "lock": threading.Lock()}
                    self._reply(200, {"id": sid})
                elif len(parts) == 2 and parts[0] == "stream":
                    audio = decode_chunk_bytes(body, sample_rate)
                    self._reply(200, feed_and_update(parts[1], audio))
                elif (len(parts) == 3 and parts[0] == "stream"
                      and parts[2] == "end"):
                    self._reply(200, end_and_update(parts[1]))
                else:
                    self._reply(404, {"error": "unknown path"})
            except KeyError as e:
                # session gone server-side (closed/evicted): drop the
                # handler-side history too
                if len(parts) >= 2 and parts[0] == "stream":
                    with lock:
                        hist.pop(parts[1], None)
                self._reply(404, {"error": str(e)})
            except (ValueError, RuntimeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — operator visibility
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *a):
            pass

    return Handler


def make_handler(server: DynamicBatchingServer, sample_rate: int):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/transcribe":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                audio = decode_audio_bytes(self.rfile.read(n), sample_rate)
                text = server.submit(audio, timeout=120.0)
                self._reply(200, {"text": text})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — operator visibility
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet request lines
            pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--ckpt", required=True, help="checkpoint (save) dir")
    ap.add_argument("--avg", type=int, default=0)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every bucket shape before accepting "
                         "traffic (first-request latency)")
    ap.add_argument("--streaming", action="store_true",
                    help="serve live streams (transducer recipes): "
                         "/stream/start, /stream/<id>, /stream/<id>/end")
    ap.add_argument("--chunk-frames", type=int, default=16,
                    help="encoder frames per streaming chunk (40 ms each)")
    ap.add_argument("--left-context", type=int, default=4,
                    help="left-context CHUNKS carried across steps")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides")
    args = ap.parse_args()

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe, overrides=parse_overrides(args.overrides))
    sr = cfg.features.sample_rate

    if args.streaming:
        server, tokenizer, chunk_samples = build_streaming(
            cfg, args.ckpt, args.avg, args.batch_size, args.chunk_frames,
            args.left_context, args.max_wait_ms)
        if args.warmup:
            print("warmup: compiling the streaming step")
            sid = server.open()
            server.feed(sid, np.zeros((chunk_samples,), np.float32))
            server.close(sid)
        httpd = ThreadingHTTPServer(
            (args.host, args.port),
            make_streaming_handler(server, tokenizer, sr))
        print(f"streaming on http://{args.host}:{args.port} "
              f"({args.batch_size} slots, chunk {chunk_samples} samples "
              f"= {args.chunk_frames} enc frames)", flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            threading.Thread(target=httpd.shutdown).start()
            server.shutdown()
        return

    infer, _tok = build_infer(cfg, args.ckpt, args.avg, args.batch_size)
    scfg = ServingConfig(batch_size=args.batch_size,
                         max_wait_ms=args.max_wait_ms, sample_rate=sr)

    if args.warmup:
        for edge_s in scfg.bucket_edges_s:
            n = int(edge_s * sr)
            print(f"warmup: compiling {args.batch_size} x {edge_s:g}s")
            infer(np.zeros((args.batch_size, n), np.float32),
                  np.full((args.batch_size,), n, np.int32))

    batcher = DynamicBatchingServer(infer, scfg)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(batcher, sr))
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {args.batch_size}, max wait {args.max_wait_ms} ms)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        threading.Thread(target=httpd.shutdown).start()
        batcher.close()


if __name__ == "__main__":
    main()
