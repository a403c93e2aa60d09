"""Full raw-audio streaming step latency at recipe scale, on the real
chip: fbank+CNN chunked frontend -> 12L SummaryMixing-fast Conformer
(LibriSpeech transducer recipe config) -> incremental transducer greedy,
for a batch of S independent stream slots (the serving multiplexer's
per-tick program, serving.py::StreamingSessionServer).

The serving budget: one tick must cost < the audio it covers
(chunk_frames * 40 ms) for real-time service; throughput =
S * chunk_audio / tick is the concurrent-stream capacity per chip.

Ticks are chained through the carried state (a REAL data dependency,
per the tunnel-timing methodology in CLAUDE.md); one scalar fetch at
the end; marginal = (long chain - short chain) / extra ticks.

Usage: python benchmarks/streaming_session_bench.py
           [--slots 8] [--chunk-frames 16] [--left-context 4] [--reps 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # sitecustomize ignores the env var
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
from summarymixing_tpu.utils.cache import repo_cache_dir  # noqa: E402

if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # TPU runs share the repo cache; CPU runs skip persistent caching
    # entirely — XLA:CPU AOT loads always warn about SIGILL-risk
    # pseudo-features (see recipes/_env.py), and CPU compiles are fast.
    jax.config.update(
        "jax_compilation_cache_dir",
        repo_cache_dir(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from summarymixing_tpu.config import build_model, load_recipe  # noqa: E402
from summarymixing_tpu.frontend.features import (  # noqa: E402
    InputNormalization,
    NormStats,
)
from summarymixing_tpu.streaming import make_streaming_infer_fns  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=16)
    ap.add_argument("--left-context", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    cfg = load_recipe(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "recipes/LibriSpeech/conformer_summarymixing_transducer.yaml"))
    enc_model, fbank, td_model = build_model(cfg)

    rng = np.random.default_rng(0)
    s = args.slots
    cs = args.chunk_frames * 4 * fbank.hop_length
    feats = fbank(jnp.zeros((2, 4 * cs), jnp.float32))
    feat_lens = jnp.full((2,), 4 * cs // fbank.hop_length, jnp.int32)
    eparams = enc_model.init(jax.random.PRNGKey(0), feats, feat_lens)
    d = cfg.model.d_model
    tdp = td_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, d)),
                        jnp.zeros((1, 2), jnp.int32),
                        method=td_model.init_all)
    params = {"encoder": eparams["params"], "transducer": tdp["params"]}
    init_fn, step_fn, info = make_streaming_infer_fns(
        enc_model, td_model, fbank, InputNormalization(), params,
        NormStats.init(fbank.n_mels), chunk_frames=args.chunk_frames,
        left_context_chunks=args.left_context,
        blank_id=cfg.model.blank_index)

    step = jax.jit(step_fn)
    carry0 = jax.jit(init_fn)(jnp.zeros((s,), jnp.int32))
    wav = jnp.asarray(rng.standard_normal((s, cs)) * 0.1, jnp.float32)
    nv = jnp.full((s,), cs, jnp.int32)

    def chain(carry, k):
        for _ in range(k):
            carry, toks, n_new = step(carry, wav, nv)
        # one scalar fetch = the only reliable sync through the tunnel
        _ = int(jnp.sum(n_new))
        return carry

    carry = chain(carry0, 2)  # compile + warm
    n1, n2 = args.reps, args.reps * 3
    estimates = []
    for _ in range(3):
        t0 = time.time()
        carry = chain(carry, n1)
        t1 = time.time()
        carry = chain(carry, n2)
        t2 = time.time()
        estimates.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    tick_s = sorted(estimates)[len(estimates) // 2]  # median (CLAUDE.md)

    chunk_audio_s = args.chunk_frames * 4 * fbank.hop_length_ms / 1000.0
    print(json.dumps({
        "bench": "streaming_session_tick",
        "model": "conformer-summarymixing-fast-12L-transducer (recipe cfg)",
        "slots": s,
        "chunk_frames": args.chunk_frames,
        "chunk_audio_ms": round(chunk_audio_s * 1000, 1),
        "tick_ms": round(tick_s * 1e3, 2),
        "tick_ms_all": [round(e * 1e3, 2) for e in estimates],
        "rtf_per_stream": round(tick_s / chunk_audio_s, 5),
        "concurrent_realtime_streams": int(s * chunk_audio_s / tick_s),
    }))


if __name__ == "__main__":
    main()
