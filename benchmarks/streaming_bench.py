"""Streaming (chunked) inference latency on one chip: per-chunk wall time of
the functional Conformer streaming step at the transducer-recipe scale
(conformer_summarymixing_transducer.yaml: 12 layers, d512, SummaryMixing-fast,
chunk sizes 8-32 frames = 320-1280 ms of audio at the 40 ms frame rate).

This is the serving metric for the streaming recipes: a chunk must be
processed far faster than its own duration for real-time operation.

Usage: python benchmarks/streaming_bench.py [--chunk-frames 16] [--batch 1]
Prints one JSON line."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from summarymixing_tpu.models.conformer import ConformerEncoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-frames", type=int, default=16,
                    help="encoder frames per chunk (40 ms each)")
    ap.add_argument("--left-chunks", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--compare-state-dtypes", action="store_true",
                    help="measure bf16-state AND fp32-state back-to-back "
                         "in ONE invocation (same chip-sharing regime) and "
                         "report the same-session ratio — cross-session "
                         "comparisons carry 3x co-tenancy variance "
                         "(RESULTS.md)")
    args = ap.parse_args()

    d = 512
    enc = ConformerEncoder(
        num_layers=12, d_model=d, d_ffn=2048, nhead=4, kernel_size=31,
        attention_type="SummaryMixing", mode="SummaryMixing-fast",
        local_proj_hid_dim=(512,), local_proj_out_dim=512,
        summary_hid_dim=(512,), dropout_rate=0.0, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    chunk = args.chunk_frames
    x = jnp.asarray(
        rng.standard_normal((args.batch, chunk, d)).astype(np.float32),
        jnp.bfloat16,
    )
    params = enc.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(params, x, state):
        return enc.apply(params, x, state, method=enc.streaming_step)

    def measure(state_dtype):
        # bf16 carried state is the shipped default: fp32 would make
        # every tick a mixed-precision program nobody serves (the f32
        # left-context buffers infect the concat + residual paths)
        state0 = enc.apply(params, args.batch, args.left_chunks * chunk,
                           state_dtype, method=enc.init_streaming_state)
        out, _ = step(params, x, state0)
        jax.block_until_ready(out)

        def chain(k):
            t0 = time.perf_counter()
            s = state0
            xx = x
            for _ in range(k):
                out, s = step(params, xx, s)
                xx = x + out.astype(xx.dtype) * 1e-12  # data dependency
            float(jnp.sum(out[:, :1, :1]).astype(jnp.float32))
            return time.perf_counter() - t0

        est = max(chain(10) / 10, 1e-4)
        k1 = max(5, int(0.3 / est))
        k2 = k1 + max(20, int(2.0 / est))
        t1, t2 = chain(k1), chain(k2)
        return (t2 - t1) / (k2 - k1)

    per_chunk = measure(jnp.bfloat16)
    chunk_audio_ms = chunk * 40.0  # 4x-subsampled 10 ms frames
    result = {
        "metric": "streaming_chunk_latency",
        "per_chunk_ms": round(per_chunk * 1e3, 3),
        "chunk_audio_ms": chunk_audio_ms,
        "real_time_factor": round(per_chunk * 1e3 / chunk_audio_ms, 4),
        "batch": args.batch,
        "chunk_frames": chunk,
        "left_context_frames": args.left_chunks * chunk,
        "model": "conformer-summarymixing-fast-12L-d512",
        "note": "rtf < 1 means faster than real time per stream",
    }
    if args.compare_state_dtypes:
        # interleave a second bf16 pass around the fp32 pass so a
        # co-tenancy drift mid-invocation is visible in the spread
        fp32 = measure(jnp.float32)
        bf16_rerun = measure(jnp.bfloat16)
        result["fp32_state_per_chunk_ms"] = round(fp32 * 1e3, 3)
        result["bf16_state_per_chunk_ms"] = [
            result.pop("per_chunk_ms"), round(bf16_rerun * 1e3, 3)]
        best_bf16 = min(result["bf16_state_per_chunk_ms"])
        result["fp32_over_bf16_same_session"] = round(fp32 * 1e3 / best_bf16,
                                                      2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
