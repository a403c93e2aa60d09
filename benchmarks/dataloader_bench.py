"""Corpus-scale data-layer stress (VERDICT r2 item 6): a LibriSpeech-960
sized manifest (~281k rows) at the reference recipe's exact batching
config (max_batch_length 500 s, num_bucket 200, max_batch_ex 128 —
branchformer yaml:75-95), measuring the three costs that only appear at
corpus scale:

  (a) bucket construction + assignment over 281k rows
      (data/batching.py::make_buckets + DynamicBucketBatcher.__init__),
  (b) per-epoch batch-index assembly and the epoch-boundary overhead
      (each __iter__ reshuffles and regroups the whole corpus), and
  (c) steady-state WAV-decode throughput through the native C++ loader
      (native/dataloader.cpp) vs the pure-python fallback, cycling real
      wav files from --wav-dir (no 960 h corpus ships in this image; the
      decode cost per byte is what is being measured).

Usage:
  python benchmarks/dataloader_bench.py --wav-dir corpora/hard27h \
      [--rows 281000] [--load-batches 30]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from summarymixing_tpu.data.batching import DynamicBucketBatcher, make_buckets
from summarymixing_tpu.data import native_loader


def libri_like_durations(rng, n_rows):
    """LibriSpeech-960-like duration distribution: ~281k utterances over
    ~960 h (mean ~12.3 s), clipped to the corpus's 1-30 s range."""
    d = rng.lognormal(mean=np.log(12.0), sigma=0.45, size=n_rows)
    return np.clip(d, 1.0, 30.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=281000)
    ap.add_argument("--num-buckets", type=int, default=200)
    ap.add_argument("--max-batch-length", type=float, default=500.0)
    ap.add_argument("--max-batch-ex", type=int, default=128)
    ap.add_argument("--wav-dir", default=None,
                    help="directory of .wav files to cycle through for the "
                         "loader throughput stage (omit to skip it)")
    ap.add_argument("--load-batches", type=int, default=30)
    ap.add_argument("--load-rows", type=int, default=32,
                    help="rows per loader batch")
    args = ap.parse_args()

    sr = 16000
    rng = np.random.default_rng(0)
    durations = libri_like_durations(rng, args.rows)
    lengths = (durations * sr).astype(np.int64)
    result = {
        "metric": "data_layer_corpus_scale",
        "rows": args.rows,
        "total_hours": round(float(durations.sum() / 3600), 1),
        "num_buckets": args.num_buckets,
        "max_batch_length_s": args.max_batch_length,
    }

    # (a) bucket construction + assignment
    t0 = time.perf_counter()
    buckets = make_buckets(
        max_batch_length=args.max_batch_length * sr,
        num_buckets=args.num_buckets,
        min_len=int(lengths.min()), max_len=int(lengths.max()),
        max_batch_size=args.max_batch_ex,
    )
    batcher = DynamicBucketBatcher(lengths, buckets, shuffle=True, seed=0)
    result["bucket_build_s"] = round(time.perf_counter() - t0, 3)
    result["distinct_bucket_shapes"] = len(buckets)
    result["batches_per_epoch"] = batcher.num_batches()

    # (b) epoch assembly: full index-level iteration, twice — the second
    # epoch isolates the recurring boundary cost (reshuffle + regroup)
    epoch_s = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = rows = 0
        for spec, idx in batcher:
            n += 1
            rows += len(idx)
        epoch_s.append(time.perf_counter() - t0)
    result["epoch_index_assembly_s"] = [round(t, 3) for t in epoch_s]
    result["epoch_boundary_overhead_s"] = round(epoch_s[1], 3)
    result["assembled_rows_per_epoch"] = rows

    # (c) wav decode throughput, native vs python, same files either way
    if args.wav_dir:
        wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
        if not wavs:
            raise SystemExit(f"no .wav files under {args.wav_dir}")
        picks = [wavs[i % len(wavs)]
                 for i in range(args.load_batches * args.load_rows)]
        max_len = 30 * sr

        def run(native: bool):
            # toggle by poking the module's availability gate: the
            # fallback branch is the exact python path multi-format
            # corpora hit
            saved = native_loader._build_failed
            native_loader._build_failed = not native and True
            lib_saved = native_loader._lib
            if not native:
                native_loader._lib = None
            try:
                total_bytes = 0
                t0 = time.perf_counter()
                for b in range(args.load_batches):
                    batch = picks[b * args.load_rows:(b + 1) * args.load_rows]
                    out, lens = native_loader.load_wav_batch(batch, max_len,
                                                             sr)
                    total_bytes += int(lens.sum()) * 2  # 16-bit samples
                dt = time.perf_counter() - t0
            finally:
                native_loader._build_failed = saved
                native_loader._lib = lib_saved
            return dt, total_bytes

        # warm the page cache once so neither variant pays cold reads,
        # then interleave native/python passes and keep the best of each
        # (isolates decode cost from IO-cache state and co-tenant disk)
        for p in set(picks):
            with open(p, "rb") as f:
                f.read()
        if native_loader.native_available():
            runs_n = []
            runs_p = []
            for _ in range(2):
                dt, nbytes = run(native=True)
                runs_n.append(dt)
                dt, _ = run(native=False)
                runs_p.append(dt)
            dt_n, dt_p = min(runs_n), min(runs_p)
            result["native_batches_per_s"] = round(args.load_batches / dt_n, 2)
            result["native_audio_s_per_s"] = round(nbytes / 2 / sr / dt_n, 0)
            result["native_mb_per_s"] = round(nbytes / 1e6 / dt_n, 1)
            result["native_over_python"] = round(dt_p / dt_n, 2)
        else:
            dt_p, nbytes = run(native=False)
        result["python_batches_per_s"] = round(args.load_batches / dt_p, 2)
        result["python_audio_s_per_s"] = round(nbytes / 2 / sr / dt_p, 0)
        result["loader_rows_per_batch"] = args.load_rows

    print(json.dumps(result))


if __name__ == "__main__":
    main()
