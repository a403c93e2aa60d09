"""Decode throughput vs batch size for the flagship SummaryMixing
Branchformer (the bench.py workload at B=8, swept over B).

Rationale: component profiling (RESULTS.md "Pallas whole-branch fusion")
showed XLA runs the cgMLP chain at ~103 eff TFLOPS at B=8 but ~133 at
B=32 — bigger batches tile the MXU better, so offline/batch decode
throughput (audio-s/s) should rise with B until HBM pressure. This sweep
finds the production operating point; bench.py's headline stays at the
measured-best batch.

Usage: python benchmarks/decode_batch_sweep.py [--batches 8,16,32,64]
Prints one JSON line per batch size. Runs on the real chip.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import bench  # reuses build_model / measure_decode / compile cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--secs", type=int, default=30)
    args = ap.parse_args()
    bench._wait_for_backend()  # fail fast during a backend outage

    from summarymixing_tpu.frontend.features import Fbank

    fbank = Fbank()
    sr = 16000
    n = args.secs * sr
    rng = np.random.default_rng(0)
    model = bench.build_model("SummaryMixing")

    for b in [int(x) for x in args.batches.split(",")]:
        wav = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        wav_lens = jnp.full((b,), n, jnp.int32)
        per_iter, estimates, n_params, _cost = bench.measure_decode(
            model, fbank, wav, wav_lens)
        print(json.dumps({
            "batch": b,
            "utt_secs": args.secs,
            "per_iter_ms": round(per_iter * 1e3, 2),
            "audio_s_per_s": round(b * args.secs / per_iter, 1),
            "all_estimates_ms": [round(e * 1e3, 2) for e in estimates],
        }), flush=True)


if __name__ == "__main__":
    main()
