"""W8A8 int8 cgMLP decode vs the bf16 baseline, back to back on one chip.

The decode graph is bandwidth-bound at ~87% of HBM peak (RESULTS.md) and
the cgMLP branch is MXU-bound at bf16 — int8 attacks both: 2x MXU peak
for the int8 contractions and half the bytes at the matmul boundaries
(ops/quant.py). Accuracy is validated separately (tests/test_quant.py
drift bounds; greedy/beam WER parity on the trained smoke-corpus model).

Usage: python benchmarks/int8_decode_bench.py [--batch 8] [--secs 30]
Prints one JSON line with both arms and the speedup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_model, measure_decode  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--secs", type=int, default=30)
    args = ap.parse_args()
    from bench import _wait_for_backend

    _wait_for_backend()  # fail fast during a backend outage

    from summarymixing_tpu.frontend.features import Fbank

    fbank = Fbank()
    sr = 16000
    n = args.secs * sr
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((args.batch, n)).astype(np.float32))
    wav_lens = jnp.full((args.batch,), n, jnp.int32)
    audio_s = args.batch * args.secs

    per_fp, _, n_params, cost_fp = measure_decode(
        build_model("SummaryMixing"), fbank, wav, wav_lens)
    per_q8, _, _, cost_q8 = measure_decode(
        build_model("SummaryMixing", act_int8=True), fbank, wav, wav_lens)

    def eff(cost, per):
        if not cost.get("flops"):
            return {}
        return {
            "eff_tflops": round(cost["flops"] / per / 1e12, 1),
            "hbm_gb_per_s": round(cost["bytes"] / per / 1e9, 0),
            "bytes_per_call_gb": round(cost["bytes"] / 1e9, 2),
        }

    print(json.dumps({
        "metric": "int8_decode_comparison",
        "batch": args.batch,
        "utt_secs": args.secs,
        "params": n_params,
        "bf16": {"per_batch_ms": round(per_fp * 1e3, 2),
                 "audio_s_per_s": round(audio_s / per_fp, 1),
                 **eff(cost_fp, per_fp)},
        "int8": {"per_batch_ms": round(per_q8 * 1e3, 2),
                 "audio_s_per_s": round(audio_s / per_q8, 1),
                 **eff(cost_q8, per_q8)},
        "speedup": round(per_fp / per_q8, 3),
    }))


if __name__ == "__main__":
    main()
