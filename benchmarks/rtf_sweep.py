"""RTF-vs-utterance-length sweep: SummaryMixing vs self-attention.

Reproduces the reference's headline plot (README.md:18, summarymixing.png):
decode real-time-factor stays flat with utterance length for SummaryMixing
(O(T)) while MHSA grows (O(T^2)). Runs the flagship Branchformer encoder at
recipe scale on one chip for utterance lengths 10..120 s and prints one JSON
line per (mixer, length).

Usage: python benchmarks/rtf_sweep.py [--lengths 10 30 60 120] [--batch 4]
"""

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

from summarymixing_tpu.frontend.features import Fbank
from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer


def build(attention_type: str):
    asr = TransformerASR(
        tgt_vocab=5000, input_size=640, d_model=512,
        # nhead 4 matches bench.py / train_bench.py's MHA baseline (the
        # reference's own self-attention config) so the RTF curve and
        # the same-chip speedup numbers are mutually comparable
        nhead=1 if attention_type == "SummaryMixing" else 4,
        num_encoder_layers=18, num_decoder_layers=0, d_ffn=2048,
        encoder_module="branchformer", attention_type=attention_type,
        mode="SummaryMixing", causal=False, csgu_linear_units=3072,
        kernel_size=31, local_proj_hid_dim=(512,), local_proj_out_dim=512,
        summary_hid_dim=(512,), summary_out_dim=512, dropout_rate=0.0,
        dtype=jnp.bfloat16,
    )
    return SpeechRecognizer(asr=asr, vocab_size=5000, dtype=jnp.bfloat16)


def measure(model, fbank, batch, secs):
    sr = 16000
    n = secs * sr
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    wav_lens = jnp.full((batch,), n, jnp.int32)
    feats = fbank(wav)
    feat_lens = fbank.frame_lengths(wav_lens)
    params = model.init(jax.random.PRNGKey(0), feats[:1], feat_lens[:1])

    @jax.jit
    def encode(params, feats, feat_lens, carry):
        out, _ = model.apply(
            params, feats + carry * 1e-12, feat_lens, method=model.encode
        )
        return jnp.sum(out[:, 0, 0]).astype(jnp.float32)

    float(encode(params, feats, feat_lens, jnp.float32(0.0)))  # compile

    def chain(k):
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        for _ in range(k):
            c = encode(params, feats, feat_lens, c * 0.0)
        float(c)
        return time.perf_counter() - t0

    # calibrate, then size the chains so the measured work dominates the
    # tunnel's multi-ms jitter (~2 s of device work per measurement)
    est = max(chain(10) / 10, 1e-4)
    k_small = max(3, int(0.3 / est))
    k_large = k_small + max(10, int(2.0 / est))
    t_small, t_large = chain(k_small), chain(k_large)
    per_iter = (t_large - t_small) / (k_large - k_small)
    rtf = per_iter / (batch * secs)
    return per_iter, rtf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=int, nargs="+",
                    default=[10, 30, 60, 120])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mixers", nargs="+",
                    default=["SummaryMixing", "regularMHA"])
    args = ap.parse_args()
    args.lengths = sorted(args.lengths)  # flatness summary assumes ascending

    fbank = Fbank()
    results = []
    for mixer in args.mixers:
        model = build(mixer)
        for secs in args.lengths:
            per_iter, rtf = measure(model, fbank, args.batch, secs)
            rec = {
                "mixer": mixer, "utt_secs": secs, "batch": args.batch,
                "ms_per_batch": round(per_iter * 1e3, 2),
                "rtf": rtf,
                "audio_s_per_s": round(args.batch * secs / per_iter, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # flatness summary: ms per audio-second at shortest vs longest
    for mixer in args.mixers:
        rs = [r for r in results if r["mixer"] == mixer]
        lo, hi = rs[0], rs[-1]
        ratio = (hi["ms_per_batch"] / hi["utt_secs"]) / (
            lo["ms_per_batch"] / lo["utt_secs"]
        )
        print(json.dumps({
            "mixer": mixer,
            "per_audio_sec_cost_ratio_longest_vs_shortest": round(ratio, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
