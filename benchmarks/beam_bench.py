"""Joint CTC/attention beam-search decode throughput on one chip — the
reference's test-time configuration (beam width configurable; reference uses
10 valid / 66 test, yaml:140-141) with the KV-cached decoder.

Usage: python benchmarks/beam_bench.py [--beam 10] [--secs 30] [--batch 4]
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

from summarymixing_tpu.decoding.s2s_beam import (
    S2SBeamConfig,
    s2s_beam_search,
    tile_for_beam,
)
from summarymixing_tpu.frontend.features import Fbank
from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.ops.masks import length_to_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--secs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=64)
    args = ap.parse_args()

    vocab = 5000
    asr = TransformerASR(
        tgt_vocab=vocab, input_size=640, d_model=512, nhead=1,
        num_encoder_layers=18, num_decoder_layers=6, d_ffn=2048,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=3072,
        kernel_size=31, local_proj_hid_dim=(512,), local_proj_out_dim=512,
        summary_hid_dim=(512,), summary_out_dim=512, dropout_rate=0.0,
        dtype=jnp.bfloat16,
    )
    model = SpeechRecognizer(asr=asr, vocab_size=vocab, dtype=jnp.bfloat16)
    fbank = Fbank()

    sr = 16000
    n = args.secs * sr
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((args.batch, n)).astype(np.float32))
    wav_lens = jnp.full((args.batch,), n, jnp.int32)
    feats = fbank(wav)
    feat_lens = fbank.frame_lengths(wav_lens)
    dummy_tgt = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats[:1], feat_lens[:1],
                        dummy_tgt)

    bc = S2SBeamConfig(
        beam_size=args.beam, ctc_weight=0.4, lm_weight=0.0,
        max_length=args.max_tokens, min_steps=1,
    )

    @jax.jit
    def decode(params, wav, wav_lens, carry):
        feats = fbank(wav + carry * 1e-12)
        feat_lens = fbank.frame_lengths(wav_lens)
        enc_out, enc_lens = model.apply(params, feats, feat_lens,
                                        method=model.encode)
        ctc_lp = model.apply(params, enc_out, method=model.ctc_head)
        enc_t = tile_for_beam(enc_out, args.beam)
        len_t = tile_for_beam(enc_lens, args.beam)
        ctc_t = tile_for_beam(ctc_lp, args.beam)
        enc_pad = length_to_mask(len_t, enc_t.shape[1])
        cache = model.apply(params, enc_t, bc.max_length + 1,
                            method=model.decode_cache_init)

        def step(last_tok, step_i, cache):
            return model.apply(params, last_tok, step_i, cache, enc_pad,
                               method=model.decode_step_cached)

        toks, lens, scores = s2s_beam_search(step, enc_t, len_t, ctc_t, bc,
                                             cache=cache)
        return jnp.sum(toks).astype(jnp.float32)

    t0 = time.perf_counter()
    float(decode(params, wav, wav_lens, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0

    def chain(k):
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        for _ in range(k):
            c = decode(params, wav, wav_lens, c * 0.0)
        float(c)
        return time.perf_counter() - t0

    est = max(chain(3) / 3, 1e-3)
    k1 = max(2, int(0.5 / est))
    k2 = k1 + max(5, int(3.0 / est))
    t1, t2 = chain(k1), chain(k2)
    per = (t2 - t1) / (k2 - k1)
    print(json.dumps({
        "metric": "beam_decode_throughput",
        "audio_s_per_s": round(args.batch * args.secs / per, 1),
        "per_batch_ms": round(per * 1e3, 2),
        "beam": args.beam,
        "batch": args.batch,
        "utt_secs": args.secs,
        "max_tokens": args.max_tokens,
        "compile_s": round(compile_s, 1),
        "note": "encoder + CTC head + KV-cached joint CTC/attention beam",
    }))


if __name__ == "__main__":
    main()
