"""Joint CTC/attention beam-search decode throughput on one chip — the
reference's test-time configuration (beam width configurable; reference uses
10 valid / 66 test, yaml:140-141) with the KV-cached decoder.

Usage: python benchmarks/beam_bench.py [--beam 10] [--secs 30] [--batch 4]
Prints one JSON line.

Blank-skip compaction comparison (--compare --peaky-blank 0.98
--blank-skip 0.95 --frame-cap 150): injects a synthetic peaky CTC head
(trained CTC heads put almost all mass on blank for most frames; the
untrained bench model does not, so compaction would be a no-op on it)
and measures the full vs compacted prefix scorer back to back in one
invocation, with eos suppressed (min_steps = max_tokens) so both runs
execute the identical number of decode steps. WER-neutrality of the
compaction itself is validated on the trained synthetic-corpus model
(tests + recipes/evaluate.py), not here."""

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
    ap.add_argument("--min-steps", type=int, default=1)
    ap.add_argument("--blank-skip", type=float, default=0.0,
                    help="blank-skip threshold for the CTC prefix scorer "
                         "(0 = off)")
    ap.add_argument("--frame-cap", type=int, default=0,
                    help="kept-frame cap for compaction (0 -> T//4)")
    ap.add_argument("--peaky-blank", type=float, default=0.0,
                    help="replace the untrained CTC head with a synthetic "
                         "peaky one: this blank prob on non-spike frames")
    ap.add_argument("--spike-rate", type=float, default=0.15,
                    help="fraction of frames that are token spikes under "
                         "--peaky-blank")
    ap.add_argument("--compare", action="store_true",
                    help="measure full vs compacted scorer back to back")
    ap.add_argument("--compare-padding", action="store_true",
                    help="measure the scorer's scan-friendly time-axis "
                         "padding (RESULTS.md 'scorer time-axis geometry') "
                         "end to end: raw T vs padded T, back to back in "
                         "one invocation (the raw variant disables "
                         "_pad_time_axis during tracing)")
    ap.add_argument("--materialize-states", action="store_true",
                    help="A/B: use the original materialise-then-gather "
                         "CTC prefix states (ctc_defer_states=False) "
                         "instead of the default score-only + "
                         "rebuild-selected path")
    ap.add_argument("--lm", action="store_true",
                    help="add TransformerLM (768d/12L) shallow fusion at "
                         "lm_weight 0.60 — the reference's full test-decode "
                         "scorer stack (yaml:233-246)")
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

    lm_step = lm_make_cache = None
    if args.lm:
        from summarymixing_tpu.models.lm import TransformerLM

        lm = TransformerLM(vocab=vocab, d_model=768, nhead=12,
                           num_layers=12, d_ffn=3072, dtype=jnp.bfloat16)
        lm_params = lm.init(jax.random.PRNGKey(1), dummy_tgt)

        def lm_make_cache(n_rows, max_len):
            return lm.apply(lm_params, n_rows, max_len,
                            method=lm.init_cache)

        def lm_step(last_tok, step_i, cache):
            logits, cache = lm.apply(lm_params, last_tok, step_i, cache,
                                     method=lm.step)
            return jax.nn.log_softmax(logits / 1.15, axis=-1), cache

    bc = S2SBeamConfig(
        beam_size=args.beam, ctc_weight=0.4,
        lm_weight=0.60 if args.lm else 0.0,
        max_length=args.max_tokens, min_steps=args.min_steps,
        ctc_defer_states=not args.materialize_states,
    )

    peaky_lp = None
    if args.peaky_blank > 0.0:
        # trained-CTC-head stand-in: most frames blank-certain, a
        # spike-rate fraction put ~90% mass on one token. eval_shape:
        # only the static encoder length is needed — an actual encode
        # here would compile a distinct program (minutes on the tunnel)
        # and run a full forward for a shape
        t_enc = int(jax.eval_shape(
            lambda p, f, fl: model.apply(p, f, fl, method=model.encode),
            params, feats, feat_lens)[0].shape[1])
        probs = np.full((args.batch, t_enc, vocab),
                        (1.0 - args.peaky_blank) / (vocab - 1))
        probs[:, :, 0] = args.peaky_blank
        stride = max(int(round(1.0 / args.spike_rate)), 1)
        spike_t = np.arange(0, t_enc, stride)
        for bi in range(args.batch):
            toks = rng.integers(3, vocab, size=len(spike_t))
            for t, tok in zip(spike_t, toks):
                probs[bi, t, :] = 0.1 / (vocab - 1)
                probs[bi, t, tok] = 0.9
        probs /= probs.sum(-1, keepdims=True)
        peaky_lp = jnp.asarray(np.log(probs), jnp.float32)

    def make_decode(blank_skip: float, frame_cap: int):
        @jax.jit
        def decode(params, wav, wav_lens, carry):
            feats = fbank(wav + carry * 1e-12)
            feat_lens = fbank.frame_lengths(wav_lens)
            enc_out, enc_lens = model.apply(params, feats, feat_lens,
                                            method=model.encode)
            ctc_lp = model.apply(params, enc_out, method=model.ctc_head)
            if peaky_lp is not None:
                ctc_lp = peaky_lp + 0.0 * ctc_lp
            scorer_lens = enc_lens
            if blank_skip > 0.0:
                from summarymixing_tpu.decoding.ctc_prefix import (
                    compact_blank_frames,
                )

                cap = frame_cap or max(ctc_lp.shape[1] // 4, 1)
                ctc_lp, scorer_lens, _ = compact_blank_frames(
                    ctc_lp, enc_lens, 0, cap, blank_skip)
            # nothing encoder-sized is beam-tiled: ctc_lp stays [B, T, V]
            # (scorer row-maps by n // beam) and the decode cache keeps
            # cross-attention K/V per-utterance (rows=N only for the
            # per-hypothesis self-attn state)
            n_rows = enc_out.shape[0] * args.beam
            scorer_len_t = tile_for_beam(scorer_lens, args.beam)
            enc_pad = length_to_mask(enc_lens, enc_out.shape[1])
            cache = model.apply(params, enc_out, bc.max_length + 1, n_rows,
                                method=model.decode_cache_init)
            lm_cache = (lm_make_cache(n_rows, bc.max_length + 1)
                        if lm_step is not None else None)

            def step(last_tok, step_i, cache):
                return model.apply(params, last_tok, step_i, cache, enc_pad,
                                   method=model.decode_step_cached)

            toks, lens, scores = s2s_beam_search(
                step, enc_out, scorer_len_t, ctc_lp, bc, cache=cache,
                lm_step_fn=lm_step, lm_cache=lm_cache)
            return jnp.sum(toks).astype(jnp.float32)

        return decode

    def measure(decode):
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
        return per, compile_s

    result = {
        "metric": "beam_decode_throughput",
        "beam": args.beam,
        "batch": args.batch,
        "utt_secs": args.secs,
        "max_tokens": args.max_tokens,
        "min_steps": args.min_steps,
        "peaky_blank": args.peaky_blank,
        "lm_fusion": bool(args.lm),
        "note": "encoder + CTC head + KV-cached joint CTC/attention beam"
                + (" + TransformerLM 768d/12L @ 0.60" if args.lm else ""),
    }
    if args.compare_padding:
        import summarymixing_tpu.decoding.ctc_prefix as _cp

        orig_pad = _cp._pad_time_axis
        try:
            # identity padding at trace time -> the pre-padding graph
            _cp._pad_time_axis = lambda n: n
            per_raw, c_raw = measure(make_decode(0.0, 0))
        finally:
            _cp._pad_time_axis = orig_pad
        per_pad, c_pad = measure(make_decode(0.0, 0))
        result.update({
            "per_batch_ms_raw_T": round(per_raw * 1e3, 2),
            "per_batch_ms_padded_T": round(per_pad * 1e3, 2),
            "audio_s_per_s_raw": round(args.batch * args.secs / per_raw, 1),
            "audio_s_per_s_padded": round(
                args.batch * args.secs / per_pad, 1),
            "speedup": round(per_raw / per_pad, 3),
            "compile_s": round(c_raw + c_pad, 1),
        })
        print(json.dumps(result))
        return
    if args.compare:
        per_full, c_full = measure(make_decode(0.0, 0))
        per_skip, c_skip = measure(
            make_decode(args.blank_skip or 0.95, args.frame_cap))
        result.update({
            "per_batch_ms_full": round(per_full * 1e3, 2),
            "per_batch_ms_blank_skip": round(per_skip * 1e3, 2),
            "audio_s_per_s_full": round(args.batch * args.secs / per_full, 1),
            "audio_s_per_s_blank_skip": round(
                args.batch * args.secs / per_skip, 1),
            "speedup": round(per_full / per_skip, 3),
            "blank_skip": args.blank_skip or 0.95,
            "frame_cap": args.frame_cap,
            "compile_s": round(c_full + c_skip, 1),
        })
    else:
        per, compile_s = measure(make_decode(args.blank_skip,
                                             args.frame_cap))
        result.update({
            "audio_s_per_s": round(args.batch * args.secs / per, 1),
            "per_batch_ms": round(per * 1e3, 2),
            "blank_skip": args.blank_skip,
            "compile_s": round(compile_s, 1),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
