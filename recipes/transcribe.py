"""Batch transcription CLI: wav files in, transcripts out — the serving
counterpart of recipes/evaluate.py (no reference transcripts needed).

Covers the deployment use the reference delegates to SpeechBrain's
`EncoderDecoderASR.transcribe_file` interface (the published models'
README usage): load a trained run (checkpoint + persisted tokenizer),
batch the wavs, fbank -> normalize -> encode -> greedy CTC (attention
recipes, TransformerASR.py:501-560) or transducer greedy decode
(TransformerASR.py:687-741 EncoderWrapper contract).

Usage:
  python recipes/transcribe.py <recipe.yaml> --ckpt results/.../save \
      wav1.wav wav2.wav [--avg 10] [--batch-size 8] [--output out.jsonl]

Prints one JSON line per utterance: {"wav": ..., "text": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import evaluate as _eval  # noqa: E402  (same dir; sets the compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from summarymixing_tpu.config import build_model, load_recipe  # noqa: E402
from summarymixing_tpu.data.dataio import load_wav  # noqa: E402
from summarymixing_tpu.parallel.mesh import make_mesh  # noqa: E402
from summarymixing_tpu.training.optim import make_adamw  # noqa: E402


def _batches(paths, sample_rate, batch_size, pad_quantum):
    """Yield (paths, wav [B, N], wav_lens [B]) with N rounded up to
    `pad_quantum` samples so near-equal batches share one compiled shape.
    Wavs are sorted by length to minimise padding waste."""
    loaded = [(p, load_wav(p, expected_rate=sample_rate)) for p in paths]
    loaded.sort(key=lambda pw: len(pw[1]), reverse=True)
    for i in range(0, len(loaded), batch_size):
        chunk = loaded[i:i + batch_size]
        while len(chunk) < batch_size:  # repeat-pad the last batch
            chunk.append(chunk[-1])
        n = max(len(w) for _, w in chunk)
        n = ((n + pad_quantum - 1) // pad_quantum) * pad_quantum
        wav = np.zeros((batch_size, n), np.float32)
        lens = np.zeros((batch_size,), np.int32)
        for j, (_, w) in enumerate(chunk):
            wav[j, : len(w)] = w
            lens[j] = len(w)
        yield ([p for p, _ in chunk], jnp.asarray(wav), jnp.asarray(lens))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("wavs", nargs="+", help="wav files to transcribe")
    ap.add_argument("--ckpt", required=True, help="checkpoint (save) dir")
    ap.add_argument("--avg", type=int, default=0,
                    help="average the last N checkpoints")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--output", default=None, help="write JSONL here too")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any recipe value by dotted path, e.g. "
                         "--set training.lr_adam=0.0005 --set model.remat=true")
    args = ap.parse_args()

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe,
                      overrides=parse_overrides(args.overrides))
    tokenizer = _eval.resolve_tokenizer(cfg, _eval.run_dir_of(args.ckpt))
    model, fbank, td_model = build_model(cfg)
    mesh = make_mesh(devices=jax.devices()[:1])
    sr = cfg.features.sample_rate
    pad_quantum = sr // 2

    batches = list(_batches(args.wavs, sr, args.batch_size, pad_quantum))
    dummy_tokens = jnp.ones((args.batch_size, 4), jnp.int32)
    dummy_lens = jnp.full((args.batch_size,), 4, jnp.int32)

    def make_batch(wav, lens):
        return {"wav": wav, "wav_lens": lens,
                "tokens": dummy_tokens, "token_lens": dummy_lens}

    example = make_batch(batches[0][1], batches[0][2])
    results = {}
    t0 = time.time()

    if td_model is not None:
        from summarymixing_tpu.decoding.transducer_search import (
            transducer_greedy_decode,
        )

        # the shared eval trainer, NOT a hand-rolled one: it plumbs
        # transducer.joint_chunk, which a recipe may need to fit the
        # joint in HBM at eval time too
        trainer = _eval.make_transducer_eval_trainer(cfg, model, td_model,
                                                     fbank, mesh)
        state = _eval.restore_eval_state(
            trainer.init_state(jax.random.PRNGKey(0), example),
            args.ckpt, args.avg)
        bound = td_model.bind({"params": state["params"]["transducer"]})
        for paths, wav, lens in batches:
            _, (enc_out, enc_lens) = trainer.eval_step(
                state, make_batch(wav, lens))
            toks, tok_lens = transducer_greedy_decode(
                bound.encode_proj(enc_out), enc_lens,
                bound.predictor_init, bound.predictor_step, bound.joint_step,
                blank_id=cfg.model.blank_index,
            )
            toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
            for i, p in enumerate(paths):
                results.setdefault(
                    p, tokenizer.decode(toks[i, : tok_lens[i]]))
    else:
        from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig

        trainer = ASRTrainer(
            model, make_adamw(1e-4), fbank,
            TrainerConfig(ctc_weight=cfg.training.ctc_weight, augment=None,
                          blank_id=cfg.model.blank_index,
                          bos_id=cfg.model.bos_index,
                          eos_id=cfg.model.eos_index),
            mesh=mesh,
        )
        state = _eval.restore_eval_state(
            trainer.init_state(jax.random.PRNGKey(0), example),
            args.ckpt, args.avg)
        for paths, wav, lens in batches:
            _, hyps = trainer.eval_step(state, make_batch(wav, lens))
            for i, p in enumerate(paths):
                results.setdefault(p, tokenizer.decode(hyps[i]))

    lines = [json.dumps({"wav": p, "text": results[p]}) for p in args.wavs]
    print("\n".join(lines))
    print(json.dumps({"utterances": len(args.wavs),
                      "wall_s": round(time.time() - t0, 1)}),
          file=sys.stderr)
    if args.output:
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
