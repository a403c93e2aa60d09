"""Export a trained run as a portable AOT inference artifact.

Serializes the whole inference graph — fbank -> normalize -> encoder ->
greedy decode (CTC collapse for attention recipes, the batched
transducer greedy scan for transducer recipes) — with the trained
weights baked in, via jax.export (utils/export.py). The resulting
single file transcribes audio with NO recipe config, model code or
checkpoint directory — the deployment-side replacement for the
reference's Pretrainer + pickled-module flow (reference yaml:353-360).

Usage:
  python recipes/export_model.py <recipe.yaml> --ckpt results/run/save \
      --output model.smtexp [--avg 10] [--fixed B N] [--check]

Load side:
  from summarymixing_tpu.utils.export import ExportedASR
  asr = ExportedASR.load("model.smtexp")
  print(asr.transcribe(wav))          # wav: float32 [-1, 1] @ 16 kHz
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import evaluate as _eval  # noqa: E402  (same dir; sets the compile cache)
import jax  # noqa: E402
import numpy as np  # noqa: E402

from summarymixing_tpu.config import build_model, load_recipe  # noqa: E402
from summarymixing_tpu.frontend.features import InputNormalization  # noqa: E402
from summarymixing_tpu.parallel.mesh import make_mesh  # noqa: E402
from summarymixing_tpu.training.optim import make_adamw  # noqa: E402
from summarymixing_tpu.training.trainer import (  # noqa: E402
    ASRTrainer,
    TrainerConfig,
)
from summarymixing_tpu.utils.export import (  # noqa: E402
    ExportedASR,
    export_ctc_infer,
    make_ctc_infer_fn,
    save_artifact,
)


def vocab_list(tokenizer) -> list:
    """id -> piece table (reserved ids 0-3 map to '')."""
    out = [""] * tokenizer.vocab_size
    if hasattr(tokenizer, "vocab"):          # CharTokenizer
        for piece, i in tokenizer.vocab.items():
            out[i] = piece
    elif hasattr(tokenizer, "_id_of"):        # SubwordTokenizer
        for piece, i in tokenizer._id_of.items():
            out[i] = piece
    elif hasattr(tokenizer, "sp"):            # SentencePieceTokenizer
        for i in range(tokenizer.vocab_size):
            out[i] = tokenizer.sp.id_to_piece(i)
    else:
        raise SystemExit(
            f"don't know how to extract a vocab from {type(tokenizer)}; "
            "the artifact would decode every utterance to ''")
    return out


def export_streaming_artifact(args, cfg, model, td_model, fbank,
                              normalizer, state, tokenizer):
    """--streaming: serialize the chunked init/step pair (raw audio in,
    incremental tokens out; streaming.py module doc for geometry and the
    one-chunk output lag)."""
    import jax.numpy as jnp

    from summarymixing_tpu.streaming import (
        make_streaming_infer_fns,
        run_stream,
    )
    from summarymixing_tpu.utils.export import (
        ExportedStreamingASR,
        export_streaming,
    )

    init_fn, step_fn, info = make_streaming_infer_fns(
        model, td_model, fbank, normalizer, state["params"],
        state["norm_stats"], chunk_frames=args.chunk_frames,
        left_context_chunks=args.left_context,
        blank_id=cfg.model.blank_index)
    payloads = export_streaming(
        init_fn, step_fn, info["chunk_samples"],
        fixed_batch=args.fixed[0] if args.fixed else None)
    meta = {
        "recipe": cfg.name,
        "family": "transducer_streaming",
        "sample_rate": cfg.features.sample_rate,
        "token_type": ("char" if cfg.tokenizer_type == "char"
                       else cfg.token_type),
        "vocab": vocab_list(tokenizer),
        "polymorphic": args.fixed is None,
        **info,
    }
    save_artifact(args.output, payloads, meta)
    total = sum(len(v) for v in payloads.values())
    print(f"exported streaming artifact ({total / 1e6:.1f} MB, "
          f"chunk {info['chunk_samples']} samples = "
          f"{args.chunk_frames} enc frames, left ctx "
          f"{args.left_context} chunks) -> {args.output}")

    if args.check:
        art = ExportedStreamingASR.load(args.output)
        rng = np.random.default_rng(0)
        # a --fixed export only accepts its fixed batch size
        b = args.fixed[0] if args.fixed else 2
        n = 3 * info["chunk_samples"] + 1000
        wav = rng.standard_normal((b, n)).astype(np.float32) * 0.1
        lens = np.full((b,), n, np.int32)
        if b > 1:
            lens[1] = n - 1500   # one ragged row exercises nv masking
        got = art.transcribe(wav, lens)
        toks, tl = run_stream(init_fn, step_fn, jnp.asarray(wav),
                              jnp.asarray(lens), info["chunk_samples"])
        toks, tl = np.asarray(toks), np.asarray(tl)
        vocab = meta["vocab"]
        ref = ["".join(vocab[t] for t in toks[i, : tl[i]]
                       if 0 <= t < len(vocab)) for i in range(b)]
        if meta["token_type"] != "char":
            ref = [r.replace("▁", " ").strip() for r in ref]
        assert got == ref, (got, ref)
        print("check ok: streaming artifact == live step fns on", wav.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--ckpt", required=True, help="checkpoint (save) dir")
    ap.add_argument("--output", required=True, help="artifact path")
    ap.add_argument("--avg", type=int, default=0,
                    help="average the last N checkpoints first")
    ap.add_argument("--fixed", nargs=2, type=int, metavar=("B", "N"),
                    help="export one static (batch, samples) shape "
                         "instead of the polymorphic default")
    ap.add_argument("--streaming", action="store_true",
                    help="export a STREAMING artifact (transducer recipes "
                         "only): init/step functions with carried state — "
                         "raw audio chunks in, incremental tokens out "
                         "(summarymixing_tpu/streaming.py)")
    ap.add_argument("--chunk-frames", type=int, default=16,
                    help="encoder frames per streaming chunk (40 ms each)")
    ap.add_argument("--left-context", type=int, default=4,
                    help="left-context CHUNKS carried across steps")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and compare against the "
                         "live model on random audio")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides")
    args = ap.parse_args()

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe, overrides=parse_overrides(args.overrides))
    tokenizer = _eval.resolve_tokenizer(cfg, _eval.run_dir_of(args.ckpt))
    model, fbank, td_model = build_model(cfg)
    mesh = make_mesh(devices=jax.devices()[:1])
    sr = cfg.features.sample_rate

    import jax.numpy as jnp

    example = {
        "wav": jnp.zeros((2, sr), jnp.float32),
        "wav_lens": jnp.full((2,), sr, jnp.int32),
        "tokens": jnp.ones((2, 4), jnp.int32),
        "token_lens": jnp.full((2,), 4, jnp.int32),
    }
    normalizer = InputNormalization(
        update_until_epoch=cfg.features.normalize_update_until_epoch)

    if td_model is not None:
        from summarymixing_tpu.utils.export import make_transducer_infer_fn

        trainer = _eval.make_transducer_eval_trainer(cfg, model, td_model,
                                                     fbank, mesh)
        state = _eval.restore_eval_state(
            trainer.init_state(jax.random.PRNGKey(0), example),
            args.ckpt, args.avg)
        if args.streaming:
            return export_streaming_artifact(args, cfg, model, td_model,
                                             fbank, normalizer, state,
                                             tokenizer)
        infer = make_transducer_infer_fn(
            model, td_model, fbank, normalizer,
            state["params"], state["norm_stats"],
            blank_id=cfg.model.blank_index)
        family = "transducer"
    else:
        if args.streaming:
            raise SystemExit(
                "--streaming requires a transducer recipe (the attention "
                "recipes' encoder is not chunk-trained; reference "
                "Branchformer.py:469-471 rejects DCT too)")
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
        infer = make_ctc_infer_fn(model, fbank, normalizer,
                                  state["params"], state["norm_stats"],
                                  blank_id=cfg.model.blank_index)
        family = "ctc"
    payload = export_ctc_infer(
        infer, fixed_shape=tuple(args.fixed) if args.fixed else None)
    meta = {
        "recipe": cfg.name,
        "family": family,
        "sample_rate": sr,
        "blank_id": cfg.model.blank_index,
        "time_multiple": 320,
        "token_type": ("char" if cfg.tokenizer_type == "char"
                       else cfg.token_type),
        "vocab": vocab_list(tokenizer),
        "polymorphic": args.fixed is None,
    }
    save_artifact(args.output, payload, meta)
    print(f"exported {len(payload) / 1e6:.1f} MB payload -> {args.output} "
          f"({'polymorphic' if args.fixed is None else 'fixed ' + str(args.fixed)})")

    if args.check:
        asr = ExportedASR.load(args.output)
        rng = np.random.default_rng(0)
        b, n = args.fixed if args.fixed else (3, sr * 2)
        wav = rng.standard_normal((b, n)).astype(np.float32) * 0.1
        lens = np.full((b,), n, np.int32)
        got = asr(wav, lens)
        ref = jax.jit(infer)(jnp.asarray(wav), jnp.asarray(lens))
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        print("check ok: artifact == live model on", wav.shape)


if __name__ == "__main__":
    main()
