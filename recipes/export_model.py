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
    return out


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
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and compare against the "
                         "live model on random audio")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides")
    args = ap.parse_args()

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe, overrides=parse_overrides(args.overrides))
    tokenizer = _eval.resolve_tokenizer(cfg, os.path.dirname(args.ckpt))
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
        from summarymixing_tpu.training.transducer_trainer import (
            TransducerTrainer,
            TransducerTrainerConfig,
        )
        from summarymixing_tpu.utils.export import make_transducer_infer_fn

        trainer = TransducerTrainer(
            model, td_model, make_adamw(1e-4), fbank,
            TransducerTrainerConfig(ctc_weight=cfg.training.ctc_weight,
                                    blank_id=cfg.model.blank_index,
                                    augment=None, dct=None),
            mesh=mesh,
        )
        state = _eval.restore_eval_state(
            trainer.init_state(jax.random.PRNGKey(0), example),
            args.ckpt, args.avg)
        infer = make_transducer_infer_fn(
            model, td_model, fbank, normalizer,
            state["params"], state["norm_stats"],
            blank_id=cfg.model.blank_index)
        family = "transducer"
    else:
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
