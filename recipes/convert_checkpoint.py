"""Convert a reference (SpeechBrain/torch) checkpoint into an orbax run
directory consumable by recipes/evaluate.py / transcribe.py.

This is the CLI around utils/convert.py's full-model converters (whose
numerics are pinned against clean-room torch oracles in
tests/test_convert_full.py): it maps the torch `model.ckpt` state dict —
the ModuleList [CNN, Transformer, seq_lin, ctc_lin] of reference
branchformer_summarymixing.yaml:214-215, or the transducer ModuleList of
transducer yaml:369-370 — onto the recipe's flax parameter tree and
saves it as a checkpoint, so evaluating a reference-trained model is:

  python recipes/convert_checkpoint.py recipe.yaml \\
      --torch-ckpt save/.../model.ckpt \\
      [--norm-ckpt save/.../normalizer.ckpt] \\
      [--tokenizer path/to/tokenizer.(json|model|ckpt)] \\
      [--lm-ckpt save/.../lm.ckpt] \\
      --output converted_run
  python recipes/evaluate.py recipe.yaml --test-manifest test.csv \\
      --ckpt converted_run/save [--beam] [--lm-ckpt converted_run/lm]

or, pointing at a whole reference-format checkpoint directory (the
Pretrainer's collect_in layout {model.ckpt, lm.ckpt, tokenizer.ckpt,
normalizer.ckpt}, reference yaml:349-360):

  python recipes/convert_checkpoint.py recipe.yaml \\
      --ref-dir downloaded_save_dir --output converted_run

--lm-ckpt converts the published fusion LM — the SpeechBrain
TransformerLM for the attention recipes (utils/convert.py::
convert_transformer_lm) or the RNNLM for the transducer recipes
(convert_rnnlm) — into <output>/lm (checkpoint + lm_config.json), the
layout train.py/evaluate.py's --lm-ckpt fusion loader consumes. A
sentencepiece tokenizer.ckpt is recognised by content (ModelProto) and
placed as tokenizer.model, which loads through the pure-python reader
(data/sentencepiece_model.py) — no sentencepiece wheel needed.

--norm-ckpt maps the reference InputNormalization statistics
(glob_mean/glob_std, speechbrain normalization.py _save/_load format)
onto the Welford NormStats the frontend carries; without it the features
are normalized with zero stats and WER will be garbage — a warning says
so."""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _env  # noqa: E402,F401  (same dir: platform + compile-cache bootstrap)
import jax  # noqa: E402
import jax.numpy as jnp
import numpy as np

from summarymixing_tpu.config import build_model, load_recipe
from summarymixing_tpu.frontend.features import NormStats
from summarymixing_tpu.training.checkpoint import CheckpointManager
from summarymixing_tpu.utils.convert import (
    TrackedStateDict,
    consumption_report,
    convert_full_model,
    convert_transducer_model,
    load_torch_checkpoint,
)


def _check_consumption(sd: TrackedStateDict, what: str, show_report: bool,
                       allow_unconsumed: bool) -> None:
    """Key-consumption strictness (reference Pretrainer contract,
    yaml:349-360): every non-buffer key of the real checkpoint must have
    been read by the converter, else the converted model silently
    diverges from the original — fail loud instead."""
    rep = consumption_report(sd)
    if show_report:
        print(f"--- {what} key-consumption report ---")
        for kind in ("consumed", "ignored", "unconsumed"):
            print(f"{kind} ({len(rep[kind])}):")
            for k in rep[kind]:
                print(f"  {k}")
    summary = (f"{what}: consumed {len(rep['consumed'])} keys, ignored "
               f"{len(rep['ignored'])} buffers, "
               f"{len(rep['unconsumed'])} unconsumed")
    if rep["unconsumed"]:
        msg = (summary + " — the state dict contains parameters the "
               "converter did not map: "
               + ", ".join(rep["unconsumed"][:20])
               + (" ..." if len(rep["unconsumed"]) > 20 else ""))
        if not allow_unconsumed:
            raise SystemExit(
                "ERROR: " + msg + "\n(re-run with --allow-unconsumed to "
                "convert anyway, --report for the full key lists)")
        print("WARNING:", msg)
    else:
        print(summary)


def norm_stats_from_reference(path: str, n_mels: int) -> dict:
    """Map a reference normalizer.ckpt (torch dict with glob_mean /
    glob_std and a count) onto Welford NormStats: m2 = var * count."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    mean = np.asarray(sd["glob_mean"], np.float32).reshape(-1)
    std = np.asarray(sd["glob_std"], np.float32).reshape(-1)
    count = float(np.asarray(sd.get("count", 1e8)))
    if mean.shape[0] != n_mels:
        raise SystemExit(
            f"normalizer stats have {mean.shape[0]} dims, recipe n_mels "
            f"is {n_mels}"
        )
    return {
        "count": jnp.asarray(count, jnp.float32),
        "mean": jnp.asarray(mean),
        "m2": jnp.asarray(std.astype(np.float64) ** 2 * count, jnp.float32),
    }


def convert_lm_ckpt(cfg, lm_path: str, out_dir: str, is_transducer: bool,
                    show_report: bool = False,
                    allow_unconsumed: bool = False):
    """Convert a published lm.ckpt into <out_dir>/lm: an orbax checkpoint
    ({"params": ...}) plus lm_config.json with the architecture inferred
    from the weights, i.e. exactly what train.py::_restore_lm loads for
    shallow fusion (reference Pretrainer loadables lm:, yaml:353-360).

    Dims that are visible in the weights (d_model/layers/d_ffn, LSTM
    sizes) are inferred; nhead is NOT recoverable from a fused qkv
    projection, so it comes from the recipe's lm: block (the LMConfig
    default, 12, is the published 768d LM's value, yaml:185)."""
    import dataclasses
    import json as _json

    from summarymixing_tpu.config.schema import LMConfig
    from summarymixing_tpu.utils.convert import (
        convert_rnnlm,
        convert_transformer_lm,
    )

    sd = TrackedStateDict(load_torch_checkpoint(lm_path))
    base = dataclasses.asdict(cfg.lm) if cfg.lm else dataclasses.asdict(
        LMConfig(model_type="rnn" if is_transducer else "transformer"))
    if is_transducer:
        params = convert_rnnlm(sd)
        n_lstm = sum(1 for k in params if k.startswith("lstm_"))
        base.update(
            model_type="rnn",
            embedding_dim=int(params["emb"]["embedding"].shape[1]),
            rnn_layers=n_lstm,
            rnn_neurons=int(params["lstm_0"]["hi"]["kernel"].shape[0]),
            dnn_neurons=int(params["dnn"]["kernel"].shape[1]),
        )
    else:
        params = convert_transformer_lm(sd)
        base.update(
            model_type="transformer",
            output_proj=params.pop("__output_proj__"),
            d_model=int(params["emb"]["emb"]["embedding"].shape[1]),
            num_layers=sum(1 for k in params["encoder"]
                           if k.startswith("layer_")),
            d_ffn=int(params["encoder"]["layer_0"]["pos_ffn"]["ffn_in"]
                      ["kernel"].shape[1]),
        )
    _check_consumption(sd, "lm.ckpt", show_report, allow_unconsumed)
    lm_dir = os.path.join(out_dir, "lm")
    os.makedirs(lm_dir, exist_ok=True)
    CheckpointManager(os.path.join(lm_dir, "save")).save(
        0, {"params": jax.tree.map(jnp.asarray, params)}, force=True)
    with open(os.path.join(lm_dir, "lm_config.json"), "w") as f:
        _json.dump(base, f, indent=1)
    n = sum(int(np.asarray(p).size) for p in jax.tree.leaves(params))
    print(f"converted LM ({base['model_type']}, {n:,} params) -> {lm_dir} "
          f"(fuse with --lm-ckpt {lm_dir})")


def _is_sentencepiece_model(path: str) -> bool:
    from summarymixing_tpu.data.sentencepiece_model import parse_model_proto

    try:
        with open(path, "rb") as f:
            return len(parse_model_proto(f.read())) > 0
    except Exception:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference model.ckpt (torch state dict)")
    ap.add_argument("--ref-dir", default=None,
                    help="reference checkpoint directory (Pretrainer "
                         "collect_in layout): picks up model.ckpt, "
                         "lm.ckpt, tokenizer.ckpt, normalizer.ckpt")
    ap.add_argument("--norm-ckpt", default=None,
                    help="reference normalizer.ckpt (InputNormalization "
                         "glob stats)")
    ap.add_argument("--lm-ckpt", default=None,
                    help="reference lm.ckpt (TransformerLM for attention "
                         "recipes, RNNLM for transducer recipes) -> "
                         "<output>/lm fusion run dir")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer file to place in the run dir "
                         "(tokenizer.json from data/subword.py, a "
                         "sentencepiece tokenizer.model/.ckpt, or a "
                         "tokenizer_vocab.json char map)")
    ap.add_argument("--output", required=True, help="run directory to write")
    ap.add_argument("--report", action="store_true",
                    help="print the full consumed/ignored/unconsumed "
                         "state-dict key lists")
    ap.add_argument("--allow-unconsumed", action="store_true",
                    help="downgrade unconsumed-key failures to warnings "
                         "(by default any non-buffer key the converter "
                         "did not read aborts the conversion)")
    args = ap.parse_args()

    if args.ref_dir:
        def _pick(current, name):
            p = os.path.join(args.ref_dir, name)
            return current or (p if os.path.exists(p) else None)

        args.torch_ckpt = _pick(args.torch_ckpt, "model.ckpt")
        args.lm_ckpt = _pick(args.lm_ckpt, "lm.ckpt")
        args.norm_ckpt = _pick(args.norm_ckpt, "normalizer.ckpt")
        args.tokenizer = _pick(args.tokenizer, "tokenizer.ckpt")
    if not args.torch_ckpt:
        raise SystemExit("need --torch-ckpt (or --ref-dir with model.ckpt)")

    cfg = load_recipe(args.recipe)
    model, fbank, td_model = build_model(cfg)
    sd = TrackedStateDict(load_torch_checkpoint(args.torch_ckpt))

    m = cfg.model
    if td_model is not None:
        params = convert_transducer_model(
            sd, nhead=m.nhead, mode=m.mode,
            num_encoder_layers=m.num_encoder_layers,
        )
    else:
        params = convert_full_model(
            sd, nhead=m.nhead, mode=m.mode,
            num_encoder_layers=m.num_encoder_layers,
            num_decoder_layers=m.num_decoder_layers,
        )
    _check_consumption(sd, "model.ckpt", args.report, args.allow_unconsumed)

    if args.norm_ckpt:
        norm_stats = norm_stats_from_reference(args.norm_ckpt,
                                               cfg.features.n_mels)
    else:
        print("WARNING: no --norm-ckpt given — saving ZERO input-"
              "normalization stats; decode quality will be wrong unless "
              "the training run did not normalize")
        norm_stats = NormStats.init(cfg.features.n_mels)

    state = {
        "params": jax.tree.map(jnp.asarray, params),
        "norm_stats": norm_stats,
        # a converted model is fully trained: freeze the normalizer
        "step": jnp.asarray(10 ** 9, jnp.int32),
        "epoch": jnp.asarray(10 ** 6, jnp.int32),
    }

    os.makedirs(args.output, exist_ok=True)
    save_dir = os.path.join(args.output, "save")
    CheckpointManager(save_dir).save(0, state, force=True)

    if args.tokenizer:
        base = os.path.basename(args.tokenizer)
        if base not in ("tokenizer.json", "tokenizer.model",
                        "tokenizer_vocab.json"):
            ext = os.path.splitext(base)[1]
            if ext == ".model" or _is_sentencepiece_model(args.tokenizer):
                # content sniffing covers the Pretrainer's tokenizer.ckpt
                # (a sentencepiece ModelProto under a .ckpt name)
                base = "tokenizer.model"
            elif ext == ".json":
                # disambiguate by content: a subword tokenizer carries
                # "pieces" (data/subword.py save format); a bare dict is
                # the char id map — naming it tokenizer.json would make
                # resolve_tokenizer feed it to SubwordTokenizer.load
                import json as _json

                with open(args.tokenizer) as f:
                    data = _json.load(f)
                base = ("tokenizer.json"
                        if isinstance(data, dict) and "pieces" in data
                        else "tokenizer_vocab.json")
            else:
                raise SystemExit(
                    "--tokenizer must be a .json (subword/char) or "
                    ".model (sentencepiece) file")
        shutil.copy(args.tokenizer, os.path.join(args.output, base))

    if args.lm_ckpt:
        convert_lm_ckpt(cfg, args.lm_ckpt, args.output,
                        is_transducer=td_model is not None,
                        show_report=args.report,
                        allow_unconsumed=args.allow_unconsumed)

    n_params = sum(int(np.asarray(p).size) for p in jax.tree.leaves(params))
    print(f"converted {n_params:,} parameters -> {save_dir} "
          f"(evaluate with --ckpt {save_dir})")


if __name__ == "__main__":
    main()
