"""Ahead-of-time compile-cache warmup for a training recipe.

TPU-native operational tool (no reference equivalent — torch recompiles
nothing): every distinct batch shape of a recipe compiles its own XLA
program, and in this environment each compile runs minutes through the
remote-chip tunnel, during which the shared TPU's worker process has
been observed to die (the crash surfaces as "UNAVAILABLE: TPU worker
process crashed"). Completed compiles land in the persistent cache
(`.jax_cache`), so warming is monotonic: every attempt caches at least
one more program, and a bounded retry loop (scripts/flagship_supervisor.sh)
converges. After warmup, the real training run executes entirely from
cache and its epoch loop never blocks on a compile.

Usage:
  python recipes/warmup_cache.py recipe.yaml --train-manifest t.csv \
      --valid-manifest v.csv [--test-manifest te.csv] --output run_dir \
      [--num-buckets N] [--beam] [--set KEY=VALUE ...]

Warms, with a randomly initialised model (parameters are irrelevant to
compilation):
  - one train_step per distinct train batch shape (epoch-1 order)
  - the eval_step over every valid/test batch (first-per-shape compiles,
    the rest stream through as a cheap full pass)
  - with --beam: one beam_validate pass (the valid_search program per
    bucket shape) and, when test_beam_size differs, the test_search one
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _env  # noqa: E402,F401
import jax  # noqa: E402
import numpy as np  # noqa: E402

from train import (batches, build_model, build_tx, build_or_load_tokenizer,  # noqa: E402
                   parse_overrides, _spec_augment_config, beam_validate)
from summarymixing_tpu.config import load_recipe  # noqa: E402
from summarymixing_tpu.data.dataio import read_manifest_csv  # noqa: E402
from summarymixing_tpu.parallel.mesh import make_mesh  # noqa: E402
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--train-manifest", required=True)
    ap.add_argument("--valid-manifest", required=True)
    ap.add_argument("--test-manifest")
    ap.add_argument("--output", required=True,
                    help="run dir (tokenizer is built/loaded here, exactly "
                         "as train.py will)")
    ap.add_argument("--num-buckets", type=int, default=None)
    ap.add_argument("--beam", action="store_true",
                    help="also warm the beam_validate programs (and the "
                         "test_search beam when it differs)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE")
    args = ap.parse_args()

    cfg = load_recipe(args.recipe, overrides=parse_overrides(args.overrides))
    jax.config.update("jax_default_prng_impl", cfg.training.rng_impl)
    if args.num_buckets:
        cfg.training.num_buckets = args.num_buckets

    train_set = read_manifest_csv(args.train_manifest)
    valid_set = read_manifest_csv(args.valid_manifest)
    os.makedirs(args.output, exist_ok=True)
    tokenizer = build_or_load_tokenizer(cfg, args.output, train_set)
    model, fbank, transducer_model = build_model(cfg)
    if transducer_model is not None:
        raise SystemExit("transducer recipes are not covered yet; the "
                         "attention flagship is the crash-prone path")
    mesh = make_mesh()
    tx = build_tx(cfg, 1)
    a = cfg.augment
    trainer = ASRTrainer(
        model, tx, fbank,
        TrainerConfig(
            ctc_weight=cfg.training.ctc_weight,
            label_smoothing=cfg.training.label_smoothing,
            blank_id=cfg.model.blank_index,
            pad_id=cfg.model.pad_index,
            bos_id=cfg.model.bos_index,
            eos_id=cfg.model.eos_index,
            augment=_spec_augment_config(a),
            concat_original=a.concat_original,
            augment_warmup_steps=a.augment_warmup_steps,
            normalize_update_until_epoch=cfg.features.normalize_update_until_epoch,
        ),
        mesh=mesh,
    )

    first = next(iter(batches(train_set, tokenizer, cfg, mesh, True,
                              cfg.seed + 1, fbank)))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), first[0])

    # -- train shapes (dedup; epoch-1 batch order) -------------------------
    seen = set()
    for batch, _ in batches(train_set, tokenizer, cfg, mesh, True,
                            cfg.seed + 1, fbank):
        key = (tuple(batch["wav"].shape), batch["tokens"].shape[1])
        if key in seen:
            continue
        seen.add(key)
        t0 = time.time()
        state, metrics = trainer.train_step(state, batch)
        float(np.asarray(metrics["loss"]))
        print(f"[warm train] wav{key[0]} tok{key[1]} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(f"[warm train] {len(seen)} shapes done", flush=True)

    # -- eval shapes (full pass; compiles on first occurrence) -------------
    for name, manifest in [("valid", valid_set)] + (
            [("test", read_manifest_csv(args.test_manifest))]
            if args.test_manifest else []):
        seen = set()
        n = 0
        for batch, _ in batches(manifest, tokenizer, cfg, mesh, False, 0,
                                fbank):
            key = (tuple(batch["wav"].shape), batch["tokens"].shape[1])
            n += 1
            fresh = key not in seen
            seen.add(key)
            t0 = time.time()
            losses, hyps = trainer.eval_step(state, batch)
            if fresh:
                print(f"[warm {name}] wav{key[0]} tok{key[1]} "
                      f"({time.time() - t0:.1f}s)", flush=True)
        print(f"[warm {name}] {len(seen)} shapes over {n} batches done",
              flush=True)

    # -- beam programs ------------------------------------------------------
    if args.beam and model.asr.num_decoder_layers > 0:
        t0 = time.time()
        beam_validate(cfg, model, trainer, state, valid_set, tokenizer,
                      mesh, fbank, warm_shapes_only=True)
        print(f"[warm beam] valid_search beam={cfg.decoding.valid_beam_size}"
              f" ({time.time() - t0:.1f}s)", flush=True)
        if (cfg.decoding.test_beam_size
                and cfg.decoding.test_beam_size
                != cfg.decoding.valid_beam_size and args.test_manifest):
            t0 = time.time()
            beam_validate(cfg, model, trainer, state,
                          read_manifest_csv(args.test_manifest), tokenizer,
                          mesh, fbank,
                          beam_size=cfg.decoding.test_beam_size,
                          temperature=cfg.decoding.test_temperature,
                          warm_shapes_only=True)
            print(f"[warm beam] test_search beam="
                  f"{cfg.decoding.test_beam_size} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    print("WARMUP COMPLETE", flush=True)


if __name__ == "__main__":
    main()
