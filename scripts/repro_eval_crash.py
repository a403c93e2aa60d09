"""Bounded repro for the flagship eval_step TPU-worker crash (r3).

Restores the flagship checkpoint, builds ONE validation batch exactly as
recipes/train.py does, then bisects the eval program:
  stage A: forward loss only (losses fetch)
  stage B: + ctc_greedy_decode ids fetch (the crashing path)
Run on the real chip:  timeout 3600 python scripts/repro_eval_crash.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import recipes._env  # noqa: F401  (compile cache etc.)

import jax
import numpy as np

from recipes.train import (batches, build_tx, parse_overrides,
                           _spec_augment_config, _init_or_restore,
                           build_or_load_tokenizer)
from summarymixing_tpu.config import load_recipe, build_model
from summarymixing_tpu.data.dataio import read_manifest_csv
from summarymixing_tpu.parallel.mesh import make_mesh
from summarymixing_tpu.training.checkpoint import CheckpointManager
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig
from summarymixing_tpu.parallel.mesh import shard_batch

OUT = "runs/flagship_r3"

cfg = load_recipe("recipes/LibriSpeech/branchformer_summarymixing.yaml",
                  overrides=parse_overrides(["training.number_of_epochs=25"]))
jax.config.update("jax_default_prng_impl", cfg.training.rng_impl)
cfg.training.num_buckets = 8

train_set = read_manifest_csv("corpora/hard27h/manifest_train.csv")
valid_set = read_manifest_csv("corpora/hard27h/manifest_dev.csv")
tokenizer = build_or_load_tokenizer(cfg, OUT, train_set)
model, fbank, _ = build_model(cfg)
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
ckpt = CheckpointManager(os.path.join(OUT, "save"), max_to_keep=10)
state, step, start_epoch = _init_or_restore(
    trainer, ckpt, cfg, tokenizer, train_set, mesh, fbank)
print(f"restored step={step} epoch={start_epoch}", flush=True)

def memstats(tag):
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        gb = 1024 ** 3
        print(f"[mem {tag}] in_use={s.get('bytes_in_use', 0)/gb:.2f}GB "
              f"peak={s.get('peak_bytes_in_use', 0)/gb:.2f}GB "
              f"limit={s.get('bytes_limit', 0)/gb:.2f}GB", flush=True)
    except Exception as e:  # axon may not expose memory_stats
        print(f"[mem {tag}] unavailable: {e}", flush=True)


memstats("after restore")

# mimic the live loop: a few donated train steps BEFORE the eval program
# (the standalone eval-after-restore case did NOT crash; the live run
# crashes 4/4 at the first eval after an epoch of training)
n_train = int(os.environ.get("REPRO_TRAIN_STEPS", "3"))
for i, (tb, _) in enumerate(batches(train_set, tokenizer, cfg, mesh, True,
                                    cfg.seed + 1, fbank)):
    if i >= n_train:
        break
    state, metrics = trainer.train_step(state, tb)
    print(f"train step {i} loss={float(np.asarray(metrics['loss'])):.3f}",
          flush=True)
memstats("after train steps")

batch, idx = next(iter(batches(valid_set, tokenizer, cfg, mesh, False, 0,
                               fbank)))
print("valid batch shapes:",
      {k: tuple(v.shape) for k, v in batch.items()}, flush=True)

sb = shard_batch(batch, trainer.mesh)

print("stage A: forward losses only ...", flush=True)
t0 = time.time()
losses, ids, keep = trainer._eval_step(state, sb)
print("  dispatched, fetching loss ...", flush=True)
print("  loss =", float(np.asarray(losses["loss"])),
      f"({time.time()-t0:.1f}s)", flush=True)

print("stage B: fetching greedy ids ...", flush=True)
t0 = time.time()
ids_np = np.asarray(ids)
keep_np = np.asarray(keep)
print("  ids", ids_np.shape, "keep", keep_np.shape,
      f"({time.time()-t0:.1f}s)", flush=True)

# stage C: the FULL valid loop — every bucket shape compiles its own
# eval program through the tunnel; the live run may be dying on a
# later shape's compile/execute, not the first batch
print("stage C: full valid loop over every bucket shape ...", flush=True)
seen_shapes = set()
for k, (vb, _) in enumerate(batches(valid_set, tokenizer, cfg, mesh,
                                    False, 0, fbank)):
    shape = tuple(vb["wav"].shape)
    new = shape not in seen_shapes
    seen_shapes.add(shape)
    t0 = time.time()
    losses, ids, keep = trainer._eval_step(state, shard_batch(vb,
                                                              trainer.mesh))
    loss_k = float(np.asarray(losses["loss"]))
    np.asarray(ids)
    print(f"  batch {k} wav{shape} {'NEW-SHAPE ' if new else ''}"
          f"loss={loss_k:.2f} ({time.time()-t0:.1f}s)", flush=True)
print(f"REPRO DID NOT CRASH ({len(seen_shapes)} distinct shapes)",
      flush=True)
