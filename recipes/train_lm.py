"""Language-model training for shallow fusion.

The reference downloads a pre-trained TransformerLM via Pretrainer
(reference branchformer yaml:353-360); this runner TRAINS one in-repo (or
an RNNLM for transducer fusion, transducer yaml:339-348) so fusion has an
in-environment LM. The LM must share the ASR run's tokenizer — pass the ASR
output dir via --tokenizer-dir.

Usage:
  python recipes/train_lm.py recipes/LibriSpeech/branchformer_summarymixing.yaml \
      --train-manifest train.csv [--text corpus.txt] \
      --tokenizer-dir results/<asr_run> --output results/<asr_run>/lm \
      [--epochs 5] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _env  # noqa: E402,F401  (same dir: platform + compile-cache bootstrap)
import jax  # noqa: E402
import jax.numpy as jnp
import numpy as np
import optax

from summarymixing_tpu.config import load_recipe
from summarymixing_tpu.config.schema import LMConfig
from summarymixing_tpu.data.dataio import read_manifest_csv
from summarymixing_tpu.models.lm import build_lm
from summarymixing_tpu.training.checkpoint import (
    CheckpointManager,
    fetch_to_host,
)
from summarymixing_tpu.training.logger import FileTrainLogger
from summarymixing_tpu.training.optim import make_adamw, noam_schedule


def load_texts(args):
    texts = []
    if args.train_manifest:
        texts += [u.text for u in read_manifest_csv(args.train_manifest)]
    if args.text:
        with open(args.text) as f:
            texts += [line.strip() for line in f if line.strip()]
    if not texts:
        raise SystemExit("no training text (--train-manifest / --text)")
    return texts


def lm_batches(token_seqs, max_seq_len, batch_tokens, shuffle_seed,
               bos_id=1, eos_id=2):
    """Length-bucketed fixed-shape batches of (input, target, length):
    input = [bos, t...], target = [t..., eos]. bos/eos MUST match the
    ASR recipe's model.bos_index/eos_index: fusion bootstraps the LM
    with that bos (transducer_search.py: jnp.full(bos_id)), so an LM
    trained on a different start token scores the first steps wrong."""
    rng = np.random.default_rng(shuffle_seed)
    order = rng.permutation(len(token_seqs))
    by_bucket = {}
    for i in order:
        toks = token_seqs[i][: max_seq_len - 1]
        # bucket to the next power of two (static shapes per bucket)
        L = max(len(toks) + 1, 8)
        b = 1 << (L - 1).bit_length()
        by_bucket.setdefault(b, []).append(toks)
    for b, seqs in sorted(by_bucket.items()):
        bs = max(batch_tokens // b, 1)
        for k in range(0, len(seqs), bs):
            chunk = seqs[k : k + bs]
            while len(chunk) < bs:  # pad the tail batch by repetition
                chunk = chunk + chunk[: bs - len(chunk)]
            inp = np.zeros((bs, b), np.int32)
            tgt = np.zeros((bs, b), np.int32)
            lens = np.zeros((bs,), np.int32)
            for j, toks in enumerate(chunk):
                n = len(toks)
                inp[j, 0] = bos_id
                inp[j, 1 : n + 1] = toks
                tgt[j, :n] = toks
                tgt[j, n] = eos_id
                lens[j] = n + 1
            yield jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(lens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--train-manifest", default=None)
    ap.add_argument("--text", default=None,
                    help="extra plain-text corpus, one sentence per line")
    ap.add_argument("--tokenizer-dir", default=None,
                    help="ASR run output dir whose tokenizer to reuse")
    ap.add_argument("--output", required=True)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--model-type", default=None,
                    help="override lm.model_type (transformer | rnn)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any recipe value by dotted path, e.g. "
                         "--set training.lr_adam=0.0005 --set model.remat=true")
    args = ap.parse_args()

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe,
                      overrides=parse_overrides(args.overrides))
    # hardware RNG for dropout masks (training.rng_impl, default "rbg"):
    # measured -26% step time vs threefry on the flagship (RESULTS.md).
    # Must be set before the first PRNGKey of the run.
    jax.config.update("jax_default_prng_impl", cfg.training.rng_impl)
    lm_cfg = cfg.lm or LMConfig()
    if args.model_type:
        lm_cfg.model_type = args.model_type
    os.makedirs(args.output, exist_ok=True)
    # persist the architecture with the run: fusion-side consumers
    # (train.py::_restore_lm) rebuild the LM from this file, so a decode
    # recipe without an lm: block still gets the right topology
    import dataclasses
    import json as _json

    with open(os.path.join(args.output, "lm_config.json"), "w") as f:
        _json.dump(dataclasses.asdict(lm_cfg), f, indent=1)

    texts = load_texts(args)

    # tokenizer: reuse the ASR run's (tokenizer.json / tokenizer_vocab.json)
    from train import build_or_load_tokenizer  # noqa: E402 (same directory)

    tok_dir = args.tokenizer_dir or args.output

    class _U:  # minimal utterance view for build_or_load_tokenizer
        def __init__(self, text):
            self.text = text

    tokenizer = build_or_load_tokenizer(cfg, tok_dir, [_U(t) for t in texts])

    vocab = cfg.model.output_neurons
    model = build_lm(lm_cfg, vocab)
    token_seqs = [np.asarray(tokenizer.encode(t), np.int32) for t in texts]

    tx = make_adamw(noam_schedule(lm_cfg.lr, 1000), weight_decay=0.01)
    bos_id, eos_id = cfg.model.bos_index, cfg.model.eos_index
    ex_inp, ex_tgt, ex_len = next(iter(lm_batches(
        token_seqs, lm_cfg.max_seq_len, lm_cfg.batch_tokens, 0,
        bos_id=bos_id, eos_id=eos_id)))
    params = model.init(jax.random.PRNGKey(cfg.seed), ex_inp)["params"]
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, inp, tgt, lens, rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, inp, deterministic=False,
                                 rngs={"dropout": rng})
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
            mask = (jnp.arange(inp.shape[1])[None, :] < lens[:, None])
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    logger = FileTrainLogger(os.path.join(args.output, "train_log.txt"))
    ckpt = CheckpointManager(os.path.join(args.output, "save"),
                             max_to_keep=3)
    step = 0
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        losses = []
        for inp, tgt, lens in lm_batches(token_seqs, lm_cfg.max_seq_len,
                                         lm_cfg.batch_tokens,
                                         cfg.seed + epoch,
                                         bos_id=bos_id, eos_id=eos_id):
            params, opt_state, loss = train_step(
                params, opt_state, inp, tgt, lens,
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step))
            losses.append(loss)
            step += 1
            if args.steps and step >= args.steps:
                break
        mean_loss = float(np.mean([float(x) for x in losses])) if losses else 0.0
        logger.log_stats(
            {"epoch": epoch, "steps": step,
             "epoch_s": round(time.time() - t0, 1)},
            {"loss": mean_loss, "ppl": round(float(np.exp(min(mean_loss,
                                                              20.0))), 2)},
        )
        ckpt.save(step, {"params": fetch_to_host(params)},
                  force=True)
        if args.steps and step >= args.steps:
            break
    print("lm training done:", step, "steps; ckpt in",
          os.path.join(args.output, "save"))


if __name__ == "__main__":
    main()
