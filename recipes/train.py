"""Generic recipe runner: train + evaluate any of the five recipe configs.

Usage:
  python recipes/train.py recipes/LibriSpeech/branchformer_summarymixing.yaml \
      --train-manifest train.csv --valid-manifest dev.csv \
      [--test-manifest test.csv] [--output results/run1] [--steps N]

Replaces the reference's SpeechBrain `train.py` + HyperPyYAML entry point
(SURVEY.md §3: Brain.fit / evaluate). The whole train step runs as one jit
with data-parallel sharding; validation decodes greedy CTC every epoch and
runs beam search every `valid_search_interval` epochs (yaml:141).
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

from summarymixing_tpu.config import load_recipe, build_model
from summarymixing_tpu.data.batching import (
    DynamicBucketBatcher,
    make_buckets,
    pad_batch,
    prefetch,
)
from summarymixing_tpu.data.dataio import read_manifest_csv
from summarymixing_tpu.data.tokenizer import CharTokenizer
from summarymixing_tpu.frontend.augment import speed_perturb_batch
from summarymixing_tpu.frontend.features import Fbank
from summarymixing_tpu.parallel import launch
from summarymixing_tpu.parallel.mesh import make_mesh
from summarymixing_tpu.training.checkpoint import (
    CheckpointManager,
    fetch_to_host,
)
from summarymixing_tpu.training.logger import EpochCounter, FileTrainLogger
from summarymixing_tpu.training.metrics import ErrorRateStats
from summarymixing_tpu.training.preempt import TrainStopper
from summarymixing_tpu.training.optim import (
    make_adamw,
    make_two_stage_adam_sgd,
    noam_schedule,
    warm_and_exp_decay_schedule,
)
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig
from summarymixing_tpu.frontend.augment import SpecAugmentConfig


def build_tx(cfg, steps_per_epoch=None):
    t = cfg.training
    if t.scheduler == "noam":
        sched = noam_schedule(t.lr_adam, t.n_warmup_steps)
    elif t.scheduler == "warm_exp_decay":
        sched = warm_and_exp_decay_schedule(
            t.lr_adam, t.n_warmup_steps, t.optimizer_step_limit or 200000,
            t.decay_factor,
        )
    elif t.scheduler == "two_stage":
        # AISHELL/CommonVoice: Adam+Noam until stage_one_epochs, SGD with
        # Nesterov momentum after (reference AISHELL yaml:59,168-178).
        # switch_step counts optimizer steps, so divide by accumulation.
        sched = noam_schedule(t.lr_adam, t.n_warmup_steps)
        accum = t.grad_accumulation_factor
        switch = (t.stage_one_epochs or 1) * max(
            (steps_per_epoch or 1000) // max(accum, 1), 1
        )
        return make_two_stage_adam_sgd(
            sched, sgd_lr=t.lr_sgd, switch_step=switch,
            weight_decay=t.weight_decay, betas=tuple(t.adam_betas),
            eps=t.adam_eps, max_grad_norm=t.max_grad_norm,
            sgd_momentum=t.sgd_momentum, sgd_nesterov=t.sgd_nesterov,
            accum_steps=accum,
        )
    else:
        raise ValueError(f"unknown scheduler {t.scheduler!r}")
    return make_adamw(
        sched,
        weight_decay=t.weight_decay,
        betas=tuple(t.adam_betas),
        eps=t.adam_eps,
        max_grad_norm=t.max_grad_norm,
        accum_steps=t.grad_accumulation_factor,
    )


def _build_buckets(manifest, cfg, mesh, valid=False):
    """One bucket construction shared by the batch iterator and the
    steps-per-epoch estimate (keeps the two_stage switch in sync).
    valid=True uses the smaller max_batch_length_val budget (reference
    max_batch_len_val, smaller because the eval beam is wider)."""
    sr = cfg.features.sample_rate
    lengths = [int(u.duration * sr) for u in manifest]
    budget = cfg.training.max_batch_length
    if valid and cfg.training.max_batch_length_val is not None:
        budget = cfg.training.max_batch_length_val
    buckets = make_buckets(
        max_batch_length=budget * sr,
        num_buckets=cfg.training.num_buckets,
        min_len=max(min(lengths), sr // 4),
        max_len=max(lengths),
        max_batch_size=cfg.training.max_batch_ex,
        batch_multiple=int(mesh.devices.size),
        quantize=cfg.training.bucket_shape_grid,
    )
    global _warned_bucket_compiles
    if not valid and len(buckets) > 60 and not _warned_bucket_compiles:
        _warned_bucket_compiles = True
        print(f"NOTE: {len(buckets)} buckets = up to {len(buckets)} distinct "
              "train-step shapes, each compiling its own program (90 s - "
              "12 min per compile in this environment). Use --num-buckets "
              "to cap for smoke runs; the persistent compile cache "
              "amortises full runs.")
    return lengths, buckets


_warned_bucket_compiles = False


def estimate_steps_per_epoch(manifest, cfg, mesh):
    lengths, buckets = _build_buckets(manifest, cfg, mesh)
    return max(DynamicBucketBatcher(lengths, buckets).num_batches(), 1)


def batches(manifest, tokenizer, cfg, mesh, shuffle, seed, fbank=None):
    sr = cfg.features.sample_rate
    # non-shuffled iteration == eval -> the smaller validation budget
    lengths, buckets = _build_buckets(manifest, cfg, mesh, valid=not shuffle)
    batcher = DynamicBucketBatcher(
        lengths, buckets, shuffle=shuffle, seed=seed, drop_last=shuffle
    )
    from summarymixing_tpu.data.native_loader import load_wav_batch

    multiproc = launch.process_count() > 1
    for spec, idx in batcher:
        # token encode is cheap: do ALL rows on every process so the
        # padded token shape (umax) agrees across hosts
        toks = [np.asarray(tokenizer.encode(manifest[i].text), np.int32)
                for i in idx]
        umax = max(max(len(t) for t in toks), 1)
        if not shuffle:
            # eval: stabilise the token axis so each wav bucket is ONE
            # compiled program (schema.eval_token_multiple); padding is
            # loss-masked by token_lens
            m = max(int(cfg.training.eval_token_multiple), 1)
            umax = -(-umax // m) * m
        tokens, token_lens = pad_batch(toks, umax)
        # audio decode is the heavy part: each process loads only the
        # rows its chips own (every process iterates the SAME batch
        # sequence — parallel/launch.py data contract)
        rows = launch.local_rows(len(idx)) if multiproc else slice(None)
        wav, wav_lens = load_wav_batch(
            [manifest[i].wav_path for i in idx[rows]], spec.max_len, sr
        )
        local = {
            "wav": wav,
            "wav_lens": wav_lens,
            "tokens": tokens[rows].astype(np.int32),
            "token_lens": token_lens[rows],
        }
        if multiproc:
            yield launch.global_batch(local, mesh), idx
        else:
            yield {k: jnp.asarray(v) for k, v in local.items()}, idx


def score_batch(stats, tokenizer, batch, idx, seen, hyp_tokens,
                hyp_lens=None):
    """Dedup-and-score one decoded batch into ErrorRateStats (the ONE
    copy of a block that previously drifted across train.py/evaluate.py).

    Eval batches are padded to fixed size by repeating utterances
    (data/batching.py), so each utterance id in `idx` is scored once via
    the caller's `seen` set. `hyp_tokens` is either a ragged per-row
    list (greedy CTC collapse) or a [B, U] token array with `hyp_lens`
    [B] (beam / transducer decodes) — device or host; multi-process
    global arrays are gathered via launch.fetch_global. Returns the
    number of newly scored utterances."""
    keep = []
    for i, u in enumerate(idx):
        if int(u) not in seen:
            seen.add(int(u))
            keep.append(i)
    toks_np = launch.fetch_global(batch["tokens"])
    tlens_np = launch.fetch_global(batch["token_lens"])
    refs = [tokenizer.decode(toks_np[i, : int(tlens_np[i])]).split()
            for i in keep]
    if hyp_lens is None:
        hyps = [tokenizer.decode(hyp_tokens[i]).split() for i in keep]
    else:
        hyp_np = launch.fetch_global(hyp_tokens)
        hlens_np = launch.fetch_global(hyp_lens)
        hyps = [tokenizer.decode(hyp_np[i, : int(hlens_np[i])]).split()
                for i in keep]
    stats.append(refs, hyps, ids=[int(idx[i]) for i in keep])
    return len(keep)


def _spec_augment_config(a):
    """AugmentConfig (recipe) -> SpecAugmentConfig (train step); None when
    feature augmentation is disabled (VoxPopuli)."""
    if not a.fea_augment:
        return None
    return SpecAugmentConfig(
        time_drop_length=(a.time_drop_length_low, a.time_drop_length_high),
        time_drop_count=a.time_drop_count,
        freq_drop_length=(a.freq_drop_length_low, a.freq_drop_length_high),
        freq_drop_count=a.freq_drop_count,
        warp_window=a.time_warp_window,
        replace=a.drop_replace,
        min_augmentations=a.min_augmentations,
        max_augmentations=a.max_augmentations,
        shuffle_augmentations=a.shuffle_augmentations,
    )


def _restore_lm(cfg, lm_ckpt_dir, default_model_type=None):
    """Shared LM checkpoint restore for shallow fusion: resolves the run
    dir's save/ subdir and loads params. Returns (lm_cfg, lm, params) or
    None (with a warning) when no checkpoint exists.

    An `lm_config.json` in the LM run dir (written by train_lm.py and
    convert_checkpoint.py) takes precedence over the recipe's lm: block —
    the checkpointed weights fix the architecture (e.g. a converted
    published lm.ckpt uses the SpeechBrain "sb" output head), so the run
    dir, not the decoding-side recipe, is the source of truth."""
    import dataclasses
    import json as _json

    from summarymixing_tpu.config.schema import LMConfig
    from summarymixing_tpu.models.lm import build_lm
    from summarymixing_tpu.training.checkpoint import CheckpointManager

    lm_cfg = cfg.lm or (LMConfig(model_type=default_model_type)
                        if default_model_type else LMConfig())
    save_dir = (lm_ckpt_dir if os.path.basename(lm_ckpt_dir) == "save"
                else os.path.join(lm_ckpt_dir, "save"))
    cfg_path = os.path.join(os.path.dirname(save_dir), "lm_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            data = _json.load(f)
        known = {f.name for f in dataclasses.fields(LMConfig)}
        lm_cfg = LMConfig(**{k: v for k, v in data.items() if k in known})
    raw = CheckpointManager(save_dir).restore({"params": None}, partial=True)
    if raw is None:
        print(f"WARNING: no LM checkpoint in {save_dir}; decoding without "
              "LM fusion")
        return None
    lm = build_lm(lm_cfg, cfg.model.output_neurons)
    return lm_cfg, lm, {"params": raw["params"]}


def load_rnnlm(cfg, lm_ckpt_dir):
    """RNNLM for transducer-beam shallow fusion (reference transducer
    yaml:339-348,388-390: lm_weight 0.5). Returns (lm_init, lm_step) bound
    callables or (None, None)."""
    if not lm_ckpt_dir or cfg.decoding.lm_weight <= 0.0:
        return None, None
    from summarymixing_tpu.config.schema import LMConfig

    lm_cfg = cfg.lm or LMConfig(model_type="rnn")
    if lm_cfg.model_type != "rnn":
        print("WARNING: transducer fusion expects an RNNLM (lm.model_type "
              "rnn); skipping fusion")
        return None, None
    restored = _restore_lm(cfg, lm_ckpt_dir, default_model_type="rnn")
    if restored is None:
        return None, None
    _, lm, lm_params = restored
    bound = lm.bind(lm_params)
    return bound.initial_state, bound.step


def run_transducer(cfg, args, enc_model, td_model, fbank, tx, mesh,
                   tokenizer, train_set, valid_set):
    """Transducer recipe path: RNN-T loss + DCT sampling; greedy decode for
    validation, batched beam (+ optional RNNLM fusion) for the test stage
    (reference transducer yaml:375-393)."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search_batched,
        transducer_greedy_decode,
    )
    from summarymixing_tpu.training.transducer_trainer import (
        DynChunkTrainSamplerConfig,
        TransducerTrainer,
        TransducerTrainerConfig,
    )

    out_dir = args.output or os.path.join(cfg.output_folder, cfg.name)
    t_cfg = cfg.transducer
    trainer = TransducerTrainer(
        enc_model, td_model, tx, fbank,
        TransducerTrainerConfig(
            ctc_weight=cfg.training.ctc_weight,
            ce_weight=getattr(cfg.training, "ce_weight", 0.0),
            number_of_ctc_epochs=cfg.training.number_of_ctc_epochs,
            blank_id=cfg.model.blank_index,
            augment=_spec_augment_config(cfg.augment),
            augment_warmup_steps=cfg.augment.augment_warmup_steps,
            normalize_update_until_epoch=(
                cfg.features.normalize_update_until_epoch
            ),
            dct=DynChunkTrainSamplerConfig(
                chunkwise_prob=t_cfg.chunkwise_prob,
                chunk_size_min=t_cfg.chunk_size_min,
                chunk_size_max=t_cfg.chunk_size_max,
                limited_left_context_prob=t_cfg.limited_left_context_prob,
                left_context_chunks_min=t_cfg.left_context_chunks_min,
                left_context_chunks_max=t_cfg.left_context_chunks_max,
            ),
            joint_chunk=t_cfg.joint_chunk,
        ),
        mesh=mesh,
    )
    logger = FileTrainLogger(os.path.join(out_dir, "train_log.txt"))
    ckpt = CheckpointManager(os.path.join(out_dir, "save"),
                             max_to_keep=cfg.training.avg_checkpoints,
                             interval_minutes=cfg.training.ckpt_interval_minutes)
    state, step, start_epoch = _init_or_restore(
        trainer, ckpt, cfg, tokenizer, train_set, mesh, fbank)
    profiler = StepProfiler(args.profile, args.profile_steps)
    stopper = TrainStopper(max_hours=getattr(args, "max_hours", None),
                           install=True)
    hb_every = int(os.environ.get("SMT_HEARTBEAT_STEPS", "10"))
    valid_every = cfg.training.valid_every_steps

    def run_valid(state):
        """Greedy-decode the valid set: the per-epoch stage below and,
        when training.valid_every_steps > 0, a mid-epoch trajectory
        point — at flagship corpus scale an epoch is hours, so step-
        interval WER points are how a bounded chip window still yields
        a WER-vs-step trajectory."""
        stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                               remove_spaces=cfg.remove_spaces)
        val_losses = []
        seen = set()
        bound = td_model.bind({"params": state["params"]["transducer"]})
        for batch, idx in batches(valid_set, tokenizer, cfg, mesh, False, 0,
                                  fbank):
            losses, (enc_out, enc_lens) = trainer.eval_step(state, batch)
            val_losses.append(losses["loss"])
            enc_proj = bound.encode_proj(enc_out)
            toks, lens = transducer_greedy_decode(
                enc_proj, enc_lens, bound.predictor_init,
                bound.predictor_step, bound.joint_step,
                blank_id=cfg.model.blank_index,
            )
            score_batch(stats, tokenizer, batch, idx, seen, toks, lens)
        summary = stats.summarize()
        vloss = (float(np.mean([float(x) for x in val_losses]))
                 if val_losses else 0.0)
        return vloss, summary["WER"]

    for epoch in EpochCounter(cfg.training.number_of_epochs,
                              start=start_epoch):
        t0 = time.time()
        hb_t = time.time()
        train_losses = []
        rng_np = np.random.default_rng(cfg.seed + epoch)
        for batch, _ in prefetch(batches(train_set, tokenizer, cfg, mesh,
                                         True, cfg.seed + epoch, fbank)):
            if cfg.augment.speed_perturb:
                key = jax.random.PRNGKey(int(rng_np.integers(1 << 31)))
                wav, wav_lens = speed_perturb_batch(
                    key, batch["wav"], batch["wav_lens"],
                    speeds=cfg.augment.speeds,
                )
                batch = dict(batch, wav=wav, wav_lens=wav_lens)
            state, metrics = trainer.train_step(state, batch)
            step += 1
            profiler.step(step, metrics["loss"])
            train_losses.append(metrics["loss"])  # device scalar, no sync
            if valid_every and step % valid_every == 0:
                # checkpoint FIRST (crash-safe order, same contract as
                # the per-epoch stage), then a mid-epoch WER point
                ckpt.save(step, fetch_to_host(state), force=True,
                          blocking=False)
                tv = time.time()
                vloss, wer = run_valid(state)
                logger.log_stats(
                    {"valid_step": step, "epoch": epoch,
                     "valid_s": round(time.time() - tv, 1)},
                    valid_stats={"loss": vloss,
                                 cfg.error_rate.upper(): wer},
                )
                hb_t = time.time()  # don't bill valid wall to step time
            if hb_every and step % hb_every == 0:
                # one host fetch per window (same contract as the
                # attention path: truthful mean step time under async
                # dispatch)
                loss_now = float(np.asarray(metrics["loss"]))
                now = time.time()
                print(f"[hb] step {step} mean_step_s "
                      f"{(now - hb_t) / hb_every:.2f} loss {loss_now:.3f}",
                      flush=True)
                hb_t = now
            if ckpt.should_save():
                # force: the interval decision was already made (and in
                # multi-process runs broadcast) by should_save above;
                # async write (see the attention path)
                ckpt.save(step, fetch_to_host(state), force=True,
                          blocking=False)
            if stopper.should_stop(step):
                ckpt.save(step, fetch_to_host(state), force=True)
                print(f"[preempt] checkpoint saved at step {step} "
                      f"({stopper.signame}); resume with the same command")
                return None
            if args.steps and step >= args.steps:
                break

        profiler.close()
        vloss, wer = run_valid(state)
        logger.log_stats(
            {"epoch": epoch, "steps": step,
             "epoch_s": round(time.time() - t0, 1)},
            _epoch_loss_stats(train_losses),
            {"loss": vloss, cfg.error_rate.upper(): wer},
        )
        state = trainer.next_epoch(state)  # gates normalizer freezing
        last_epoch = (epoch >= cfg.training.number_of_epochs
                      or (args.steps and step >= args.steps))
        if last_epoch or epoch == 1 or ckpt.should_save():
            ckpt.save(step, fetch_to_host(state), force=True,
                      blocking=bool(last_epoch))
        if args.steps and step >= args.steps:
            break
    print("training done:", step, "steps")

    if args.test_manifest:
        # test stage: beam 10 + state/expand-beam pruning + optional RNNLM
        # fusion (reference transducer yaml:375-393), batched on-device
        test_set = read_manifest_csv(args.test_manifest)
        stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                               remove_spaces=cfg.remove_spaces)
        seen = set()
        bound = td_model.bind({"params": state["params"]["transducer"]})
        lm_init, lm_step = load_rnnlm(cfg, args.lm_ckpt)
        for batch, idx in batches(test_set, tokenizer, cfg, mesh, False, 0,
                                  fbank):
            _, (enc_out, enc_lens) = trainer.eval_step(state, batch)
            enc_proj = bound.encode_proj(enc_out)
            toks, lens, _scores = transducer_beam_search_batched(
                enc_proj, enc_lens, bound.predictor_init,
                bound.predictor_step, bound.joint_step,
                blank_id=cfg.model.blank_index,
                bos_id=cfg.model.bos_index,
                beam_size=cfg.decoding.beam_size,
                state_beam=cfg.decoding.state_beam,
                expand_beam=cfg.decoding.expand_beam,
                lm_step=lm_step, lm_init=lm_init,
                lm_weight=cfg.decoding.lm_weight if lm_step else 0.0,
            )
            score_batch(stats, tokenizer, batch, idx, seen, toks, lens)
        summary = stats.summarize()
        logger.log_stats({"stage": "test"}, test_stats={
            cfg.error_rate.upper(): summary["WER"]})
        print("test", cfg.error_rate.upper(), summary["WER"])


def static_decode_length(cfg, manifest, mesh, fbank):
    """One decode-length cap per RUN (not per bucket), derived from the
    largest eval bucket: beam search then compiles once per bucket shape
    instead of once per (bucket, max_length) pair."""
    _, buckets = _build_buckets(manifest, cfg, mesh, valid=True)
    max_samples = max(spec.max_len for spec in buckets)
    frames = int(fbank.frame_lengths(jnp.asarray([max_samples]))[0])
    for stride in cfg.model.frontend_strides:  # ConvolutionFrontEnd subsampling
        frames = -(-frames // stride)
    return min(max(int(frames * cfg.decoding.max_decode_ratio), 8), 256)


_LM_RESTORE_CACHE = {}


def make_lm_fusion(cfg, lm_ckpt_dir):
    """Build the KV-cached LM shallow-fusion hooks (TransformerLMScorer of
    reference yaml:233-246: lm_weight 0.60, temperature 1.15; RNNLM for the
    transducer recipes). Returns (lm_step_fn, make_cache) or (None, None);
    make_cache(n_rows, max_len) builds the per-batch LM cache."""
    if not lm_ckpt_dir or cfg.decoding.lm_weight <= 0.0:
        return None, None
    if lm_ckpt_dir not in _LM_RESTORE_CACHE:
        # one restore per ckpt dir per process: beam_validate runs every
        # valid_search_interval epochs and must not re-read + rebuild
        # the same LM checkpoint from disk each time
        _LM_RESTORE_CACHE[lm_ckpt_dir] = _restore_lm(cfg, lm_ckpt_dir)
    restored = _LM_RESTORE_CACHE[lm_ckpt_dir]
    if restored is None:
        return None, None
    lm_cfg, lm, lm_params = restored
    temp = cfg.decoding.lm_temperature

    if lm_cfg.model_type == "rnn":
        def make_cache(n_rows, max_len):
            return lm.apply(lm_params, n_rows, method=lm.initial_state)

        def lm_step(last_tok, step_i, cache):
            carry, logits = lm.apply(lm_params, cache, last_tok,
                                     method=lm.step)
            return jax.nn.log_softmax(logits / temp, axis=-1), carry
    else:
        def make_cache(n_rows, max_len):
            return lm.apply(lm_params, n_rows, max_len,
                            method=lm.init_cache)

        def lm_step(last_tok, step_i, cache):
            logits, cache = lm.apply(lm_params, last_tok, step_i, cache,
                                     method=lm.step)
            return jax.nn.log_softmax(logits / temp, axis=-1), cache

    return lm_step, make_cache



def make_beam_step(cfg, model, params, enc_out, enc_lens, beam, bc,
                   lm_step, lm_make_cache):
    """Beam-search step construction shared by train.py beam_validate and
    evaluate.py: cached decoder stepping for MHA decoders (KV cache) AND
    the Summary Decoder (running-mean carry — O(1) state per step,
    models/transformer.py init_cache/step). Returns
    (step_fn, cache, lm_cache).

    Takes the encoder output UNTILED [B, T, D]: in cached mode nothing is
    ever beam-tiled — per-hypothesis state is allocated at N = B*beam rows
    (decode_cache_init rows=N) while the cross-attention K/V and pad mask
    stay per-utterance, which is what keeps the reference's beam-66
    test_search inside v5e HBM (the O(beam) enc/KV tiles plus their
    per-step parent-gather copies were the OOM). Only the no-cache
    decode_position fallback still materialises a beam tile."""
    from summarymixing_tpu.decoding.s2s_beam import tile_for_beam
    from summarymixing_tpu.ops.masks import length_to_mask

    n = enc_out.shape[0] * beam
    lm_cache = lm_make_cache(n, bc.max_length + 1) if lm_step else None
    if cfg.model.decoder_attention_type in ("regularMHA", "vanillaMHA",
                                            "SummaryMixing"):
        cache = model.apply(params, enc_out, bc.max_length + 1, n,
                            method=model.decode_cache_init)
        enc_pad = length_to_mask(enc_lens, enc_out.shape[1])  # [B, T]

        def step(last_tok, step_i, cache):
            return model.apply(params, last_tok, step_i, cache, enc_pad,
                               method=model.decode_step_cached)

        return step, cache, lm_cache

    enc_t = tile_for_beam(enc_out, beam)
    len_t = tile_for_beam(enc_lens, beam)

    def step_plain(tokens, step_i):
        return model.apply(params, tokens, enc_t, len_t, step_i,
                           method=model.decode_position)

    return step_plain, None, lm_cache


_BEAM_PROGRAM_CACHE = {}
_ENCODE_PROGRAM_CACHE = {}


def beam_programs(cfg, model, fbank, trainer, bc, lm_step, lm_make_cache,
                  nbest=1):
    """One persistent (encode_fn, search_fn) jit pair per beam
    configuration, cached for the process lifetime.

    Why this exists: the old path ran the encoder via eager `model.apply`
    and built the beam step as a fresh per-slice closure, which re-traced
    and re-lowered the whole decode graph for EVERY eval batch even when
    every XLA executable was a cache hit — measured at ~10 s host time
    per batch on the r4 flagship beam validation (~15 min for a
    112-batch dev pass whose device work is seconds;
    benchmarks/RESULTS.md round 4). A persistent jit object re-traces
    only per new input shape, so a full-dev beam pass costs one trace
    per bucket shape and then streams.

    `params`/`norm_stats` are arguments (weights change between
    validations); cfg/model/bc/LM hooks are static via the cache key.
    The key hashes `bc` BY VALUE (frozen dataclass), so valid_search
    (beam 10) and test_search (beam 66, temperature 1.15) get distinct
    programs while repeated calls with an equal config share one.
    `nbest` changes the returned tree shape, so it is part of the key.
    The encoder program depends on neither bc nor nbest, so it is
    cached SEPARATELY — one encoder serves every beam width (a process
    that runs valid beam 10 then test beam 66 compiles the 18L encoder
    once, not twice; compiles here run 90 s – 12 min).

    Cache-key invariant (advisor round 4): keys use `id()` of
    cfg/model/fbank/trainer/lm_step. This is safe ONLY because the
    cached closures pin those exact objects, so their ids cannot be
    reused while the entry lives. Callers must treat these objects as
    process-lifetime singletons — in particular `make_lm_fusion`
    returns a FRESH `lm_step` per call, so call it once per run and
    reuse the hooks; calling it per batch would defeat the cache and
    re-trace every time (evaluate.py hoists it above the batch loop).

    Reference surface covered: S2STransformerBeamSearcher valid/test
    stages (branchformer yaml:248-269)."""
    from summarymixing_tpu.decoding.s2s_beam import (
        s2s_beam_search,
        tile_for_beam,
    )

    enc_key = (id(cfg), id(model), id(fbank), id(trainer))
    encode_fn = _ENCODE_PROGRAM_CACHE.get(enc_key)
    if encode_fn is None:

        @jax.jit
        def encode_fn(params, norm_stats, wav, wav_lens):
            feats = fbank(wav)
            feat_lens = fbank.frame_lengths(wav_lens)
            feats, _ = trainer.normalize(feats, norm_stats)
            enc_out, enc_lens = model.apply(params, feats, feat_lens,
                                            method=model.encode)
            ctc_lp = model.apply(params, enc_out, method=model.ctc_head)
            return (enc_out, enc_lens) + maybe_compact_ctc(cfg, ctc_lp,
                                                           enc_lens)

        _ENCODE_PROGRAM_CACHE[enc_key] = encode_fn

    key = (id(cfg), id(model), id(fbank), id(trainer), bc, id(lm_step),
           nbest)
    search_fn = _BEAM_PROGRAM_CACHE.get(key)
    if search_fn is None:

        @jax.jit
        def search_fn(params, eo, el, cl, sl):
            step, cache, lm_cache = make_beam_step(
                cfg, model, params, eo, el, bc.beam_size, bc, lm_step,
                lm_make_cache)
            return s2s_beam_search(step, eo,
                                   tile_for_beam(sl, bc.beam_size),
                                   cl, bc, cache=cache, lm_step_fn=lm_step,
                                   lm_cache=lm_cache, nbest=nbest)

        _BEAM_PROGRAM_CACHE[key] = search_fn
    return encode_fn, search_fn


def beam_slices(max_rows, beam, idx, *arrays):
    """Row-capped slicing of one eval batch for beam decode
    (decoding.max_beam_rows): yields (sub_idx, *sliced_arrays) with at
    most max_rows // beam utterances each. The per-hypothesis decode
    state (self-attn KV, LM KV, CTC prefix rows) is linear in
    batch*beam, so wide eval buckets at test-scale beams must be
    decoded in slices to stay inside HBM. The trailing slice
    repeat-pads with clamped indices — every slice is the SAME compiled
    program, and the repeated utterances dedup in score_batch via the
    caller's `seen` set."""
    b = len(idx)
    size = b if max_rows <= 0 else max(1, min(b, max_rows // max(beam, 1)))
    for lo in range(0, b, size):
        take = np.minimum(np.arange(lo, lo + size), b - 1)
        yield [idx[i] for i in take], *(a[take] for a in arrays)


def maybe_compact_ctc(cfg, ctc_lp, enc_lens):
    """Blank-skip compaction of the CTC time axis for the prefix scorer
    (cfg.decoding.ctc_blank_skip > 0; ctc_prefix.py::compact_blank_frames).
    Returns (ctc_lp, scorer_lens) — scorer lengths only; the decoder's
    cross-attention keeps the real encoder lengths."""
    if cfg.decoding.ctc_blank_skip <= 0.0:
        return ctc_lp, enc_lens
    from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

    # default cap T//4 (~2x the typical token count of peaky CTC at 25
    # frames/s with BPE), floored at 32 so short utterances never fold
    # real token frames into the blank runs
    cap = cfg.decoding.ctc_frame_cap or min(max(ctc_lp.shape[1] // 4, 32),
                                            ctc_lp.shape[1])
    ctc_lp, scorer_lens, _ = compact_blank_frames(
        ctc_lp, enc_lens, cfg.model.blank_index, cap,
        cfg.decoding.ctc_blank_skip)
    return ctc_lp, scorer_lens


def beam_validate(cfg, model, trainer, state, valid_set, tokenizer, mesh,
                  fbank, lm_ckpt=None, beam_size=None, temperature=1.0,
                  warm_shapes_only=False):
    """Joint CTC/attention beam search (the reference's valid_search stage,
    yaml:248-263; with beam_size=test_beam_size it is the test_search
    stage, yaml:258-269), KV-cached, with optional TransformerLM fusion.

    warm_shapes_only: compile-cache warming mode (recipes/warmup_cache.py)
    — decode only the FIRST batch of each distinct wav shape, first beam
    slice only (all slices of a batch are the same compiled program).
    A full pass with random init weights decodes every utterance to
    max_length (no early eos exit), which cost ~35 min per beam size on
    the r4 flagship warmup for zero extra cache coverage."""
    from summarymixing_tpu.decoding.s2s_beam import S2SBeamConfig

    params = {"params": state["params"]}
    stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                           remove_spaces=cfg.remove_spaces)
    beam = beam_size or cfg.decoding.valid_beam_size
    lm_step, lm_make_cache = make_lm_fusion(cfg, lm_ckpt)
    lmax = static_decode_length(cfg, valid_set, mesh, fbank)
    # nothing encoder-sized is beam-tiled: the CTC lattice stays
    # [B, T, V] (scorer maps rows by n // beam) and make_beam_step
    # keeps the cross-attention K/V per-utterance — the O(beam)
    # tiles OOM'd v5e HBM at the reference test config (beam 66)
    bc = S2SBeamConfig(
        beam_size=beam, ctc_weight=cfg.decoding.ctc_weight_decode,
        lm_weight=cfg.decoding.lm_weight if lm_step else 0.0,
        bos_id=cfg.model.bos_index, eos_id=cfg.model.eos_index,
        blank_id=cfg.model.blank_index,
        max_length=lmax, temperature=temperature,
    )
    encode_fn, search_fn = beam_programs(cfg, model, fbank, trainer, bc,
                                         lm_step, lm_make_cache)
    seen = set()
    warmed = set()
    for batch, idx in batches(valid_set, tokenizer, cfg, mesh, False, 0,
                              fbank):
        if warm_shapes_only:
            shape_key = tuple(batch["wav"].shape)
            if shape_key in warmed:
                continue
            warmed.add(shape_key)
        enc_out, enc_lens, ctc_lp, scorer_lens = encode_fn(
            params, state["norm_stats"], batch["wav"], batch["wav_lens"])
        tok_np = launch.fetch_global(batch["tokens"])
        tl_np = launch.fetch_global(batch["token_lens"])
        for s_idx, eo, el, cl, sl, s_tok, s_tl in beam_slices(
                cfg.decoding.max_beam_rows, beam, idx, enc_out, enc_lens,
                ctc_lp, scorer_lens, tok_np, tl_np):
            toks, lens, _ = search_fn(params, eo, el, cl, sl)
            score_batch(stats, tokenizer,
                        {"tokens": s_tok, "token_lens": s_tl},
                        s_idx, seen, toks, lens)
            if warm_shapes_only:
                break  # later slices reuse this slice's compiled program
    return stats.summarize()


def build_or_load_tokenizer(cfg, out_dir, train_set):
    """Tokenizer resolution (reference yaml:193: SentencePiece unigram
    trained from the transcripts): 1) previously trained in-repo subword
    model (tokenizer.json), 2) a pre-built sentencepiece .model when the
    wheel is importable, 3) TRAIN the in-repo unigram/BPE model now
    (data/subword.py), 4) char recipes build a char map. The chosen
    tokenizer is persisted so evaluate.py decodes with the same id map."""
    import json as _json

    from summarymixing_tpu.data.subword import SubwordTokenizer, train_subword

    os.makedirs(out_dir, exist_ok=True)
    if cfg.tokenizer_type == "char":
        # Load the persisted char map when the run dir already has one
        # (resume, evaluate, train_lm --tokenizer-dir <asr_run>): rebuilding
        # from different texts would silently shift every token id.
        vocab_path = os.path.join(out_dir, "tokenizer_vocab.json")
        if os.path.exists(vocab_path):
            with open(vocab_path) as f:
                return CharTokenizer(vocab=_json.load(f))
        tokenizer = CharTokenizer.build([u.text for u in train_set])
        if launch.is_coordinator():  # one writer on a shared run dir;
            # atomic rename so a late-starting process never reads a
            # partial file (it either sees the full file or rebuilds
            # the identical map from the same manifests)
            tmp = vocab_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(tokenizer.vocab, f)
            os.replace(tmp, vocab_path)
        return tokenizer
    json_path = os.path.join(out_dir, "tokenizer.json")
    if os.path.exists(json_path):
        return SubwordTokenizer.load(json_path)
    sp_path = os.path.join(out_dir, "tokenizer.model")
    if os.path.exists(sp_path):
        try:
            from summarymixing_tpu.data.tokenizer import SentencePieceTokenizer

            return SentencePieceTokenizer(sp_path)
        except ImportError:
            print("sentencepiece wheel unavailable; training in-repo "
                  "subword model instead")
    texts = [u.text for u in train_set]
    tokenizer = train_subword(texts, cfg.model.output_neurons,
                              cfg.token_type)
    if launch.is_coordinator():  # one writer; atomic for late readers
        tokenizer.save(json_path + ".tmp")
        os.replace(json_path + ".tmp", json_path)
    print(f"trained {cfg.token_type} tokenizer: {tokenizer.vocab_size} "
          f"pieces -> {json_path}")
    return tokenizer




class StepProfiler:
    """--profile DIR: capture a jax.profiler trace of a few train steps
    (skipping the compile step) — the tracing/profiling aux subsystem
    (SURVEY.md §5; view with TensorBoard/XProf)."""

    def __init__(self, log_dir, n_steps=5, skip=3):
        self.log_dir, self.n, self.skip = log_dir, n_steps, skip
        self.on = False
        self._seen = 0          # steps seen THIS run (resume-safe)

    def step(self, step, sync=None):
        """Call after each train step; `sync` is a device scalar from that
        step (e.g. the loss). Dispatch is async, so the trace boundaries
        drain the device first — otherwise the host races ahead and the
        window can close before one profiled step has executed."""
        if not self.log_dir:
            return
        self._seen += 1
        if not self.on and self._seen == self.skip:
            if sync is not None:
                np.asarray(sync)  # host fetch = reliable sync (CLAUDE.md)
            jax.profiler.start_trace(self.log_dir)
            self.on = True
        elif self.on and self._seen >= self.skip + self.n:
            self.close(sync)

    def close(self, sync=None):
        if self.on:
            if sync is not None:
                np.asarray(sync)
            jax.profiler.stop_trace()
            self.on = False
            print(f"profiler trace written to {self.log_dir}")




def _epoch_loss_stats(train_losses):
    """Mean train loss over the epoch, excluding batches whose update was
    skipped as non-finite (their NaN loss would otherwise poison the log);
    reports the skip count alongside."""
    arr = np.asarray([float(x) for x in train_losses], np.float64)
    finite = arr[np.isfinite(arr)]
    stats = {"loss": float(finite.mean()) if finite.size else 0.0}
    skipped = int(arr.size - finite.size)
    if skipped:
        stats["nonfinite_skipped"] = skipped
    return stats


def _fix_restored_rng(state):
    """Re-seed the rng leaf if a restored checkpoint was saved under a
    different PRNG implementation (e.g. a pre-rbg threefry run resumed
    under the rbg default): key shapes differ (uint32[2] vs uint32[4]) and
    jax.random.split would crash. Only the dropout stream restarts."""
    expected = jax.random.PRNGKey(0).shape
    if tuple(state["rng"].shape) != tuple(expected):
        print("NOTE: checkpointed rng was saved under a different PRNG "
              "implementation; re-seeding the dropout stream "
              f"(training.rng_impl now gives key shape {tuple(expected)})")
        state = dict(state)
        state["rng"] = jax.random.PRNGKey(int(state["step"]))
    return state


def _init_or_restore(trainer, ckpt, cfg, tokenizer, train_set, mesh, fbank):
    """Initialize the train state from one peeked batch and restore any
    checkpoint BEFORE the epoch loop, so a resumed run continues at epoch
    E+1 — with the right epoch labels, shuffle/augment seeds
    (cfg.seed + epoch) and valid_search_interval phase — instead of
    restarting the full epoch budget at 1 (the reference recovers its
    EpochCounter through the Checkpointer the same way, branchformer
    yaml:286-295). Returns (state, step, completed_epochs)."""
    first = next(iter(batches(train_set, tokenizer, cfg, mesh, True,
                              cfg.seed + 1, fbank)), None)
    if first is None:
        raise SystemExit(
            "no training batches produced: the corpus is smaller than "
            "one bucket batch (drop_last). Lower "
            "training.max_batch_length or num_buckets."
        )
    if ckpt.latest_step() is not None:
        # Resume fast path: orbax only needs the state's STRUCTURE as a
        # restore template, so trace init_state abstractly instead of
        # executing it — the throwaway device init + fetch_to_host
        # template staging measured ~6-7 min of tunnel round trips per
        # resume attempt on the 89M flagship (RESULTS.md round 3);
        # eval_shape costs zero device work.
        template = jax.eval_shape(
            trainer.init_state, jax.random.PRNGKey(cfg.seed), first[0])
        template = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), template)
        try:
            restored = ckpt.restore(template)
            print(f"[restore] resumed from step {int(restored['step'])} "
                  "(template restore, no device init)")
        except (ValueError, TypeError, KeyError) as e:
            # template/checkpoint STRUCTURE mismatch only (e.g. rng saved
            # under a different PRNG implementation — shape/dtype/tree
            # errors orbax raises as ValueError/TypeError/KeyError): fall
            # back to the concrete-init path, which restores against the
            # exact live representation. Anything else (corrupt or
            # partially written checkpoint, IO errors) propagates —
            # re-attempting the same restore after a 6-7 min device init
            # would only double the cost and bury the real error
            # (ADVICE r3).
            print(f"[restore] template restore failed ({type(e).__name__}:"
                  f" {e}); falling back to device-init restore")
            state = trainer.init_state(jax.random.PRNGKey(cfg.seed),
                                       first[0])
            restored = ckpt.restore(fetch_to_host(state))
        if restored is not None:
            state = _fix_restored_rng(restored)
            return state, int(state["step"]), int(state["epoch"])
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), first[0])
    return state, 0, 0


def parse_overrides(pairs):
    """--set key=value pairs -> dotted-path overrides for load_recipe (the
    plain-YAML equivalent of HyperPyYAML/SpeechBrain CLI overrides). Values
    are YAML-parsed so ints/floats/bools/lists work: --set model.remat=true
    --set training.lr_adam=0.0005"""
    import yaml as _yaml

    out = {}
    for kv in pairs or []:
        key, sep, val = kv.partition("=")
        if not sep:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        out[key] = _yaml.safe_load(val)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--train-manifest", required=True)
    ap.add_argument("--valid-manifest", required=True)
    ap.add_argument("--test-manifest")
    ap.add_argument("--output", default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="stop after N optimizer steps (smoke runs)")
    ap.add_argument("--max-hours", type=float, default=None,
                    help="wall-clock budget: checkpoint and exit cleanly "
                         "after this many hours (preemptible-fleet "
                         "deadline); SIGTERM/SIGINT likewise checkpoint "
                         "then exit (training/preempt.py)")
    ap.add_argument("--num-buckets", type=int, default=None,
                    help="override training.num_buckets (e.g. for smoke "
                         "runs on tiny corpora; recipes default to the "
                         "reference's 200)")
    ap.add_argument("--lm-ckpt", default=None,
                    help="LM run dir (from recipes/train_lm.py) for shallow "
                         "fusion in beam validation (lm_weight from the "
                         "recipe, reference yaml:246)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of a few train steps "
                         "to DIR (TensorBoard/XProf)")
    ap.add_argument("--profile-steps", type=int, default=5)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any recipe value by dotted path, e.g. "
                         "--set training.lr_adam=0.0005 --set model.remat=true")
    args = ap.parse_args()

    # multi-host: join the distributed runtime BEFORE first backend use
    # (no-op unless SMT_COORDINATOR/SMT_NUM_PROCESSES/SMT_PROCESS_ID are
    # set — see parallel/launch.py; one process per host, torch DDP's
    # torchrun equivalent)
    if launch.initialize():
        print(f"[dist] process {launch.process_index()}/"
              f"{launch.process_count()}, "
              f"{jax.local_device_count()} local of "
              f"{jax.device_count()} global devices", flush=True)

    cfg = load_recipe(args.recipe,
                      overrides=parse_overrides(args.overrides))
    # hardware RNG for dropout masks (training.rng_impl, default "rbg"):
    # measured -26% step time vs threefry on the flagship (RESULTS.md).
    # Must be set before the first PRNGKey of the run.
    jax.config.update("jax_default_prng_impl", cfg.training.rng_impl)
    if args.num_buckets:
        cfg.training.num_buckets = args.num_buckets
    out_dir = args.output or os.path.join(cfg.output_folder, cfg.name)
    os.makedirs(out_dir, exist_ok=True)

    train_set = read_manifest_csv(args.train_manifest)
    valid_set = read_manifest_csv(args.valid_manifest)

    tokenizer = build_or_load_tokenizer(cfg, out_dir, train_set)

    model, fbank, transducer_model = build_model(cfg)
    mesh = make_mesh()
    tx = build_tx(cfg, estimate_steps_per_epoch(train_set, cfg, mesh))
    a = cfg.augment
    if transducer_model is not None:
        run_transducer(cfg, args, model, transducer_model, fbank, tx, mesh,
                       tokenizer, train_set, valid_set)
        return
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
    logger = FileTrainLogger(os.path.join(out_dir, "train_log.txt"))
    ckpt = CheckpointManager(
        os.path.join(out_dir, "save"),
        max_to_keep=cfg.training.avg_checkpoints,
        interval_minutes=cfg.training.ckpt_interval_minutes,
    )

    state, step, start_epoch = _init_or_restore(
        trainer, ckpt, cfg, tokenizer, train_set, mesh, fbank)
    rng_np = np.random.default_rng(cfg.seed)
    profiler = StepProfiler(args.profile, args.profile_steps)
    stopper = TrainStopper(max_hours=args.max_hours, install=True)
    hb_every = int(os.environ.get("SMT_HEARTBEAT_STEPS", "10"))
    for epoch in EpochCounter(cfg.training.number_of_epochs,
                              start=start_epoch):
        t0 = time.time()
        hb_t = time.time()
        train_losses = []
        for batch, _ in prefetch(batches(train_set, tokenizer, cfg, mesh,
                                         True, cfg.seed + epoch, fbank)):
            if cfg.augment.speed_perturb:
                key = jax.random.PRNGKey(int(rng_np.integers(1 << 31)))
                wav, wav_lens = speed_perturb_batch(
                    key, batch["wav"], batch["wav_lens"],
                    speeds=cfg.augment.speeds,
                )
                batch = dict(batch, wav=wav, wav_lens=wav_lens)
            state, metrics = trainer.train_step(state, batch)
            step += 1
            profiler.step(step, metrics["loss"])
            train_losses.append(metrics["loss"])  # device scalar, no sync
            if hb_every and step % hb_every == 0:
                # one host fetch per window: a truthful mean step time
                # under async dispatch (CLAUDE.md timing methodology)
                loss_now = float(np.asarray(metrics["loss"]))
                now = time.time()
                print(f"[hb] step {step} mean_step_s "
                      f"{(now - hb_t) / hb_every:.2f} loss {loss_now:.3f}",
                      flush=True)
                hb_t = now
            if ckpt.should_save():
                # force: the interval decision was already made (and in
                # multi-process runs broadcast) by should_save above.
                # blocking=False: only the device->host fetch stays on
                # the step path; orbax writes on its background thread
                # (round-3 flagship: 60 s fetch + 39 s write per save)
                t_fetch = time.time()
                host_state = fetch_to_host(state)
                t_save = time.time()
                ckpt.save(step, host_state, force=True, blocking=False)
                print(f"[hb] ckpt step {step}: fetch {t_save - t_fetch:.1f}s"
                      f" dispatch {time.time() - t_save:.1f}s (async write)",
                      flush=True)
                hb_t = time.time()
            if stopper.should_stop(step):
                ckpt.save(step, fetch_to_host(state), force=True)
                print(f"[preempt] checkpoint saved at step {step} "
                      f"({stopper.signame}); resume with the same command")
                return
            if args.steps and step >= args.steps:
                break

        profiler.close()
        # epoch-end checkpoint BEFORE validation: the shared TPU's worker
        # process has been observed to die while compiling/executing the
        # first-epoch eval programs (multi-minute tunnel compiles); saving
        # first means a valid-stage crash costs only that epoch's
        # validation numbers, not the epoch's training. epoch is advanced
        # here (it is unused by the eval path: norm updates are off).
        # Gated by ckpt_interval_minutes (+ always epoch 1, so the eval
        # compile window is covered, and the final epoch): at small
        # corpora an epoch is ~2 min of wall while a forced 89M save
        # costs ~100 s — the interval gate is the reference's own
        # ckpt_interval_minutes contract (transducer yaml:42).
        state = trainer.next_epoch(state)
        last_epoch = (epoch >= cfg.training.number_of_epochs
                      or (args.steps and step >= args.steps))
        if last_epoch or epoch == 1 or ckpt.should_save():
            ckpt.save(step, fetch_to_host(state), force=True,
                      blocking=bool(last_epoch))
        # validation: greedy CTC WER every epoch
        stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                               remove_spaces=cfg.remove_spaces)
        val_losses = []
        seen = set()
        for batch, idx in batches(valid_set, tokenizer, cfg, mesh, False,
                                  0, fbank):
            losses, hyps = trainer.eval_step(state, batch)
            val_losses.append(losses["loss"])
            score_batch(stats, tokenizer, batch, idx, seen, hyps)
        summary = stats.summarize()
        valid_stats = {
            "loss": float(np.mean([float(x) for x in val_losses]))
            if val_losses else 0.0,
            cfg.error_rate.upper(): summary["WER"],
        }
        # beam-search validation every valid_search_interval epochs
        # (reference yaml:141), decoder models only
        if (model.asr.num_decoder_layers > 0
                and cfg.decoding.valid_search_interval > 0
                and epoch % cfg.decoding.valid_search_interval == 0):
            beam_summary = beam_validate(cfg, model, trainer, state,
                                         valid_set, tokenizer, mesh, fbank,
                                         lm_ckpt=args.lm_ckpt)
            valid_stats[f"beam_{cfg.error_rate.upper()}"] = beam_summary["WER"]
        logger.log_stats(
            {"epoch": epoch, "steps": step,
             "epoch_s": round(time.time() - t0, 1)},
            _epoch_loss_stats(train_losses),
            valid_stats,
        )
        if args.steps and step >= args.steps:
            break
    print("training done:", step, "steps")

    if args.test_manifest:
        test_set = read_manifest_csv(args.test_manifest)
        if (model.asr.num_decoder_layers > 0
                and cfg.decoding.test_beam_size > 0):
            # reference test_search: beam test_beam_size (66) + CTC prefix
            # (+ TransformerLM when available), yaml:258-269
            summary = beam_validate(cfg, model, trainer, state, test_set,
                                    tokenizer, mesh, fbank,
                                    lm_ckpt=args.lm_ckpt,
                                    beam_size=cfg.decoding.test_beam_size,
                                    temperature=cfg.decoding.test_temperature)
        else:
            stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                                   remove_spaces=cfg.remove_spaces)
            seen = set()
            for batch, idx in batches(test_set, tokenizer, cfg, mesh,
                                      False, 0, fbank):
                _, hyps = trainer.eval_step(state, batch)
                score_batch(stats, tokenizer, batch, idx, seen, hyps)
            summary = stats.summarize()
        logger.log_stats({"stage": "test"}, test_stats={
            cfg.error_rate.upper(): summary["WER"]})
        print("test", cfg.error_rate.upper(), summary["WER"])


if __name__ == "__main__":
    main()
