"""Evaluation entry: WER/CER on a test manifest with greedy CTC or joint
CTC/attention beam search, optionally on checkpoint-averaged weights.

Usage:
  python recipes/evaluate.py recipes/LibriSpeech/branchformer_summarymixing.yaml \
      --test-manifest test-clean.csv --ckpt results/.../save \
      [--beam] [--avg 10] [--output results/eval]

Replaces the reference's Brain.evaluate + test_search stage (SURVEY.md §3.2:
beam 66, ctc_weight_decode 0.4, avg_checkpoints 10)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _env  # noqa: E402,F401  (same dir: platform + compile-cache bootstrap)
import jax  # noqa: E402
import jax.numpy as jnp
import numpy as np

from summarymixing_tpu.config import build_model, load_recipe
from summarymixing_tpu.data.dataio import read_manifest_csv
from summarymixing_tpu.data.tokenizer import CharTokenizer
from summarymixing_tpu.decoding.s2s_beam import S2SBeamConfig
from summarymixing_tpu.frontend.features import NormStats
from summarymixing_tpu.parallel.mesh import make_mesh
from summarymixing_tpu.training.checkpoint import (
    CheckpointManager,
    average_checkpoints,
    fetch_to_host,
)
from summarymixing_tpu.training.metrics import ErrorRateStats
from summarymixing_tpu.training.optim import make_adamw
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig

from train import batches, score_batch  # noqa: E402  (same directory)


def run_dir_of(ckpt_dir):
    """Run directory that owns a `--ckpt` save dir. Normalizes trailing
    slashes (os.path.dirname('run/save/') is 'run/save' — the save dir
    itself — which silently missed the run dir's persisted tokenizer)
    and accepts either the save dir or the run dir itself."""
    path = os.path.normpath(ckpt_dir)
    return os.path.dirname(path) if os.path.basename(path) == "save" else path


def resolve_tokenizer(cfg, run_dir, fallback_texts=None):
    """Load the tokenizer persisted by train.py in `run_dir`: in-repo
    subword (tokenizer.json), char map (tokenizer_vocab.json), or a
    sentencepiece .model when that wheel is importable. Falls back to
    rebuilding a char map from `fallback_texts` (with a warning — the id
    map may differ from training)."""
    subword_path = os.path.join(run_dir, "tokenizer.json")
    vocab_path = os.path.join(run_dir, "tokenizer_vocab.json")
    if os.path.exists(subword_path):
        from summarymixing_tpu.data.subword import SubwordTokenizer

        return SubwordTokenizer.load(subword_path)
    if os.path.exists(vocab_path):
        import json as _json

        with open(vocab_path) as f:
            return CharTokenizer(vocab=_json.load(f))
    if cfg.tokenizer_type != "char":
        try:
            from summarymixing_tpu.data.tokenizer import SentencePieceTokenizer

            return SentencePieceTokenizer(
                os.path.join(run_dir, "tokenizer.model"))
        except Exception:
            pass
    if cfg.tokenizer_type != "char":
        # NEVER silently decode a subword model through a rebuilt char
        # map: the ids are a different vocabulary and every hypothesis
        # would be garbage (near-100% WER with only a warning)
        raise SystemExit(
            f"no persisted {cfg.tokenizer_type} tokenizer found in "
            f"{run_dir} (expected tokenizer.json / tokenizer.model); "
            "refusing to fall back to a char map for a subword recipe")
    if not fallback_texts:
        raise SystemExit(f"no persisted tokenizer found in {run_dir}")
    print("WARNING: no persisted tokenizer found; rebuilding from the "
          "provided texts (char-id map may differ from training)")
    return CharTokenizer.build(list(fallback_texts))


def make_transducer_eval_trainer(cfg, enc_model, td_model, fbank, mesh):
    """Shared eval-side TransducerTrainer (used here and by serve.py /
    export_model.py): no augmentation or DCT sampling, but the
    transducer.joint_chunk memory knob IS plumbed — a recipe that needs
    the chunked joint to fit in HBM needs it at eval time too."""
    from summarymixing_tpu.training.transducer_trainer import (
        TransducerTrainer,
        TransducerTrainerConfig,
    )

    return TransducerTrainer(
        enc_model, td_model, make_adamw(1e-4), fbank,
        TransducerTrainerConfig(
            ctc_weight=cfg.training.ctc_weight,
            blank_id=cfg.model.blank_index, augment=None, dct=None,
            joint_chunk=cfg.transducer.joint_chunk,
        ),
        mesh=mesh,
    )


def restore_eval_state(state, ckpt_dir, avg):
    """Restore the evaluation-relevant subtrees (params, norm_stats, step,
    epoch) from a checkpoint dir, optionally averaging the last `avg`
    checkpoints (reference avg_checkpoints: 10, yaml:61). The training
    optimizer state may have any structure, so it is never restored."""
    mgr = CheckpointManager(ckpt_dir)
    subset = {k: v for k, v in fetch_to_host(state).items()
              if k in ("params", "norm_stats", "step", "epoch")}
    if avg > 1:
        restored = average_checkpoints(mgr, subset, num=avg)
    else:
        restored = mgr.restore(subset, partial=True)
    if restored is None:
        raise SystemExit(f"no checkpoints in {ckpt_dir}")
    state = dict(state)
    state.update({k: restored[k] for k in subset})
    return state


def _streaming_decode(cfg, args, enc_model, trainer, state, bound, batch,
                      fbank, chunk_times):
    """Chunked streaming inference: fbank + CNN, then per-chunk
    encode_streaming (carried conformer state, reference
    TransformerASR.py:562-653) + incremental transducer greedy decode with
    carried predictor state. Records per-chunk wall time."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_greedy_decode,
    )
    from summarymixing_tpu.models.asr import DynChunkTrainConfig

    eparams = {"params": state["params"]["encoder"]}
    feats = fbank(batch["wav"])
    feat_lens = fbank.frame_lengths(batch["wav_lens"])
    feats, _ = trainer.normalize(feats, state["norm_stats"])
    src = enc_model.apply(eparams, feats, method=enc_model.frontend)
    enc_lens = enc_model.apply(eparams, feat_lens,
                               method=enc_model.subsampled_length)
    b, t_enc = src.shape[0], src.shape[1]
    chunk = args.chunk_size
    dynchunk = DynChunkTrainConfig(chunk_size=chunk,
                                   left_context_size=args.left_context)
    st = enc_model.apply(eparams, b, dynchunk,
                         method=enc_model.streaming_init)
    n_chunks = -(-t_enc // chunk)
    pad = n_chunks * chunk - t_enc
    if pad:
        src = jnp.pad(src, ((0, 0), (0, pad), (0, 0)))
    carry, toks, lens = None, None, None
    for c in range(n_chunks):
        tc0 = time.time()
        src_c = src[:, c * chunk:(c + 1) * chunk]
        enc_c, st = enc_model.apply(eparams, src_c, st,
                                    method=enc_model.encode_streaming_chunk)
        valid = jnp.clip(enc_lens - c * chunk, 0, chunk)
        out = transducer_greedy_decode(
            bound.encode_proj(enc_c), valid, bound.predictor_init,
            bound.predictor_step, bound.joint_step,
            blank_id=cfg.model.blank_index,
            max_tokens=2 * t_enc, carry=carry, return_carry=True,
        )
        toks, lens, carry = out
        # a host fetch is the only reliable sync through the axon tunnel
        # (block_until_ready can return early; see CLAUDE.md)
        _ = np.asarray(lens[:1])
        chunk_times.append(time.time() - tc0)
    return toks, lens


def eval_transducer(cfg, args, enc_model, td_model, fbank, mesh, tokenizer,
                    test_set):
    """Transducer test decode: greedy (valid-style) or --beam with beam 10 +
    state/expand-beam pruning + optional RNNLM fusion (reference transducer
    yaml:375-393), batched on-device."""
    from summarymixing_tpu.decoding.transducer_search import (
        transducer_beam_search_batched,
        transducer_greedy_decode,
    )
    from train import load_rnnlm  # noqa: E402

    trainer = make_transducer_eval_trainer(cfg, enc_model, td_model, fbank,
                                           mesh)
    example = next(iter(batches(test_set, tokenizer, cfg, mesh, False, 0,
                                fbank)))[0]
    state = restore_eval_state(
        trainer.init_state(jax.random.PRNGKey(0), example), args.ckpt,
        args.avg)

    bound = td_model.bind({"params": state["params"]["transducer"]})
    lm_init, lm_step = (load_rnnlm(cfg, args.lm_ckpt) if args.beam
                        else (None, None))
    stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                           remove_spaces=cfg.remove_spaces,
                           keep_details=bool(args.output))
    t0 = time.time()
    n_utts = 0
    seen = set()
    nbest_rows = {}  # utt idx -> top-N [{text, score}] (--nbest > 1)
    chunk_times = []
    stream_fns = None
    if getattr(args, "streaming_full", False):
        from summarymixing_tpu.frontend.features import InputNormalization
        from summarymixing_tpu.streaming import make_streaming_infer_fns

        normalizer = InputNormalization(
            update_until_epoch=cfg.features.normalize_update_until_epoch)
        stream_fns = make_streaming_infer_fns(
            enc_model, td_model, fbank, normalizer, state["params"],
            state["norm_stats"], chunk_frames=args.chunk_size,
            left_context_chunks=args.left_context,
            blank_id=cfg.model.blank_index)
    n_batches = 0
    for batch, idx in batches(test_set, tokenizer, cfg, mesh, False, 0,
                              fbank):
        n_batches += 1
        print(f"[eval] batch {n_batches} ({n_utts} utts scored, "
              f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if stream_fns is not None:
            from summarymixing_tpu.streaming import run_stream

            init_fn, step_fn, info = stream_fns
            tc0 = time.time()
            toks, lens = run_stream(init_fn, step_fn, batch["wav"],
                                    batch["wav_lens"],
                                    info["chunk_samples"])
            # run_stream executes ceil(n/cs) + 2 steps (flush chunks)
            n_steps = -(-batch["wav"].shape[1]
                        // info["chunk_samples"]) + 2
            chunk_times.extend([(time.time() - tc0) / n_steps] * n_steps)
        elif args.streaming:
            toks, lens = _streaming_decode(cfg, args, enc_model, trainer,
                                           state, bound, batch, fbank,
                                           chunk_times)
        else:
            _, (enc_out, enc_lens) = trainer.eval_step(state, batch)
            enc_proj = bound.encode_proj(enc_out)
            if args.beam:
                kw = dict(
                    blank_id=cfg.model.blank_index,
                    bos_id=cfg.model.bos_index,
                    beam_size=cfg.decoding.beam_size,
                    state_beam=cfg.decoding.state_beam,
                    expand_beam=cfg.decoding.expand_beam,
                    lm_step=lm_step, lm_init=lm_init,
                    lm_weight=cfg.decoding.lm_weight if lm_step else 0.0,
                )
                if args.nbest > 1:
                    tn, ln, sn = (np.asarray(a)
                                  for a in transducer_beam_search_batched(
                                      enc_proj, enc_lens,
                                      bound.predictor_init,
                                      bound.predictor_step,
                                      bound.joint_step,
                                      nbest=args.nbest, **kw))
                    toks, lens = tn[:, 0], ln[:, 0]
                    for i, u in enumerate(idx):
                        if int(u) not in nbest_rows:
                            nbest_rows[int(u)] = [
                                {"text": tokenizer.decode(
                                    tn[i, r, : ln[i, r]]),
                                 "score": float(sn[i, r])}
                                for r in range(tn.shape[1])]
                else:
                    toks, lens, _ = transducer_beam_search_batched(
                        enc_proj, enc_lens, bound.predictor_init,
                        bound.predictor_step, bound.joint_step, **kw)
            else:
                toks, lens = transducer_greedy_decode(
                    enc_proj, enc_lens, bound.predictor_init,
                    bound.predictor_step, bound.joint_step,
                    blank_id=cfg.model.blank_index,
                )
        n_utts += score_batch(stats, tokenizer, batch, idx, seen,
                              toks, lens)

    summary = stats.summarize()
    summary["utterances"] = n_utts
    summary["wall_s"] = round(time.time() - t0, 1)
    audio_s = sum(u.duration for u in test_set)
    summary["audio_s"] = round(audio_s, 1)
    # wall-clock RTF incl. batching/host work (the reference reports none)
    summary["rtf"] = round(summary["wall_s"] / max(audio_s, 1e-9), 5)
    if stream_fns is not None:
        summary["decode"] = "transducer_streaming_full_pipeline"
        summary["chunk_frames"] = args.chunk_size
        summary["left_context_chunks"] = args.left_context
        if chunk_times:
            # a batch MEAN (run_stream is driven whole-batch here), not a
            # per-chunk latency distribution — benchmark the deployable
            # per-tick latency with benchmarks/streaming_session_bench.py
            summary["chunk_ms_mean"] = round(
                float(np.mean(chunk_times)) * 1e3, 2)
    elif args.streaming:
        summary["decode"] = "transducer_streaming_greedy"
        summary["chunk_frames"] = args.chunk_size
        summary["left_context_chunks"] = args.left_context
        if chunk_times:
            ct = sorted(chunk_times)
            summary["chunk_latency_ms_p50"] = round(
                ct[len(ct) // 2] * 1e3, 2)
            summary["chunk_latency_ms_p90"] = round(
                ct[min(len(ct) - 1, int(len(ct) * 0.9))] * 1e3, 2)
    else:
        summary["decode"] = (
            ("transducer_beam+lm" if lm_step else "transducer_beam")
            if args.beam else "transducer_greedy"
        )
    if nbest_rows:
        summary["nbest"] = args.nbest
    print(json.dumps(summary))
    if args.output:
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "eval.json"), "w") as f:
            json.dump(summary, f, indent=2)
        write_details(stats, cfg, args.output, test_set)
        if nbest_rows:
            with open(os.path.join(args.output, "nbest.jsonl"), "w") as f:
                for u, hyps_n in sorted(nbest_rows.items()):
                    f.write(json.dumps(
                        {"id": test_set[u].utt_id, "nbest": hyps_n}) + "\n")


def write_details(stats, cfg, out_dir, test_set):
    """Per-utterance alignment report (SpeechBrain ErrorRateStats.
    write_stats; the reference AISHELL recipe's cer_file, yaml:18):
    <out_dir>/{wer,cer}_details.txt, worst utterances first."""
    name = f"{cfg.error_rate}_details.txt"
    path = os.path.join(out_dir, name)
    stats.write_stats(path, id_map={i: u.utt_id
                                    for i, u in enumerate(test_set)})
    # stderr: stdout's last line is the JSON summary (consumed by tests
    # and tooling)
    print("per-utterance details ->", path, file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--test-manifest", required=True)
    ap.add_argument("--ckpt", required=True, help="checkpoint directory")
    ap.add_argument("--beam", action="store_true",
                    help="joint CTC/attention beam search (decoder models)")
    ap.add_argument("--avg", type=int, default=0,
                    help="average the last N checkpoints (reference "
                         "avg_checkpoints)")
    ap.add_argument("--lm-ckpt", default=None,
                    help="LM run dir (recipes/train_lm.py) for shallow "
                         "fusion at lm_weight (reference yaml:246: 0.60)")
    ap.add_argument("--streaming", action="store_true",
                    help="chunked streaming inference (transducer recipes; "
                         "reference TransformerASR.py:562-653)")
    ap.add_argument("--streaming-full", action="store_true",
                    dest="streaming_full",
                    help="fully-chunked raw-audio streaming pipeline "
                         "(summarymixing_tpu/streaming.py: fbank+CNN "
                         "chunked too — the deployable path exported by "
                         "export_model.py --streaming)")
    ap.add_argument("--chunk-size", type=int, default=16,
                    help="encoder frames per streaming chunk (40 ms each)")
    ap.add_argument("--left-context", type=int, default=4,
                    help="left-context CHUNKS carried across steps")
    ap.add_argument("--seq-parallel", type=int, default=0, metavar="N",
                    help="shard the encoder's time axis over N devices "
                         "(parallel/sequence.py) for the greedy decode — "
                         "the long-form scaling path; requires "
                         "n_devices %% N == 0 and greedy (non-beam) mode")
    ap.add_argument("--nbest", type=int, default=1,
                    help="with --beam: also emit the top-N hypotheses per "
                         "utterance (nbest.jsonl under --output; rank 0 "
                         "scores the WER)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any recipe value by dotted path, e.g. "
                         "--set training.lr_adam=0.0005 --set model.remat=true")
    args = ap.parse_args()
    if args.nbest > 1 and not args.beam:
        raise SystemExit("--nbest requires --beam")

    from train import parse_overrides  # noqa: E402

    cfg = load_recipe(args.recipe,
                      overrides=parse_overrides(args.overrides))
    test_set = read_manifest_csv(args.test_manifest)
    # Use the TRAINING tokenizer (persisted by train.py) — rebuilding from
    # the test manifest would shift the char-id map.
    tokenizer = resolve_tokenizer(cfg, run_dir_of(args.ckpt),
                                  fallback_texts=[u.text for u in test_set])

    model, fbank, td_model = build_model(cfg)
    mesh = make_mesh()
    if td_model is not None:
        if args.seq_parallel > 1:
            raise SystemExit(
                "--seq-parallel currently supports the attention recipes' "
                "greedy CTC decode only (the transducer decode loop is "
                "token-sequential)")
        return eval_transducer(cfg, args, model, td_model, fbank, mesh,
                               tokenizer, test_set)
    trainer = ASRTrainer(
        model, make_adamw(1e-4), fbank,
        TrainerConfig(ctc_weight=cfg.training.ctc_weight, augment=None,
                      blank_id=cfg.model.blank_index,
                      bos_id=cfg.model.bos_index, eos_id=cfg.model.eos_index),
        mesh=mesh,
    )

    example = next(iter(batches(test_set, tokenizer, cfg, mesh, False, 0,
                                fbank)))[0]
    state = restore_eval_state(
        trainer.init_state(jax.random.PRNGKey(0), example), args.ckpt,
        args.avg)

    stats = ErrorRateStats(split_tokens=(cfg.error_rate == "cer"),
                           remove_spaces=cfg.remove_spaces,
                           keep_details=bool(args.output))
    params = {"params": state["params"]}

    sp_decode = None
    if args.seq_parallel > 1:
        if args.beam:
            raise SystemExit("--seq-parallel supports greedy decode only "
                             "(the beam loop is token-sequential)")
        from summarymixing_tpu.decoding.ctc import collapse_ctc
        from summarymixing_tpu.parallel.sequence import (
            make_seq_mesh,
            sequence_parallel_ctc_decode,
        )

        n_dev = len(jax.devices())
        if n_dev % args.seq_parallel:
            raise SystemExit(f"{n_dev} devices not divisible by "
                             f"--seq-parallel {args.seq_parallel}")
        sp_mesh = make_seq_mesh(n_data=n_dev // args.seq_parallel,
                                n_seq=args.seq_parallel)
        sp_decode = sequence_parallel_ctc_decode(
            model, sp_mesh, blank_id=cfg.model.blank_index)

    from train import make_lm_fusion, static_decode_length  # noqa: E402

    lm_step, lm_make_cache = (make_lm_fusion(cfg, args.lm_ckpt)
                              if args.beam else (None, None))
    lmax = static_decode_length(cfg, test_set, mesh, fbank) if args.beam \
        else 0
    encode_fn = search_fn = bc = None
    if args.beam:
        beam = cfg.decoding.test_beam_size
        # nothing encoder-sized is beam-tiled (the O(beam) tiles and
        # their per-step gathers OOM'd v5e HBM at beam 66): the CTC
        # lattice stays [B, T, V], make_beam_step keeps the
        # cross-attention K/V per-utterance, and wide buckets decode
        # in row-capped slices (decoding.max_beam_rows). bc and the
        # program pair are built ONCE, above the batch loop (advisor
        # round 4): bc must stay per-RUN — a per-batch field added here
        # would silently compile a new program pair per batch.
        bc = S2SBeamConfig(
            beam_size=beam,
            ctc_weight=cfg.decoding.ctc_weight_decode,
            lm_weight=cfg.decoding.lm_weight if lm_step else 0.0,
            bos_id=cfg.model.bos_index, eos_id=cfg.model.eos_index,
            blank_id=cfg.model.blank_index,
            max_length=lmax,
            temperature=cfg.decoding.test_temperature,
        )
        from train import beam_programs, beam_slices  # noqa: E402

        encode_fn, search_fn = beam_programs(
            cfg, model, fbank, trainer, bc, lm_step, lm_make_cache,
            nbest=args.nbest)
    t0 = time.time()
    n_utts = 0
    seen = set()
    nbest_rows = {}  # utt idx -> top-N [{text, score}] (--nbest > 1)
    n_batches = 0
    for batch, idx in batches(test_set, tokenizer, cfg, mesh, False, 0, fbank):
        n_batches += 1
        # stderr progress heartbeat (stdout is the JSON contract and may be
        # block-buffered under nohup; the shared chip's throughput varies 3x
        # run to run, so long evals need visible progress)
        print(f"[eval] batch {n_batches} ({n_utts} utts scored, "
              f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if args.beam:
            enc_out, enc_lens, ctc_lp, scorer_lens = encode_fn(
                params, state["norm_stats"], batch["wav"],
                batch["wav_lens"])
            row_map = []   # hyp row -> position in this batch's idx
            toks_l, lens_l = [], []
            for s_idx, s_pos, eo, el, cl, sl in beam_slices(
                    cfg.decoding.max_beam_rows, beam, idx,
                    np.arange(len(idx)), enc_out, enc_lens, ctc_lp,
                    scorer_lens):
                if args.nbest > 1:
                    tn, ln, sn = (np.asarray(a) for a in search_fn(
                        params, eo, el, cl, sl))
                    tk, ll = tn[:, 0], ln[:, 0]
                    for i, u in enumerate(s_idx):
                        if int(u) not in nbest_rows:
                            nbest_rows[int(u)] = [
                                {"text":
                                 tokenizer.decode(tn[i, r, : ln[i, r]]),
                                 "score": float(sn[i, r])}
                                for r in range(tn.shape[1])]
                else:
                    tk, ll, _ = search_fn(params, eo, el, cl, sl)
                    tk, ll = np.asarray(tk), np.asarray(ll)
                toks_l.append(tk)
                lens_l.append(ll)
                row_map.extend(int(p) for p in s_pos)
            toks = np.concatenate(toks_l, axis=0)
            lens = np.concatenate(lens_l, axis=0)
            # undo the repeat-padding/reorder: one hyp row per batch row
            # (later duplicates overwrite with identical hyps)
            by_pos = {p: i for i, p in enumerate(row_map)}
            order = [by_pos[p] for p in range(len(idx))]
            toks, lens = toks[order], lens[order]
            hyps = [list(toks[i, : lens[i]]) for i in range(toks.shape[0])]
        elif sp_decode is not None:
            # pad the WAV (not the features) so the frame count divides
            # the seq axis: appended zero samples only append silence
            # frames past each utterance's feat_len — valid frames are
            # untouched, unlike feature-time padding which perturbs the
            # frontend conv boundary (parallel/sequence.py)
            wav = batch["wav"]
            rem = (-fbank.num_frames(wav.shape[1])) % args.seq_parallel
            if rem:
                wav = jnp.pad(wav, ((0, 0), (0, rem * fbank.hop_length)))
            feats = fbank(wav)
            feat_lens = fbank.frame_lengths(batch["wav_lens"])
            feats, _ = trainer.normalize(feats, state["norm_stats"])
            ids, keep_mask, _ = sp_decode(params, feats, feat_lens)
            hyps = collapse_ctc(ids, keep_mask)
        else:
            _, hyps = trainer.eval_step(state, batch)
        # eval batches are padded to fixed size by repeating utterances;
        # score each utterance once
        n_utts += score_batch(stats, tokenizer, batch, idx, seen, hyps)

    summary = stats.summarize()
    summary["utterances"] = n_utts
    summary["wall_s"] = round(time.time() - t0, 1)
    audio_s = sum(u.duration for u in test_set)
    summary["audio_s"] = round(audio_s, 1)
    # wall-clock RTF incl. batching/host work (the reference reports none)
    summary["rtf"] = round(summary["wall_s"] / max(audio_s, 1e-9), 5)
    summary["decode"] = (
        ("beam+lm" if lm_step else "beam") if args.beam
        else ("greedy_ctc_seq_parallel" if sp_decode is not None
              else "greedy_ctc")
    )
    if sp_decode is not None:
        summary["seq_parallel"] = args.seq_parallel
    if lm_step:
        summary["lm_weight"] = cfg.decoding.lm_weight
    if nbest_rows:
        summary["nbest"] = args.nbest
    print(json.dumps(summary))
    if args.output:
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "eval.json"), "w") as f:
            json.dump(summary, f, indent=2)
        write_details(stats, cfg, args.output, test_set)
        if nbest_rows:
            with open(os.path.join(args.output, "nbest.jsonl"), "w") as f:
                for u, hyps_n in sorted(nbest_rows.items()):
                    f.write(json.dumps(
                        {"id": test_set[u].utt_id, "nbest": hyps_n}) + "\n")


if __name__ == "__main__":
    main()
