"""Training-throughput benchmark: the reference's headline claim is
"train ~30% faster with roughly half the memory" for SummaryMixing vs
self-attention (reference README.md:2,18, Branchformer rows :27,34). This
measures the full jitted train step (fbank -> normalize -> CNN -> encoder
[-> decoder] -> CTC+KL loss -> grads -> AdamW update) at recipe scale on
the real chip for both mixers, plus the transducer step.

Timing: chained steps with a real data dependency (the donated train state
threads step N's params into step N+1), one scalar fetch at the end;
difference two chain lengths to cancel dispatch/tunnel overhead
(CLAUDE.md timing methodology). Peak HBM from device.memory_stats().

Run: python benchmarks/train_bench.py [--layers 18] [--batch 16] [--secs 15]
Emits one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from summarymixing_tpu.frontend.features import Fbank
from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.ops.linear import gelu_exact
from summarymixing_tpu.parallel.mesh import make_mesh
from summarymixing_tpu.training.optim import make_adamw, noam_schedule
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig

VOCAB = 5000


def build(mixer: str, layers: int, num_decoder_layers: int, bf16: bool,
          remat: bool = False):
    act = lambda x: jax.nn.gelu(x, approximate=True)  # noqa: E731
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=640, d_model=512,
        nhead=1 if mixer == "SummaryMixing" else 4,
        num_encoder_layers=layers, num_decoder_layers=num_decoder_layers,
        d_ffn=2048, dropout_rate=0.1, encoder_module="branchformer",
        attention_type=mixer, mode="SummaryMixing", causal=False,
        csgu_linear_units=3072, local_proj_hid_dim=(512,),
        local_proj_out_dim=512, summary_hid_dim=(512,), summary_out_dim=512,
        branchformer_activation=act, activation=act, remat=remat,
        dtype=jnp.bfloat16 if bf16 else None,
    )
    return SpeechRecognizer(
        asr=asr, vocab_size=VOCAB, frontend_channels=(64, 32),
        frontend_dropout=0.1, dtype=jnp.bfloat16 if bf16 else None,
    )


def synth_batch(batch: int, secs: float, sr: int = 16000, umax: int = 40):
    rng = np.random.default_rng(0)
    n = int(secs * sr)
    return {
        "wav": jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32),
        "wav_lens": jnp.full((batch,), n, jnp.int32),
        "tokens": jnp.asarray(rng.integers(3, VOCAB, (batch, umax)), jnp.int32),
        "token_lens": jnp.full((batch,), umax, jnp.int32),
    }


def peak_hbm_gb():
    """Peak HBM if the backend exposes it (the axon tunnel does not —
    returns None there rather than a misleading 0)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
    return round(peak / 2**30, 2) if peak else None


def run_chain(trainer, state, batch, n):
    for _ in range(n):
        state, metrics = trainer.train_step(state, batch)
    # host fetch of one scalar = the only reliable sync through the tunnel
    return float(metrics["loss"]), state


def bench_attention(mixer, args):
    model = build(mixer, args.layers, args.decoder_layers, args.bf16,
                  remat=args.remat)
    trainer = ASRTrainer(
        model, make_adamw(noam_schedule(8e-4, 30000), weight_decay=0.01),
        Fbank(), TrainerConfig(ctc_weight=0.3, augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch = synth_batch(args.batch, args.secs)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # XLA's own memory accounting for the compiled train step — works even
    # where the runtime hides device.memory_stats() (the axon tunnel)
    mem = None
    try:
        compiled = trainer._train_step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        mem = {
            "xla_temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "xla_arg_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "xla_peak_est_gb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 2**30, 3),
        }
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        if ca.get("flops"):
            mem["flops_per_step"] = float(ca["flops"])
    except Exception:
        pass
    _, state = run_chain(trainer, state, batch, 2)   # compile + warm
    n1, n2 = args.reps, args.reps * 3
    t0 = time.time()
    _, state = run_chain(trainer, state, batch, n1)
    t1 = time.time()
    _, state = run_chain(trainer, state, batch, n2)
    t2 = time.time()
    step_s = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    audio_s = args.batch * args.secs
    print(json.dumps({
        "bench": "train_step", "mixer": mixer, "layers": args.layers,
        "remat": args.remat,
        "decoder_layers": args.decoder_layers, "batch": args.batch,
        "utt_secs": args.secs, "precision": "bf16" if args.bf16 else "fp32",
        "rng_impl": "threefry" if args.threefry else "rbg",
        "step_s": round(step_s, 4),
        "audio_s_per_s": round(audio_s / step_s, 1),
        "peak_hbm_gb": peak_hbm_gb(),
        "memory": mem,
        "eff_tflops": (round(mem["flops_per_step"] / step_s / 1e12, 1)
                       if mem and mem.get("flops_per_step") else None),
        # MFU vs the v5e bf16 peak (197 TFLOPS); fp32 matmuls decompose to
        # multiple MXU passes with a different ceiling, so only bf16 runs
        # get an MFU figure
        "mfu": (round(mem["flops_per_step"] / step_s / 197e12, 3)
                if args.bf16 and mem and mem.get("flops_per_step")
                else None),
    }))



def bench_transducer(args):
    """Streaming-transducer train step at recipe scale (SURVEY.md §3.3:
    fbank -> 12L SummaryMixing-fast Conformer -> LSTM predictor -> Tjoint
    -> RNN-T loss + CTC aux, with DCT chunk sampling), built directly from
    the LibriSpeech transducer recipe config."""
    from summarymixing_tpu.config import build_model, load_recipe
    from summarymixing_tpu.training.transducer_trainer import (
        DynChunkTrainSamplerConfig,
        TransducerTrainer,
        TransducerTrainerConfig,
    )

    cfg = load_recipe(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "recipes/LibriSpeech/conformer_summarymixing_transducer.yaml"))
    enc_model, fbank, td_model = build_model(cfg)
    t_cfg = cfg.transducer
    trainer = TransducerTrainer(
        enc_model, td_model,
        make_adamw(noam_schedule(8e-4, 25000), weight_decay=0.0),
        fbank,
        TransducerTrainerConfig(
            ctc_weight=cfg.training.ctc_weight,
            blank_id=cfg.model.blank_index,
            augment=None,
            joint_chunk=args.joint_chunk,
            dct=DynChunkTrainSamplerConfig(
                chunkwise_prob=t_cfg.chunkwise_prob,
                chunk_size_min=t_cfg.chunk_size_min,
                chunk_size_max=t_cfg.chunk_size_max,
                limited_left_context_prob=t_cfg.limited_left_context_prob,
                left_context_chunks_min=t_cfg.left_context_chunks_min,
                left_context_chunks_max=t_cfg.left_context_chunks_max,
            ),
        ),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch = synth_batch(args.batch, args.secs,
                        umax=40)
    batch["tokens"] = jnp.asarray(
        np.random.default_rng(0).integers(
            1, cfg.model.output_neurons, (args.batch, 40)), jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    mem = None
    try:
        compiled = trainer._train_step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        mem = {
            "xla_temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "xla_peak_est_gb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 2**30, 3),
        }
    except Exception:
        pass
    _, state = run_chain(trainer, state, batch, 2)
    n1, n2 = args.reps, args.reps * 3
    t0 = time.time()
    _, state = run_chain(trainer, state, batch, n1)
    t1 = time.time()
    _, state = run_chain(trainer, state, batch, n2)
    t2 = time.time()
    step_s = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(json.dumps({
        "bench": "transducer_train_step",
        "model": "conformer-summarymixing-fast-12L-transducer (recipe cfg)",
        "batch": args.batch, "utt_secs": args.secs,
        "rng_impl": "threefry" if args.threefry else "rbg",
        "joint_chunk": args.joint_chunk,
        "step_s": round(step_s, 4),
        "audio_s_per_s": round(args.batch * args.secs / step_s, 1),
        "memory": mem,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--decoder-layers", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--mixers", default="SummaryMixing,regularMHA")
    ap.add_argument("--threefry", action="store_true",
                    help="use the threefry PRNG instead of rbg (slower "
                         "dropout; implementation-stable stream)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder layers (memory for FLOPs)")
    ap.add_argument("--transducer", action="store_true",
                    help="bench the streaming-transducer train step instead")
    ap.add_argument("--joint-chunk", type=int, default=0,
                    help="transducer only: compute the joint in T-chunks "
                         "of this many encoder frames (0 = dense "
                         "[B,T,U,V]; losses/transducer.py)")
    args = ap.parse_args()
    # hardware RNG (rbg) for dropout, matching the recipe default
    # (training.rng_impl): threefry mask generation costs ~26% of the
    # step. Configured HERE, from the parsed flag, before the first
    # PRNGKey of the process — the old raw-sys.argv sniff at import time
    # both mislabeled prefix-matched flags (--threef) and mutated global
    # jax config as a side effect of `import train_bench`.
    jax.config.update("jax_default_prng_impl",
                      "threefry2x32" if args.threefry else "rbg")
    if args.transducer:
        bench_transducer(args)
        return
    mixers = args.mixers.split(",")
    if len(mixers) > 1:
        # one process per mixer: device.memory_stats() peaks are
        # process-cumulative, so peak-HBM must be measured in isolation
        import subprocess
        for mixer in mixers:
            argv = [sys.executable, os.path.abspath(__file__),
                    "--mixers", mixer, "--layers", str(args.layers),
                    "--decoder-layers", str(args.decoder_layers),
                    "--batch", str(args.batch), "--secs", str(args.secs),
                    "--reps", str(args.reps)]
            if args.remat:
                argv.append("--remat")
            if args.threefry:
                argv.append("--threefry")
            if not args.bf16:
                argv.append("--fp32")
            subprocess.run(argv, check=True)
        return
    bench_attention(mixers[0], args)


if __name__ == "__main__":
    main()
