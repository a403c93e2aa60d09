"""Bisect the backward-pass cost of the flagship train step.

train_profile.py measured bwd ~3x fwd (expected ~2x). Measure fwd and
fwd+bwd back-to-back (one invocation, reliable ratios) for ablations:

  full          18L encoder + 6L decoder, dropout 0.1, CTC 0.3 + KL
  no_decoder    decoder_layers 0 (CTC only)
  no_dropout    dropout 0.0
  no_ctc        ctc_weight 0 (KL only)

Run: python benchmarks/train_bwd_bisect.py [--batch 8] [--secs 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from train_bench import build, synth_batch  # noqa: E402
from summarymixing_tpu.frontend.features import Fbank  # noqa: E402
from summarymixing_tpu.parallel.mesh import make_mesh  # noqa: E402
from summarymixing_tpu.training.optim import make_adamw, noam_schedule  # noqa: E402
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig  # noqa: E402


def time_fn(fn, args_, n1, n2):
    def chain(n):
        acc = jnp.zeros(())
        for i in range(n):
            out = fn(*args_, acc)
            acc = out
        return float(acc)

    chain(2)
    t0 = time.time(); chain(n1); t1 = time.time(); chain(n2); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def build_case(name, batch, secs, decoder_layers=6, dropout=True, ctc=0.3):
    model = build("SummaryMixing", 18, decoder_layers, bf16=True)
    if not dropout:
        # rebuild with dropout 0 (modules are frozen dataclasses)
        from summarymixing_tpu.models.asr import TransformerASR
        from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
        act = lambda x: jax.nn.gelu(x, approximate=True)  # noqa: E731
        asr = TransformerASR(
            tgt_vocab=5000, input_size=640, d_model=512, nhead=1,
            num_encoder_layers=18, num_decoder_layers=decoder_layers,
            d_ffn=2048, dropout_rate=0.0, encoder_module="branchformer",
            attention_type="SummaryMixing", mode="SummaryMixing",
            causal=False, csgu_linear_units=3072, local_proj_hid_dim=(512,),
            local_proj_out_dim=512, summary_hid_dim=(512,),
            summary_out_dim=512, branchformer_activation=act, activation=act,
            dtype=jnp.bfloat16,
        )
        model = SpeechRecognizer(asr=asr, vocab_size=5000,
                                 frontend_channels=(64, 32),
                                 frontend_dropout=0.0, dtype=jnp.bfloat16)
    trainer = ASRTrainer(
        model, make_adamw(noam_schedule(8e-4, 30000), weight_decay=0.01),
        Fbank(), TrainerConfig(ctc_weight=ctc, augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch_d = synth_batch(batch, secs)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_d)
    rng0 = jax.random.PRNGKey(1)

    @jax.jit
    def fwd(params, norm_stats, acc):
        r = jax.random.fold_in(rng0, (acc * 0).astype(jnp.int32))
        loss, _ = trainer._forward_loss(
            params, norm_stats, batch_d, r, False,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        return loss + acc * 1e-9

    vg = jax.value_and_grad(
        lambda p, ns, r: trainer._forward_loss(
            p, ns, batch_d, r, False,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))[0])

    @jax.jit
    def fwdbwd(params, norm_stats, acc):
        r = jax.random.fold_in(rng0, (acc * 0).astype(jnp.int32))
        l, g = vg(params, norm_stats, r)
        # keep EVERY gradient live: probing one leaf lets XLA dead-code
        # eliminate most of the backward (measured: 'bwd' 1.2 ms)
        return l + acc * 1e-9 + optax.global_norm(g).astype(jnp.float32) * 1e-9

    return fwd, fwdbwd, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cases", default="full,no_decoder,no_dropout,no_ctc")
    args = ap.parse_args()

    cases = {
        "full": dict(),
        "no_decoder": dict(decoder_layers=0),
        "no_dropout": dict(dropout=False),
        "no_ctc": dict(ctc=0.0),
    }
    out = {}
    for name in args.cases.split(","):
        kw = cases[name]
        fwd, fwdbwd, state = build_case(name, args.batch, args.secs, **kw)
        a = (state["params"], state["norm_stats"])
        f_ms = time_fn(fwd, a, args.reps, args.reps * 3) * 1e3
        fb_ms = time_fn(fwdbwd, a, args.reps, args.reps * 3) * 1e3
        out[name] = {"fwd_ms": round(f_ms, 2), "fwd_bwd_ms": round(fb_ms, 2),
                     "bwd_ms": round(fb_ms - f_ms, 2),
                     "ratio": round((fb_ms - f_ms) / max(f_ms, 1e-9), 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"bench": "train_bwd_bisect", "batch": args.batch,
                      "utt_secs": args.secs, "cases": out,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
