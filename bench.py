"""Benchmark: offline decode throughput of the flagship SummaryMixing
Branchformer (LibriSpeech recipe scale, branchformer_summarymixing.yaml:114-127)
on one chip.

Metric: audio-seconds decoded per wall-clock second per chip (fbank +
encoder + CTC greedy decode, bf16, batch of 30 s utterances). North star
(BASELINE.json): >= 5x the reference's A100 decode throughput per v5e chip.
The reference publishes no raw RTF numbers (README.md:18 is a plot only;
SURVEY.md §6), so `vs_baseline` reports value / (5 * 2000 audio-s/s), where
2000 audio-s/s is an estimate of batched greedy-CTC decode of the same
~89M-param model on an A100 — i.e. vs_baseline >= 1.0 means the 5x-A100
north star is met.

Timing methodology (this environment tunnels to a remote TPU where
block_until_ready can return early and every host fetch costs a ~30 ms
round trip): iterations are chained through a data dependency inside the
loop and ONE scalar is fetched at the end, so wall time = k * device_time +
one round trip.

Prints exactly one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the remote-compile path in this environment
# can take many minutes for the 18-layer graph; cache compilations across
# bench runs (the driver runs bench.py each round).
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_model(mixer, act_int8=False):
    from functools import partial as _partial

    from summarymixing_tpu.models.asr import TransformerASR
    from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer

    gelu_tanh = _partial(jax.nn.gelu, approximate=True)
    vocab = 5000
    asr = TransformerASR(
        tgt_vocab=vocab, input_size=640, d_model=512,
        nhead=1 if mixer == "SummaryMixing" else 4,
        num_encoder_layers=18, num_decoder_layers=0, d_ffn=2048,
        encoder_module="branchformer", attention_type=mixer,
        mode="SummaryMixing", causal=False, csgu_linear_units=3072,
        kernel_size=31, local_proj_hid_dim=(512,), local_proj_out_dim=512,
        summary_hid_dim=(512,), summary_out_dim=512, dropout_rate=0.0,
        branchformer_activation=gelu_tanh,
        act_int8=act_int8,
        dtype=jnp.bfloat16,
    )
    return SpeechRecognizer(asr=asr, vocab_size=vocab, dtype=jnp.bfloat16)


def measure_decode(model, fbank, wav, wav_lens):
    """Marginal-timed decode throughput (audio-s per wall-s) for one model.
    Chained iterations + one scalar fetch; min over repeats (shared chip)."""
    feats0 = fbank(wav[:1])
    params = model.init(
        jax.random.PRNGKey(0), feats0,
        jnp.full((1,), feats0.shape[1], jnp.int32),
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))

    @jax.jit
    def decode(params, wav, wav_lens, carry):
        # carry forces iteration i+1 to depend on iteration i's result
        feats = fbank(wav + carry * 1e-12)
        feat_lens = fbank.frame_lengths(wav_lens)
        out = model.apply(params, feats, feat_lens)
        ids = jnp.argmax(out["ctc_log_probs"], axis=-1)
        return jnp.sum(ids).astype(jnp.float32)

    # XLA's analytic cost model for the compiled program: FLOPs + HBM bytes
    # per call, for MFU / bandwidth-utilisation reporting
    cost = {}
    try:
        # decode is already jitted; lower it directly (a second jit wrap
        # would trace + AOT-compile a distinct nested program)
        ca = decode.lower(
            params, wav, wav_lens, jnp.float32(0.0)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        cost = {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        pass

    float(decode(params, wav, wav_lens, jnp.float32(0.0)))  # compile

    def timed_chain(iters):
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            carry = decode(params, wav, wav_lens, carry * 0.0)
        float(carry)  # single fetch: waits for the whole chain
        return time.perf_counter() - t0

    # chained-marginal methodology lives in ONE place
    # (benchmarks/_timing.py): median of positive estimates (min keeps
    # co-tenancy artifacts), bounded resampling of all-negative rounds
    # so a degraded backend fails clearly (exit 3) instead of hanging
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from _timing import marginal_time

    try:
        per_iter, estimates = marginal_time(
            timed_chain, reps=(5, 55), min_rounds=3, max_rounds=23)
    except RuntimeError as e:
        print(f"bench.py: {e}", file=sys.stderr)
        raise SystemExit(3)
    return per_iter, estimates, n_params, cost


def _wait_for_backend(max_wait_s: float = 2700.0, probe_s: float = 240.0):
    """Fail fast (exit 2) instead of hanging forever when the axon TPU
    backend is unreachable (observed multi-hour outages in this
    environment; a hung backend init ignores SIGTERM, so the probe runs
    in a subprocess under a SIGKILL timeout). Retries because outages
    are usually transient."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    code = ("import jax; d = jax.devices(); assert d; "
            "import jax.numpy as jnp; x = jnp.ones((4, 4)); "
            "assert float((x @ x).sum()) == 64.0")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_s, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print("bench.py: accelerator backend unreachable after "
                  f"{max_wait_s:.0f}s of probing; no number to report",
                  file=sys.stderr)
            raise SystemExit(2)
        print("bench.py: backend probe failed; retrying...",
              file=sys.stderr)
        time.sleep(60.0)


def main():
    from summarymixing_tpu.frontend.features import Fbank

    _wait_for_backend()

    fbank = Fbank()
    batch_size, secs, sr = 8, 30, 16000
    n = secs * sr
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch_size, n)).astype(np.float32))
    wav_lens = jnp.full((batch_size,), n, jnp.int32)
    audio_seconds = batch_size * secs

    per_iter, estimates, n_params, cost = measure_decode(
        build_model("SummaryMixing"), fbank, wav, wav_lens)
    throughput = audio_seconds / per_iter
    # efficiency vs v5e hardware ceilings (bf16 ~197 TFLOPS, HBM 819 GB/s
    # decimal — both peaks are decimal units, so divide raw bytes by 1e9)
    eff = {}
    if cost.get("flops"):
        eff["eff_tflops"] = round(cost["flops"] / per_iter / 1e12, 1)
        eff["mfu"] = round(cost["flops"] / per_iter / 197e12, 3)
        eff["hbm_gb_per_s"] = round(cost["bytes"] / per_iter / 1e9, 0)
        eff["hbm_util"] = round(cost["bytes"] / per_iter / 819e9, 3)

    # honest same-chip baseline: the SAME 18L Branchformer with regularMHA
    # (the reference's own self-attention baseline, README.md:27), measured
    # in this run on this chip
    mha_per_iter, _, _, _ = measure_decode(
        build_model("regularMHA"), fbank, wav, wav_lens)
    mha_throughput = audio_seconds / mha_per_iter

    # north-star scale: 5x an A100 running the reference model. 2000
    # audio-s/s is an ESTIMATE (the reference publishes no decode RTF
    # numbers, README.md:18 is a plot only); the measured same-chip MHA
    # number above is the trustworthy comparison.
    target = 5.0 * 2000.0
    print(json.dumps({
        "metric": "decode_throughput_audio_sec_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(throughput / target, 3),
        "detail": {
            "model": "branchformer-summarymixing-18L-d512",
            "params": n_params,
            "batch": batch_size,
            "utt_secs": secs,
            "dtype": "bfloat16",
            "per_iter_ms": round(per_iter * 1e3, 2),
            "per_iter_ms_all_estimates": [round(e * 1e3, 2) for e in estimates],
            **eff,
            "same_chip_mha_audio_s_per_s": round(mha_throughput, 1),
            "speedup_vs_same_chip_mha": round(throughput / mha_throughput, 2),
            "device": str(jax.devices()[0]),
            "note": "vs_baseline = value / (5 * 2000 audio-s/s A100 "
                    "ESTIMATE — the reference publishes no RTF numbers; "
                    "speedup_vs_same_chip_mha is the measured comparison "
                    "against the reference's own self-attention baseline "
                    "on this chip",
        },
    }))


if __name__ == "__main__":
    main()
