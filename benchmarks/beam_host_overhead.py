"""Host-side tracing tax of the beam-search program: the measurement
behind the round-4 beam_programs fix (recipes/train.py:569-645).

Background (benchmarks/RESULTS.md round 4): the pre-fix beam validation
built `make_beam_step` as a fresh closure per eval slice, so EVERY slice
paid a full trace+lower of the joint CTC/attention beam graph on the
host even when the XLA executable was a cache hit — ~15 min for a
112-batch full-dev pass whose device work is seconds. The fix
(`beam_programs`) holds one persistent `jax.jit` pair per beam config,
so trace+lower happens once per input shape and subsequent batches are
C++ fast-path dispatch.

This bench measures the quantity that fix removes: the wall cost of ONE
trace+lower of `search_fn` at flagship geometry (18L d512 encoder
output, 6L decoder, beam 10, vocab from the recipe), via
`jit.lower(...)` on abstract ShapeDtypeStructs — no weights, no device
execution, so it runs on any host including CPU-only ones. Old-path
stage cost ~= n_slices x t_lower; new-path ~= n_shapes x t_lower.

Reference surface: S2STransformerBeamSearcher valid/test stages
(branchformer_summarymixing.yaml:248-269).

Usage: python benchmarks/beam_host_overhead.py [--reps 3] [--batch 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "recipes"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from summarymixing_tpu.config import build_model, load_recipe  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe",
                    default="recipes/LibriSpeech/branchformer_summarymixing.yaml")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--enc-frames", type=int, default=375,
                    help="encoder frames (375 ~ 15 s at 40 ms)")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--max-length", type=int, default=55)
    args = ap.parse_args()

    from train import beam_programs, make_beam_step  # noqa: E402
    from summarymixing_tpu.decoding.s2s_beam import S2SBeamConfig

    cfg = load_recipe(args.recipe)
    model, fbank, _ = build_model(cfg)
    vocab = cfg.model.output_neurons

    # Abstract operand tree: shapes only — jit.lower() traces without
    # concrete data, which is exactly the host work being measured.
    b, t, d = args.batch, args.enc_frames, cfg.model.d_model
    sds = jax.ShapeDtypeStruct
    feats = sds((b, 4 * t, cfg.features.n_mels), jnp.float32)
    flens = sds((b,), jnp.int32)
    toks = sds((b, args.max_length), jnp.int32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), feats,
                            flens, toks)
    eo = sds((b, t, d), jnp.bfloat16)
    el = sds((b,), jnp.int32)
    cl = sds((b, t, vocab), jnp.float32)
    sl = sds((b,), jnp.int32)

    bc = S2SBeamConfig(
        beam_size=args.beam, ctc_weight=cfg.decoding.ctc_weight_decode,
        lm_weight=0.0, bos_id=cfg.model.bos_index,
        eos_id=cfg.model.eos_index, blank_id=cfg.model.blank_index,
        max_length=args.max_length, temperature=1.0)

    # What the OLD path did per slice: a fresh beam_programs-equivalent
    # closure, traced and lowered from scratch. Measure reps of it.
    lowers = []
    for _ in range(args.reps):
        _, search_fn = beam_programs(cfg, model, fbank, None, bc,
                                     None, lambda n, m: None)
        # evict so each rep is a cold trace (the old path's per-slice state)
        from train import _BEAM_PROGRAM_CACHE
        _BEAM_PROGRAM_CACHE.clear()
        t0 = time.perf_counter()
        search_fn.lower(params, eo, el, cl, sl)
        lowers.append(time.perf_counter() - t0)

    t_lower = min(lowers)
    n_slices = 112  # the r4 full-dev pass (3,900 utts)
    print(json.dumps({
        "metric": "beam_search_trace_lower_s",
        "value": round(t_lower, 2), "unit": "s/trace",
        "reps": [round(x, 2) for x in lowers],
        "geometry": {"enc_layers": cfg.model.num_encoder_layers,
                     "dec_layers": cfg.model.num_decoder_layers,
                     "d_model": d, "vocab": vocab, "beam": args.beam,
                     "batch": b, "enc_frames": t,
                     "max_length": args.max_length},
        "old_path_cost_s_112_slices": round(t_lower * n_slices, 1),
        "new_path_cost_s_per_shape": round(t_lower, 2),
        "note": "trace+lower only (jit.lower on abstract shapes): the host "
                "tax the pre-fix per-slice closure paid on every eval "
                "slice and beam_programs pays once per input shape; XLA "
                "compile and device time excluded by construction",
    }))


if __name__ == "__main__":
    main()
