"""Transducer beam-search wall-clock: batched on-device vs host reference.

VERDICT r1 item 6 'done' criterion: the on-device [B, beam] search must be
>= 10x the host per-utterance loop at B=8 / beam=10 through the axon
tunnel. Run: python benchmarks/transducer_beam_bench.py [--frames 100]
"""

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

from summarymixing_tpu.decoding.transducer_search import (
    transducer_beam_search,
    transducer_beam_search_batched,
)
from summarymixing_tpu.models.transducer import TransducerModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=1000)
    ap.add_argument("--host-utts", type=int, default=2,
                    help="host utterances to time (slow), extrapolated")
    args = ap.parse_args()

    m = TransducerModel(vocab=args.vocab, dec_dim=512,
                        joint_dim=640)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((args.batch, args.frames, 512)),
                      jnp.float32)
    toks = jnp.asarray(rng.integers(1, args.vocab, (args.batch, 5)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), enc, toks, method=m.init_all)
    bound = m.bind(params)
    enc_proj = bound.encode_proj(enc)
    lens = jnp.full((args.batch,), args.frames, jnp.int32)

    fn = jax.jit(lambda ep, el: transducer_beam_search_batched(
        ep, el, bound.predictor_init, bound.predictor_step, bound.joint_step,
        beam_size=args.beam))

    # tunnel-aware timing (CLAUDE.md): chain iterations through a real
    # data dependency (scores perturb the next call's input), fetch one
    # scalar, difference two chain lengths, median of positives
    from _timing import marginal_time

    def chain(k):
        t0 = time.time()
        ep = enc_proj
        s = None
        for _ in range(k):
            _, _, s = fn(ep, lens)
            ep = enc_proj + jnp.sum(s) * 1e-12
        float(jnp.sum(s))  # one fetch syncs the whole chain
        return time.time() - t0

    float(jnp.sum(fn(enc_proj, lens)[2]))  # compile + settle
    batched_s, _ = marginal_time(chain, reps=(2, 8))
    print(f"batched: {batched_s:.3f} s for B={args.batch}", flush=True)

    if args.host_utts <= 0:
        print(json.dumps({
            "metric": "transducer_beam_batched",
            "batched_s": round(batched_s, 3), "frames": args.frames,
            "batch": args.batch, "beam": args.beam}), flush=True)
        return
    enc_np = np.asarray(enc_proj)
    t0 = time.time()
    for i in range(args.host_utts):
        transducer_beam_search(
            enc_np[i], args.frames, bound.predictor_init,
            bound.predictor_step, bound.joint_step, beam_size=args.beam)
    host_s = (time.time() - t0) / args.host_utts * args.batch
    print(f"host (extrapolated from {args.host_utts} utts): {host_s:.1f} s "
          f"for B={args.batch}")
    print(json.dumps({
        "metric": "transducer_beam_speedup", "batched_s": round(batched_s, 3),
        "host_s": round(host_s, 1), "speedup": round(host_s / batched_s, 1),
        "frames": args.frames, "batch": args.batch, "beam": args.beam,
    }))


if __name__ == "__main__":
    main()
