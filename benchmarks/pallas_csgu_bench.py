"""Fused cgMLP-branch kernel vs XLA at recipe scale (VERDICT r1 item 7:
the whole-branch fusion experiment, batch 8/32/64).

Run: python benchmarks/pallas_csgu_bench.py [--t 768] [--tile 256]
One JSON line per batch size."""

from __future__ import annotations

import argparse
import functools
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

from summarymixing_tpu.ops.convolution import ConvolutionBranch
from summarymixing_tpu.ops.pallas_csgu import fused_convolution_branch

gelu_tanh = functools.partial(jax.nn.gelu, approximate=True)
D, UNITS, K = 512, 3072, 31


def marginal(fn, x, reps=(4, 24)):
    """Chained-iteration marginal timing (CLAUDE.md methodology); the
    shared median-of-positives helper resamples all-negative rounds
    instead of returning None (which crashed at round()) and avoids the
    co-tenancy bias of keeping the min."""
    from _timing import marginal_time

    def chain(n):
        t0 = time.perf_counter()
        xx = x
        for _ in range(n):
            out = fn(xx)
            xx = x + out * 1e-12
        float(jnp.sum(out[:1, :1, :1]).astype(jnp.float32))
        return time.perf_counter() - t0

    float(jnp.sum(fn(x)[:1, :1, :1]).astype(jnp.float32))  # compile
    est, _ = marginal_time(chain, reps=reps)
    return est


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=768)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--batches", default="8,32,64")
    args = ap.parse_args()

    branch = ConvolutionBranch(input_size=D, linear_units=UNITS,
                               kernel_size=K, activation=gelu_tanh,
                               dropout_rate=0.0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, args.t, D)), jnp.bfloat16)
    params = branch.init(jax.random.PRNGKey(0), x0)["params"]

    xla_fn = jax.jit(lambda x: branch.apply({"params": params}, x))
    pl_fn = jax.jit(lambda x: fused_convolution_branch(
        x, None, params, kernel_size=K, tile=args.tile))

    for b in [int(s) for s in args.batches.split(",")]:
        x = jnp.asarray(rng.standard_normal((b, args.t, D)), jnp.bfloat16)
        # correctness on-chip first
        diff = float(jnp.max(jnp.abs(
            xla_fn(x).astype(jnp.float32) - pl_fn(x).astype(jnp.float32))))
        t_xla = marginal(xla_fn, x)
        t_pl = marginal(pl_fn, x)
        flops = 2 * b * args.t * (D * UNITS + (UNITS // 2) * D)
        print(json.dumps({
            "bench": "csgu_branch", "batch": b, "t": args.t,
            "tile": args.tile,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / t_pl, 2),
            "xla_tflops": round(flops / t_xla / 1e12, 1),
            "pallas_tflops": round(flops / t_pl / 1e12, 1),
            "max_abs_diff": diff,
        }), flush=True)


if __name__ == "__main__":
    main()
