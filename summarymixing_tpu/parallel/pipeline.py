"""Pipeline parallelism: encoder layer stack split into stages over a
"pipe" mesh axis, microbatches streamed GPipe-style with ppermute.

The reference scales with data parallelism only (SURVEY.md §2.4) — its
~100M-param models fit on one GPU. This module is the TPU-native scaling
path for DEEPER variants than fit per chip: the structurally-identical
encoder layers (stacked [L, ...] params, models/branchformer.py
scan_layers=True layout) are partitioned into S contiguous stages, each
stage's slice of the stacked params lives on one slice of the "pipe"
mesh axis, and M microbatches flow through the stages with
`jax.lax.ppermute` (one [b, T, D] activation hop per step over ICI).
Utilisation is the standard GPipe bubble: M / (M + S - 1).

Composes with data parallelism: the mesh is ("data", "pipe") and each
microbatch's batch dim stays sharded over "data" inside the shard_map,
so grad/eval all-reduces ride "data" while activations hop over "pipe".

This is deliberately an explicit shard_map + ppermute schedule rather
than GSPMD auto-sharding: pipelining is the one parallelism family where
the SCHEDULE (who computes which microbatch when) is the design, so it
must be written, not inferred (scaling-book pipelining recipe).

Example
-------
>>> import jax, jax.numpy as jnp
>>> from flax import linen as nn
>>> class Scale(nn.Module):  # stand-in layer with the encoder signature
...     @nn.compact
...     def __call__(self, x, src_mask, pad_mask, pos_embs, deterministic):
...         return x * self.param("s", nn.initializers.ones, ())
>>> mesh = make_pipeline_mesh(n_data=1, n_pipe=2,
...                           devices=jax.devices()[:2])
>>> stacked = {"s": jnp.asarray([2.0, 3.0])}       # a 2-layer stack
>>> fn = pipeline_layer_stack(Scale(), mesh, n_micro=2)
>>> float(fn(stacked, jnp.ones((2, 4, 1)))[0, 0, 0])   # 1 * 2 * 3
6.0
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_pipeline_mesh(
    n_data: Optional[int] = None,
    n_pipe: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "pipe") mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_pipe
    if n_data * n_pipe != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_pipe} does not use all {len(devices)} "
            "devices — choose axis sizes whose product is the device count"
        )
    arr = np.asarray(devices).reshape(n_data, n_pipe)
    return Mesh(arr, ("data", "pipe"))


def _microbatch(x: jax.Array, n_micro: int) -> jax.Array:
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(
            f"batch {b} not divisible by n_micro={n_micro}"
        )
    return x.reshape((n_micro, b // n_micro) + x.shape[1:])


def pipeline_layer_stack(layer_module, mesh: Mesh, n_micro: int):
    """GPipe pipeline over a stack of structurally-identical flax layers.

    layer_module: a single layer (e.g. BranchformerEncoderLayer) whose
    apply signature is (x, src_mask, pad_mask, pos_embs, deterministic).
    Returns fn(stacked_params, x [B,T,D], src_mask, pad_mask [B,T]) ->
    [B,T,D] (pad_mask uses the encoder-level [B,T] convention,
    models/asr.py length_to_mask), where stacked_params leaves carry a
    leading [L] layer axis (the scan_layers=True layout) with L divisible
    by the pipe-axis size.

    The returned fn is jittable and differentiable (all lax ops), so a
    training step may close over it. Pass rng= for training-mode dropout:
    the key is folded per (microbatch, absolute layer) so every in-flight
    microbatch draws an independent mask on every layer of every stage
    (the folding differs from flax nn.scan's internal split, so dropout
    patterns are implementation-defined — as they are between any two
    frameworks; deterministic outputs are exactly equal, tested).
    """
    n_stages = mesh.shape["pipe"]

    def stage_fn(stage_params, x, src_mask, pad_mask, mb_key, stage_idx):
        # apply this stage's L/S layers sequentially (inner scan)
        l_per_stage = jax.tree.leaves(stage_params)[0].shape[0]

        def body(carry, inp):
            layer_params, li = inp
            if mb_key is not None:
                # independent dropout per (microbatch, absolute layer)
                rngs = {"dropout": jax.random.fold_in(
                    mb_key, stage_idx * l_per_stage + li)}
                y = layer_module.apply(
                    {"params": layer_params}, carry, src_mask, pad_mask,
                    None, False, rngs=rngs,
                )
            else:
                y = layer_module.apply(
                    {"params": layer_params}, carry, src_mask, pad_mask,
                    None, True,
                )
            return y, None

        x, _ = jax.lax.scan(
            body, x, (stage_params, jnp.arange(l_per_stage))
        )
        return x

    def pp_local(stage_params, xs, src_mask, pads, rng):
        # shard_map body: one pipe stage per device slice.
        # stage_params leaves [1, L/S, ...] (local slice) -> [L/S, ...]
        stage_params = jax.tree.map(lambda p: p[0], stage_params)
        idx = jax.lax.axis_index("pipe")
        m = xs.shape[0]
        state = jnp.zeros_like(xs[0])
        outbuf = jnp.zeros_like(xs)

        def step(t, carry):
            state, outbuf = carry
            # stage 0 ingests microbatch t (dead batches after M: zeros)
            safe_t = jnp.minimum(t, m - 1)
            inp = jax.lax.dynamic_index_in_dim(xs, safe_t, 0, False)
            x_in = jnp.where(idx == 0, inp, state)
            # stage idx processes microbatch t - idx at step t, so its pad
            # mask must be indexed per stage — indexing by the ingest step
            # would apply microbatch t's valid-frame counts to every stage
            # (wrong masked time-mean whenever pads differ across
            # microbatches; the pad is replicated data so a clipped local
            # index is cheaper than ppermuting it alongside the activation)
            mb = jnp.clip(t - idx, 0, m - 1)
            pad = jax.lax.dynamic_index_in_dim(pads, mb, 0, False)
            # fold the data-shard index too: the key enters shard_map
            # replicated, and without it every data shard would draw
            # identical dropout masks for its local batch slice
            mb_key = (jax.random.fold_in(
                jax.random.fold_in(rng, jax.lax.axis_index("data")), mb)
                if rng is not None else None)
            y = stage_fn(stage_params, x_in, src_mask, pad, mb_key, idx)
            # the LAST stage finishes microbatch t-(S-1) at step t
            pos = jnp.clip(t - (n_stages - 1), 0, m - 1)
            write = (idx == n_stages - 1) & (t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, pos, 0, False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, cur), pos, 0
            )
            # hand the activation to the next stage (one ICI hop)
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            state = jax.lax.ppermute(y, "pipe", perm)
            return state, outbuf

        _, outbuf = jax.lax.fori_loop(
            0, m + n_stages - 1, step, (state, outbuf)
        )
        # only the last stage's buffer holds results; replicate it
        outbuf = jnp.where(idx == n_stages - 1, outbuf, 0.0)
        return jax.lax.psum(outbuf, "pipe")

    sharded = jax.shard_map(
        pp_local,
        mesh=mesh,
        in_specs=(P("pipe"), P(None, "data"), P(), P(None, "data"), P()),
        out_specs=P(None, "data"),
        check_vma=False,
    )

    def call(stacked_params, x, src_mask=None, pad_mask=None, rng=None):
        n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
        if n_layers % n_stages:
            raise ValueError(
                f"{n_layers} layers not divisible by pipe axis {n_stages}"
            )
        staged = jax.tree.map(
            lambda p: p.reshape(
                (n_stages, n_layers // n_stages) + p.shape[1:]
            ),
            stacked_params,
        )
        micro_b = x.shape[0] // n_micro
        n_data = mesh.shape.get("data", 1)
        if x.shape[0] % n_micro == 0 and micro_b % n_data:
            raise ValueError(
                f"microbatch size {micro_b} not divisible by the data "
                f"axis ({n_data}) — choose n_micro so that "
                f"batch/(n_micro*n_data) is integral"
            )
        if pad_mask is None:
            # explicit all-valid mask (the layer's own default); a [T, T]
            # src/sum mask is passed through as-is — all-ones would NOT be
            # equivalent to None (the sum_mask path normalizes by row sums)
            pad_mask = jnp.ones(x.shape[:2], x.dtype)
        xs = _microbatch(x, n_micro)
        pads = _microbatch(pad_mask, n_micro)
        out = sharded(staged, xs, src_mask, pads, rng)
        return out.reshape(x.shape)

    return call


def pipeline_branchformer_encode(encoder, mesh: Mesh, n_micro: int):
    """Pipeline the layer stack of a BranchformerEncoder built with
    scan_layers=True (params {"layers": [L,...], "norm": ...}); the final
    LayerNorm runs replicated after the pipeline.

    Returns fn(encoder_params, x [B,T,D], src_mask, pad_mask) -> [B,T,D].
    """
    from flax import linen as nn

    from summarymixing_tpu.models.branchformer import BranchformerEncoderLayer

    layer_module = BranchformerEncoderLayer(**encoder._layer_kwargs())
    stack = pipeline_layer_stack(layer_module, mesh, n_micro)
    final_norm = nn.LayerNorm(epsilon=1e-6, dtype=encoder.dtype,
                              param_dtype=encoder.param_dtype)

    def call(encoder_params, x, src_mask=None, pad_mask=None, rng=None):
        y = stack(encoder_params["layers"], x, src_mask, pad_mask, rng=rng)
        return final_norm.apply({"params": encoder_params["norm"]}, y)

    return call
