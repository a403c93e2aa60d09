"""Sequence parallelism: shard the encoder's TIME axis over the mesh.

The reference has no sequence parallelism at all (SURVEY.md §2.4) — DDP
only. The SummaryMixing architecture is what makes adding it nearly free
on TPU, and that is the point of this module: the cell's only global
time-coupled operation is the masked mean over T (reference
summary_mixing.py:218-222), so when [B, T, D] activations are sharded
over a "seq" mesh axis the per-layer cross-chip traffic is

- one [B, summary_out_dim] partial-sum all-reduce (the time-mean), plus
- halo exchanges of kernel_size//2 frames for the depthwise convolutions
  (CSGU kernel 31 -> 15 frames each side; frontend CNN similarly),

i.e. O(B·D) bytes per layer, independent of T. A self-attention encoder
sharded the same way needs full [B, T, D] K/V all-gathers per layer —
O(B·T·D) traffic. Time-sharding therefore scales long-form audio
(VoxPopuli keeps 100 s segments, reference VoxPopuli yaml:34) with the
same flat-RTF property the architecture has on one chip.

TPU-natively there is nothing to hand-write: we give the mesh a "seq"
axis, constrain [B, T, ...] activations to P("data", "seq", ...), and
GSPMD inserts the psum for the time reduction and the windowed-op halo
exchanges (the scaling-book recipe: pick a mesh, annotate shardings, let
XLA place collectives). The constraints at the encode boundary are
enough — sharding propagates through the elementwise/matmul interior,
where every contraction is over feature dims and B/T stay untouched.

Correctness subtlety: anything that REDUCES over T must be length-masked
(mean over valid frames only) for the result to be shard-invariant. The
package's single mask convention (multiplicative float, 1 = valid)
already guarantees that, and tests/test_sequence_parallel.py asserts
numerical agreement between the time-sharded and single-device paths.

Example
-------
>>> import jax, jax.numpy as jnp
>>> mesh = make_seq_mesh(n_data=2, n_seq=2, devices=jax.devices()[:4])
>>> x = jnp.ones((2, 8, 4))
>>> y = jax.jit(lambda v: shard_time(v, mesh))(x)
>>> tuple(y.sharding.spec)[:2]
('data', 'seq')
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "seq", "model") mesh. All helpers in
    parallel.mesh (P("data") batch sharding, TP/FSDP param rules) work
    unchanged on it; the extra axis carries the time dimension."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model)
    if n_data * n_seq * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq}x{n_model} does not use all "
            f"{len(devices)} devices — choose axis sizes whose product is "
            "the device count (silently idling chips costs throughput)"
        )
    arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
    return Mesh(arr, ("data", "seq", "model"))


def time_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Sharding for [B, T, ...] activations: batch over "data", time over
    "seq", feature dims replicated (feature sharding belongs to the
    "model"/TP axis, parallel.mesh.tensor_parallel_param_sharding)."""
    spec = ["data", "seq"] + [None] * (ndim - 2)
    return NamedSharding(mesh, P(*spec))


def shard_time(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Constrain a [B, T, ...] activation to batch x time sharding (for
    use inside jit; outside jit it acts as a device_put)."""
    return jax.lax.with_sharding_constraint(x, time_sharding(mesh, x.ndim))


def _check_time_divisible(feats: jax.Array, n_seq: int) -> None:
    """XLA input shardings require the sharded dim to divide evenly — and
    silently zero-padding here would NOT be equivalent: extra frames shift
    which conv taps fall on real data at the sequence boundary, changing
    the last valid subsampled frame. Padding to the bucket shape belongs
    upstream (data.batching emits fixed shapes per bucket; configure
    bucket frame counts divisible by the seq-axis size)."""
    if feats.shape[1] % n_seq:
        raise ValueError(
            f"time axis {feats.shape[1]} is not divisible by the seq mesh "
            f"axis ({n_seq}); pad/bucket features to a multiple upstream "
            "(per-call padding would perturb the boundary frame through "
            "the frontend conv taps)"
        )


def sequence_parallel_encode(model, mesh: Mesh):
    """`model.encode` with features time-sharded over the mesh.

    Returns fn(params, feats [B, T, n_mels], feat_lengths [B]) ->
    (enc_out [B, T', d] time-sharded, enc_lengths [B]). The CNN frontend,
    every encoder layer, and the final norm all run on T-shards; GSPMD
    inserts the per-layer mean-psum + conv halos (module docstring). T
    must be a multiple of the seq-axis size (see _check_time_divisible).
    """
    len_sh = NamedSharding(mesh, P("data"))
    feat_sh = time_sharding(mesh, 3)
    n_seq = mesh.shape["seq"]

    def encode(params, feats, feat_lengths):
        feats = shard_time(feats, mesh)
        enc, out_len = model.apply(
            params, feats, feat_lengths, method=model.encode
        )
        enc = shard_time(enc, mesh)
        return enc, out_len

    # no out_shardings: T' = ceil(T/4) need not divide the seq axis; the
    # in-graph constraint keeps the layers time-sharded and GSPMD pads the
    # ragged trailing shard internally
    # params in_sharding None: keep whatever sharding the caller committed
    # (replicated, or TP/FSDP rules from parallel.mesh over the "model"
    # axis) instead of forcing an all-gather to replicated on every call
    jitted = jax.jit(encode, in_shardings=(None, feat_sh, len_sh))

    def call(params, feats, feat_lengths):
        _check_time_divisible(feats, n_seq)
        return jitted(params, feats, feat_lengths)

    return call


def sequence_parallel_ctc_decode(model, mesh: Mesh, blank_id: int = 0):
    """Jitted greedy-CTC decode path (encode + ctc head + greedy marks)
    with the whole graph time-sharded: the per-frame argmax and the
    collapse marks (a one-frame shifted compare — one halo frame) are
    embarrassingly parallel over T, so only [B, T'] ids/marks leave the
    shards.

    Returns fn(params, feats, feat_lengths) -> (ids [B, T'], keep
    [B, T'], enc_lengths [B]) — the decoding.ctc greedy contract; feed to
    decoding.ctc.collapse_ctc for the ragged token lists."""
    from summarymixing_tpu.decoding.ctc import ctc_greedy_decode

    len_sh = NamedSharding(mesh, P("data"))
    feat_sh = time_sharding(mesh, 3)
    n_seq = mesh.shape["seq"]

    def decode(params, feats, feat_lengths):
        feats = shard_time(feats, mesh)
        enc, out_len = model.apply(
            params, feats, feat_lengths, method=model.encode
        )
        enc = shard_time(enc, mesh)
        log_probs = model.apply(params, enc, method=model.ctc_head)
        ids, keep = ctc_greedy_decode(log_probs, out_len, blank_id)
        return ids, keep, out_len

    jitted = jax.jit(decode, in_shardings=(None, feat_sh, len_sh))

    def call(params, feats, feat_lengths):
        _check_time_divisible(feats, n_seq)
        return jitted(params, feats, feat_lengths)

    return call
