"""Multi-host (multi-process) training launch and data feeding.

The reference scales across nodes with torch DDP over NCCL — torchrun
starts one rank per GPU, each rank loads its own data shard, gradients
all-reduce (reference transducer yaml:112-114 "Adjust
grad_accumulation_factor depending on the DDP node count (here 3)").
The TPU-native shape of the same capability: **one process per host**
(the TPU pod convention), `jax.distributed.initialize()` to form the
global runtime, one mesh over every chip in the slice, and the SAME
jitted train step — under GSPMD it is a single global program, so
gradient all-reduces ride ICI/DCN wherever the mesh axes live. The
compute side needs no changes at all; what this module provides is the
host-side contract:

- `initialize()` — env/arg-driven `jax.distributed.initialize`; no-op
  for single-process runs so recipes can call it unconditionally.
- deterministic batch-row ownership: every process iterates the SAME
  bucketed batch sequence (same seed over the full manifest) and loads
  only the rows its chips own (`local_rows`); `global_batch` assembles
  the globally-sharded array from those per-process rows
  (`jax.make_array_from_process_local_data`). Same shapes on every
  process by construction — no cross-host shape negotiation, 1/P of the
  IO per host.
- `is_coordinator()` gating for checkpoint writes and log files.
- `allreduce_counts()` for host-side metric scalars (WER error/word
  counts, loss sums) via `multihost_utils.process_allgather`.

Validated by a real 2-process CPU integration test
(tests/test_multihost.py) — global mesh, sharded feed, loss parity with
the single-process run, coordinator gating.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

__all__ = [
    "initialize",
    "process_count",
    "process_index",
    "is_coordinator",
    "local_rows",
    "global_batch",
    "allreduce_counts",
    "fetch_global",
]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-process runtime; returns True if distributed.

    Arguments fall back to the SMT_COORDINATOR / SMT_NUM_PROCESSES /
    SMT_PROCESS_ID environment variables (torchrun-style launch), and on
    TPU pods to JAX's own auto-detection. Single-process runs (no
    coordinator configured) are a no-op, so recipes call this
    unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "SMT_COORDINATOR")
    if num_processes is None and os.environ.get("SMT_NUM_PROCESSES"):
        num_processes = int(os.environ["SMT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SMT_PROCESS_ID"):
        process_id = int(os.environ["SMT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on exactly one process — the one that writes checkpoints,
    logs and tokenizer artifacts."""
    return jax.process_index() == 0


def local_rows(batch_size: int) -> slice:
    """The contiguous slice of a global batch's leading axis this process
    must load. Batches are bucket-padded to a multiple of the GLOBAL
    device count (data/batching.py `batch_multiple`), so the split is
    exact; row order matches a data-axis mesh built from `jax.devices()`
    (process-major, which is jax's device order)."""
    p, n = jax.process_index(), jax.process_count()
    if batch_size % n:
        raise ValueError(
            f"batch size {batch_size} not divisible by process count {n} "
            "— set batch_multiple to the global device count")
    per = batch_size // n
    return slice(p * per, (p + 1) * per)


def global_batch(local, mesh, spec=None):
    """Assemble a globally-sharded pytree from per-process local rows.

    `local` leaves are the [B/P, ...] rows this process owns (see
    `local_rows`); the result leaves are global [B, ...] arrays sharded
    over the mesh's "data" axis. Single-process: equivalent to a sharded
    device_put."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, local)


def fetch_global(x) -> np.ndarray:
    """Host numpy view of a possibly multi-process global array.

    Eval outputs and batch arrays are sharded over every process's
    devices; plain np.asarray only works for fully-addressable arrays.
    This gathers the non-addressable shards (an all-gather over the
    batch axis — eval id tensors, so tiny) so host-side decode/metric
    logic sees the full batch identically on every process.
    Single-process: plain np.asarray."""
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def allreduce_counts(*values: float) -> Sequence[float]:
    """Sum host-side metric scalars across processes (error counts, word
    counts, loss sums). Single-process: identity."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(
        np.asarray(values, np.float64))
    return tuple(float(v) for v in stacked.sum(axis=0))
