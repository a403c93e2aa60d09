"""Device mesh + sharding helpers — the communication backend.

The reference scales with torch DDP over NCCL (data parallel only; implied
by branchformer yaml:49-52 "batch_size * n_gpus * grad_accumulation" and
transducer yaml:112-114). The TPU-native equivalent (SURVEY.md §2.4): a
1-D `Mesh(("data",))` over ICI, batch sharded with NamedSharding, the whole
train step one jit — XLA inserts the gradient all-reduce over ICI
collectives; multi-slice runs ride DCN automatically. No hand-written
collectives are needed for DP; model sharding axes ("model") are plumbed
through for larger-than-chip models."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis (pure DP, matching the reference's parallelism)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not use all {len(devices)} "
            "devices — choose axis sizes whose product is the device count "
            "(silently idling chips costs throughput)"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: batch split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of batch arrays with the leading axis sharded
    over the data axis (host -> ICI-distributed HBM)."""
    sharding = data_parallel_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def tensor_parallel_param_sharding(mesh: Mesh, min_dim: int = 1024):
    """Parameter-sharding rule for the mesh "model" axis: 2-D kernels whose
    output dim is wide and divisible by the axis are column-sharded (their
    activations become model-sharded; XLA/GSPMD inserts the all-gathers /
    reduce-scatters over ICI). Everything else is replicated.

    For the ~100M-param SummaryMixing models DP alone is the right strategy
    (SURVEY.md §2.4) — this rule exists so the same train step scales past
    single-chip HBM for larger variants (e.g. wider cgMLP / LM heads).

    Returns fn(params) -> matching pytree of NamedShardings."""
    n_model = mesh.shape["model"]

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return lambda params: jax.tree.map(rule, params)


def fsdp_param_sharding(mesh: Mesh, axis: str = "data",
                        min_size: int = 2 ** 16):
    """Fully-sharded data parallel (ZeRO-3 style) parameter rule: each
    large parameter is sharded over `axis` along its largest divisible
    dimension, so per-chip parameter + optimizer-state memory drops by the
    axis size. GSPMD inserts the per-use all-gather (params) and
    reduce-scatter (grads) over ICI — the standard JAX FSDP recipe
    (scaling-book): same train step, different NamedShardings.

    Small params (< min_size elements, norms/biases) stay replicated —
    gathering them would cost more latency than the memory saved.

    Returns fn(params) -> matching pytree of NamedShardings."""
    n_axis = mesh.shape[axis]

    def rule(x):
        if (
            n_axis > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.size >= min_size
        ):
            dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
            for d in dims:
                if x.shape[d] % n_axis == 0:
                    spec = [None] * x.ndim
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return lambda params: jax.tree.map(rule, params)


def composite_param_sharding(
    mesh: Mesh,
    tp_min_dim: int = 1024,
    fsdp_min_size: int = 2 ** 16,
    fsdp_axis: str = "data",
):
    """Tensor parallelism for wide 2-D kernels (column-sharded over "model")
    PLUS FSDP for every other large parameter (sharded over the data axis).
    The standard combined recipe for models past single-chip HBM: activations
    ride the "model" axis, parameter/optimizer memory scales down by the
    data-axis size, and GSPMD inserts all three collective families
    (grad all-reduce, TP all-gather/reduce-scatter, FSDP param all-gather).

    Returns fn(params) -> matching pytree of NamedShardings."""
    tp = tensor_parallel_param_sharding(mesh, min_dim=tp_min_dim)
    fsdp = fsdp_param_sharding(mesh, axis=fsdp_axis, min_size=fsdp_min_size)
    replicated = P()

    def combine(params):
        tp_tree = tp(params)
        fsdp_tree = fsdp(params)
        return jax.tree.map(
            lambda t, f: t if t.spec != replicated else f, tp_tree, fsdp_tree
        )

    return combine
