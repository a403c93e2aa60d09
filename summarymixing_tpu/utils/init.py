"""Model-level initialisation utilities.

xavier_normal_overwrite mirrors the reference TransformerASR._init_params
(TransformerASR.py:681-684): AFTER module construction, every parameter
with ndim > 1 is re-drawn xavier-normal (overwriting e.g. the SummaryMixing
cell's own kaiming init — a quirk the trained reference models inherit, so
recipe training reproduces it here; applied to the ASR subtree by both
trainers)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _torch_xavier_std(path: str, shape) -> float:
    """std of torch.nn.init.xavier_normal_ = sqrt(2 / (fan_in + fan_out)),
    with fans computed the way torch would see the SAME parameter:

    - 2-D: xavier is symmetric in the fans, so the jax [in, out] vs torch
      [out, in] transpose is irrelevant.
    - flax Conv kernels [k..., in, out] (path contains "conv"): torch conv
      layout is [out, in, k...] -> fan_in = in*prod(k), fan_out =
      out*prod(k).
    - ParallelLinear kernels [n_split, in, out] (same layout as the torch
      reference, VanillaNN.py:85): torch generic fans = size(1)*rf and
      size(0)*rf with rf = prod(size()[2:]).
    """
    if len(shape) == 2:
        fan_in, fan_out = shape
    elif "conv" in path.lower():
        rf = math.prod(shape[:-2])
        fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
    else:
        rf = math.prod(shape[2:])
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
    return math.sqrt(2.0 / (fan_in + fan_out))


def xavier_normal_overwrite(rng: jax.Array, params):
    """Redraw all >=2-D leaves of a param pytree with xavier normal
    (torch-equivalent fans per leaf; see _torch_xavier_std)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))

    new_leaves = []
    for key, (path, leaf) in zip(keys, flat):
        if hasattr(leaf, "ndim") and leaf.ndim > 1:
            path_str = "/".join(str(p) for p in path)
            std = _torch_xavier_std(path_str, tuple(leaf.shape))
            new_leaves.append(
                (std * jax.random.normal(key, leaf.shape)).astype(leaf.dtype)
            )
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
