"""Model-level initialisation utilities.

xavier_normal_overwrite mirrors the reference TransformerASR._init_params
(TransformerASR.py:681-684): AFTER module construction, every parameter
with ndim > 1 is re-drawn xavier-normal (overwriting e.g. the SummaryMixing
cell's own kaiming init — a quirk the trained reference models inherit, so
recipe training reproduces it here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_normal_overwrite(rng: jax.Array, params):
    """Redraw all >=2-D leaves of a param pytree with xavier normal."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(rng, len(leaves))
    init = jax.nn.initializers.xavier_normal()

    new_leaves = []
    for key, leaf in zip(keys, leaves):
        if hasattr(leaf, "ndim") and leaf.ndim > 1:
            if leaf.ndim == 2:
                new_leaves.append(init(key, leaf.shape, leaf.dtype))
            else:
                # conv kernels etc.: xavier over (fan_in=prod(:-1), fan_out=-1)
                flat_shape = (int(jnp.prod(jnp.asarray(leaf.shape[:-1]))),
                              leaf.shape[-1])
                w = init(key, flat_shape, leaf.dtype)
                new_leaves.append(w.reshape(leaf.shape))
        else:
            new_leaves.append(leaf)
    return jax.tree.unflatten(treedef, new_leaves)
