"""CTC decoding: greedy (device-side, static shapes) and host collapse.

Capability parity: speechbrain.decoders.ctc_greedy_decode — argmax per
frame, collapse repeats, strip blanks — as used by the recipes' per-epoch
validation decode (the reference Brain's valid stage before the beam
stages of branchformer_summarymixing.yaml:248-269). Greedy CTC is also
the decode path of the minimum end-to-end slice (BASELINE.json config #1).
Beam search with CTC prefix scoring lives in decoding/s2s_beam.py (joint
CTC/attention) per SURVEY.md §2.3."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def ctc_greedy_decode(
    log_probs: Array, lengths: Array, blank_id: int = 0
) -> Tuple[Array, Array]:
    """Device-side greedy CTC: argmax per frame, mark frames that survive
    collapse (not blank, not a repeat). Returns (ids [B, T], keep [B, T])
    with static shapes; host code extracts the variable-length sequences."""
    ids = jnp.argmax(log_probs, axis=-1)  # [B, T]
    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    valid = jnp.arange(ids.shape[1])[None, :] < lengths[:, None]
    keep = (ids != blank_id) & (ids != prev) & valid
    return ids, keep


def collapse_ctc(ids: np.ndarray, keep: np.ndarray) -> List[List[int]]:
    """Host-side: turn (ids, keep) into ragged token lists."""
    out = []
    for row_ids, row_keep in zip(np.asarray(ids), np.asarray(keep)):
        out.append([int(i) for i in row_ids[row_keep.astype(bool)]])
    return out
