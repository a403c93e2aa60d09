"""Data augmentation: SpecAugment (time/freq drop + time warp) and speed
perturbation, all jit-friendly with explicit PRNG keys and static shapes.

Capability parity:
- SpectrogramDrop <- speechbrain.augment.freq_domain.SpectrogramDrop
  (branchformer_summarymixing.yaml:305-320: 4 time drops of 15-25 frames and
  4 freq drops of 10-20 bins, replace="mean").
- Warping <- speechbrain.augment.freq_domain.Warping (yaml:323-324):
  SpecAugment time warp by piecewise-linear index remapping.
- Augmenter <- speechbrain.augment.augmenter.Augmenter (yaml:326-335):
  recipes use min=max=all, prob 1.0 -> sequential application; the
  probabilistic subset selection is supported via per-augment probabilities.
- speed_perturb_batch <- speechbrain.augment.time_domain.SpeedPerturb
  (yaml:300-302, speeds 95/100/105%). The reference resamples via
  torchaudio/sox (C++); here resampling is windowed-sinc interpolation on
  device with a static output buffer (lengths rescale; content beyond the
  new length is zeroed) so the whole train step stays one compiled program.

Randomness: every function takes a jax PRNG key (replaces torch global RNG).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def spectrogram_drop(
    key: Array,
    x: Array,
    pad_mask: Optional[Array] = None,
    drop_length_low: int = 15,
    drop_length_high: int = 25,
    drop_count: int = 4,
    axis: int = 1,
    replace: str = "mean",
) -> Array:
    """Drop `drop_count` random spans along time (axis=1) or frequency
    (axis=2), replacing with the utterance mean ("mean") or zeros."""
    b, t, f = x.shape
    size = x.shape[axis]
    k_len, k_start = jax.random.split(key)
    lengths = jax.random.randint(
        k_len, (b, drop_count), drop_length_low, drop_length_high + 1
    )
    if axis == 1 and pad_mask is not None:
        valid = jnp.sum(pad_mask, axis=1).astype(jnp.int32)  # [B]
    else:
        valid = jnp.full((b,), size, jnp.int32)
    starts = (
        jax.random.uniform(k_start, (b, drop_count))
        * jnp.maximum(valid[:, None] - lengths, 1)
    ).astype(jnp.int32)

    pos = jnp.arange(size)[None, None, :]  # [1,1,S]
    in_span = (pos >= starts[..., None]) & (pos < (starts + lengths)[..., None])
    drop = jnp.any(in_span, axis=1)  # [B, S]
    if axis == 1:
        drop3 = drop[:, :, None]
    else:
        drop3 = drop[:, None, :]
    if replace == "mean":
        if pad_mask is None:
            fill = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            w = pad_mask[..., None]
            fill = jnp.sum(x * w, axis=(1, 2), keepdims=True) / jnp.maximum(
                jnp.sum(w, axis=(1, 2), keepdims=True) * f, 1.0
            )
    else:
        fill = jnp.zeros((1, 1, 1), x.dtype)
    out = jnp.where(drop3, fill.astype(x.dtype), x)
    if pad_mask is not None:
        out = jnp.where(pad_mask[..., None] > 0, out, x)
    return out


def time_warp(
    key: Array,
    x: Array,
    pad_mask: Optional[Array] = None,
    warp_window: int = 5,
) -> Array:
    """SpecAugment time warp: pick a center c in [W, L-W) and shift it by
    w ~ U(-W, W); frames are piecewise-linearly resampled on both sides
    (linear-interp gather, batch-vectorised)."""
    b, t, f = x.shape
    k_c, k_w = jax.random.split(key)
    if pad_mask is not None:
        valid = jnp.sum(pad_mask, axis=1).astype(jnp.int32)
    else:
        valid = jnp.full((b,), t, jnp.int32)
    lo = jnp.minimum(warp_window, valid // 2)
    c = (
        jax.random.uniform(k_c, (b,)) * jnp.maximum(valid - 2 * lo, 1)
    ).astype(jnp.int32) + lo
    w = jax.random.randint(k_w, (b,), -warp_window, warp_window + 1)
    w = jnp.clip(w, -(c - 1), valid - 1 - c)
    c_new = c + w

    pos = jnp.arange(t)[None, :].astype(jnp.float32)  # output positions
    cf = c.astype(jnp.float32)[:, None]
    cnf = c_new.astype(jnp.float32)[:, None]
    vf = valid.astype(jnp.float32)[:, None]
    left = pos * (cf / jnp.maximum(cnf, 1.0))
    right = cf + (pos - cnf) * (vf - 1 - cf) / jnp.maximum(vf - 1 - cnf, 1.0)
    src = jnp.where(pos <= cnf, left, right)
    src = jnp.clip(src, 0.0, vf - 1.0)
    src = jnp.where(pos < vf, src, pos)  # identity on padding

    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    frac = (src - i0.astype(jnp.float32))[..., None]
    g0 = jnp.take_along_axis(x, i0[..., None], axis=1)
    g1 = jnp.take_along_axis(x, i1[..., None], axis=1)
    return g0 * (1.0 - frac) + g1 * frac


@dataclass(frozen=True)
class SpecAugmentConfig:
    time_drop_length: Tuple[int, int] = (15, 25)
    time_drop_count: int = 4
    freq_drop_length: Tuple[int, int] = (10, 20)
    freq_drop_count: int = 4
    warp_window: int = 5
    replace: str = "mean"
    # Augmenter subset selection (speechbrain Augmenter: N ~ U[min, max]
    # augmentations applied; without shuffle the FIRST N of the pipeline
    # [time_drop, freq_drop, time_warp] run — AISHELL yaml:278-279 uses
    # min=max=1, i.e. time_drop only; LibriSpeech min=max=3 applies all)
    min_augmentations: int = 3
    max_augmentations: int = 3
    shuffle_augmentations: bool = False


def spec_augment(
    key: Array,
    x: Array,
    pad_mask: Optional[Array] = None,
    config: SpecAugmentConfig = SpecAugmentConfig(),
) -> Array:
    """time drop -> freq drop -> time warp (the recipe's Augmenter order,
    yaml:332-335) with the Augmenter's N-of-3 subset selection. Each stage
    runs on the current tensor and is where-gated by a traced selection, so
    every sampled subset shares one compiled program."""
    k1, k2, k3, k_n, k_perm = jax.random.split(key, 5)
    n_lo = min(config.min_augmentations, 3)
    n_hi = min(config.max_augmentations, 3)
    stages = (
        lambda kk, cur: spectrogram_drop(
            kk, cur, pad_mask,
            config.time_drop_length[0], config.time_drop_length[1],
            config.time_drop_count, axis=1, replace=config.replace,
        ),
        lambda kk, cur: spectrogram_drop(
            kk, cur, pad_mask,
            config.freq_drop_length[0], config.freq_drop_length[1],
            config.freq_drop_count, axis=2, replace=config.replace,
        ),
        lambda kk, cur: time_warp(kk, cur, pad_mask, config.warp_window),
    )
    keys = (k1, k2, k3)
    if n_lo >= 3 and not config.shuffle_augmentations:
        out = x  # fast path: all three always applied (LibriSpeech recipes)
        for kk, stage in zip(keys, stages):
            out = stage(kk, out)
        return out
    n = (
        jax.random.randint(k_n, (), n_lo, n_hi + 1)
        if n_hi > n_lo else jnp.asarray(n_lo, jnp.int32)
    )
    if config.shuffle_augmentations:
        # speechbrain Augmenter shuffle permutes EXECUTION order too (drops
        # sampled from an already-warped tensor differ from warp-after-drop),
        # then applies the first n of the permuted list: round r executes
        # stage order[r] iff r < n, via lax.switch so the order stays traced
        order = jnp.argsort(jax.random.uniform(k_perm, (3,)))
        branches = [
            (lambda cur, kk=kk, stage=stage: stage(kk, cur))
            for kk, stage in zip(keys, stages)
        ]
        out = x
        for r in range(3):
            applied = jax.lax.switch(order[r], branches, out)
            out = jnp.where(r < n, applied, out)
        return out
    out = x
    for i, (kk, stage) in enumerate(zip(keys, stages)):
        # first-N semantics (speechbrain Augmenter without shuffle)
        out = jnp.where(i < n, stage(kk, out), out)
    return out


@dataclass(frozen=True)
class Augmenter:
    """Sequential augmentation combinator with per-augment probabilities
    (speechbrain Augmenter semantics for the recipes' configuration:
    repeat_augment=1, shuffle=False, all augmentations applied)."""

    augmentations: Sequence[Callable] = ()
    augment_prob: float = 1.0

    def __call__(self, key: Array, x: Array, pad_mask: Optional[Array] = None) -> Array:
        k_gate, *keys = jax.random.split(key, len(self.augmentations) + 1)
        apply = jax.random.uniform(k_gate, ()) < self.augment_prob
        out = x
        for k, aug in zip(keys, self.augmentations):
            out = aug(k, out, pad_mask)
        return jnp.where(apply, out, x)


def speed_perturb_batch(
    key: Array,
    wav: Array,
    lengths: Array,
    speeds: Sequence[int] = (95, 100, 105),
    num_taps: int = 16,
) -> Tuple[Array, Array]:
    """Per-utterance random speed perturbation by windowed-sinc resampling.

    wav [B, N], lengths [B] (samples). A speed s% maps output position n to
    input position n*s/100; output lengths become len*100/s, clipped to N.
    Returns (wav_out [B, N], new_lengths [B]).
    """
    b, n = wav.shape
    choice = jax.random.randint(key, (b,), 0, len(speeds))
    ratios = jnp.asarray([s / 100.0 for s in speeds], jnp.float32)[choice]  # [B]

    pos = jnp.arange(n, dtype=jnp.float32)[None, :] * ratios[:, None]  # [B,N]
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base.astype(jnp.float32)

    taps = jnp.arange(-num_taps // 2 + 1, num_taps // 2 + 1)  # [K]
    idx = jnp.clip(base[..., None] + taps[None, None, :], 0, n - 1)  # [B,N,K]
    rel = taps[None, None, :].astype(jnp.float32) - frac[..., None]
    # Hann-windowed sinc, cutoff at the lower of source/target Nyquist
    cutoff = jnp.minimum(1.0, 1.0 / ratios)[:, None, None]
    sinc = cutoff * jnp.sinc(cutoff * rel)
    window = 0.5 + 0.5 * jnp.cos(jnp.pi * rel / (num_taps // 2 + 1))
    kernel = sinc * jnp.where(jnp.abs(rel) <= num_taps // 2, window, 0.0)
    # vectorised gather: flatten tap axis
    flat_idx = idx.reshape(b, -1)
    gathered = jnp.take_along_axis(wav, flat_idx, axis=1).reshape(b, n, len(taps))
    out = jnp.sum(gathered * kernel, axis=-1)

    new_len = jnp.minimum(
        jnp.ceil(lengths.astype(jnp.float32) / ratios).astype(jnp.int32), n
    )
    keep = jnp.arange(n)[None, :] < new_len[:, None]
    return out * keep.astype(out.dtype), new_len
