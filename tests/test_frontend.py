"""Frontend tests: Fbank spectral correctness, normalization stats,
SpecAugment properties, speed perturbation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.frontend import (
    Fbank,
    InputNormalization,
    NormStats,
    SpecAugmentConfig,
    spec_augment,
    speed_perturb_batch,
)
from summarymixing_tpu.frontend.features import stft_magnitude
from summarymixing_tpu.frontend.augment import spectrogram_drop, time_warp


def test_fbank_shapes_and_finite(rng):
    fb = Fbank()
    wav = jnp.asarray(rng.standard_normal((2, 16000)), jnp.float32)
    feats = fb(wav)
    assert feats.shape == (2, fb.num_frames(16000), 80)
    assert np.isfinite(np.asarray(feats)).all()
    assert fb.win_length == 512 and fb.hop_length == 160


def test_stft_peak_bin(rng):
    """A pure 1 kHz tone must peak at bin round(1000/16000*512) = 32."""
    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    wav = jnp.asarray(np.sin(2 * np.pi * f0 * t)[None, :], jnp.float32)
    spec = np.asarray(stft_magnitude(wav))
    peak = spec[0, 50].argmax()
    assert abs(peak - 32) <= 1


def test_stft_matches_numpy_fft(rng):
    """Framed-matmul DFT == numpy rfft on the same hamming-windowed frames."""
    wav = rng.standard_normal((1, 2000)).astype(np.float32)
    spec = np.asarray(stft_magnitude(jnp.asarray(wav), 512, 512, 160))
    # reproduce frame 3 by hand
    pad = np.concatenate([np.zeros(256), wav[0], np.zeros(256)])
    frame = pad[3 * 160 : 3 * 160 + 512]
    n = np.arange(512)
    ham = 0.54 - 0.46 * np.cos(2 * np.pi * n / 512)
    want = np.abs(np.fft.rfft(frame * ham)) ** 2
    np.testing.assert_allclose(spec[0, 3], want, rtol=1e-3, atol=1e-3)


def test_input_normalization_running_stats(rng):
    fbank_dim = 8
    stats = NormStats.init(fbank_dim)
    norm = InputNormalization(update_until_epoch=4)
    x1 = jnp.asarray(rng.standard_normal((2, 10, fbank_dim)) * 3 + 5, jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 10, fbank_dim)) * 3 + 5, jnp.float32)
    _, stats = norm(x1, stats, update=True, epoch=jnp.asarray(0))
    _, stats = norm(x2, stats, update=True, epoch=jnp.asarray(0))
    mean, std = NormStats.mean_std(stats)
    allx = np.concatenate([np.asarray(x1), np.asarray(x2)]).reshape(-1, fbank_dim)
    np.testing.assert_allclose(np.asarray(mean), allx.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), allx.std(0, ddof=1), rtol=1e-4)

    # frozen after update_until_epoch
    _, stats2 = norm(x1 * 100, stats, update=True, epoch=jnp.asarray(4))
    np.testing.assert_allclose(np.asarray(stats2["mean"]), np.asarray(stats["mean"]))

    out, _ = norm(x1, stats)
    m = np.asarray(out).reshape(-1, fbank_dim).mean(0)
    assert np.abs(m).max() < 0.5


def test_input_normalization_respects_padding(rng):
    stats = NormStats.init(4)
    x = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    pad = jnp.asarray([[1.0] * 6 + [0.0] * 4])
    stats = NormStats.update(stats, x, pad)
    mean, _ = NormStats.mean_std(stats)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(x)[0, :6].mean(0), rtol=1e-5
    )


def test_spectrogram_drop_properties(rng):
    x = jnp.asarray(rng.standard_normal((2, 50, 20)), jnp.float32)
    pad = jnp.asarray(
        (np.arange(50)[None, :] < np.array([[50], [30]])).astype(np.float32)
    )
    out = spectrogram_drop(jax.random.PRNGKey(0), x, pad, 5, 10, 2, axis=1)
    xo = np.asarray(out)
    # padding region untouched
    np.testing.assert_allclose(xo[1, 30:], np.asarray(x)[1, 30:])
    # something was dropped
    assert (xo != np.asarray(x)).any()
    # dropped frames replaced by the utterance mean (constant across freq)
    changed = np.where((xo[0] != np.asarray(x)[0]).any(axis=1))[0]
    assert len(changed) > 0
    assert np.allclose(xo[0, changed].std(axis=1), 0.0, atol=1e-5)


def test_time_warp_preserves_shape_and_padding(rng):
    x = jnp.asarray(rng.standard_normal((2, 40, 8)), jnp.float32)
    pad = jnp.asarray(
        (np.arange(40)[None, :] < np.array([[40], [25]])).astype(np.float32)
    )
    out = time_warp(jax.random.PRNGKey(1), x, pad)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out)[1, 25:], np.asarray(x)[1, 25:],
                               atol=1e-6)


def test_spec_augment_pipeline(rng):
    x = jnp.asarray(rng.standard_normal((2, 60, 80)), jnp.float32)
    out = spec_augment(jax.random.PRNGKey(2), x, None, SpecAugmentConfig())
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_spec_augment_subset_first_n(rng):
    """min=max=1 without shuffle applies ONLY the first stage (time drop) —
    the AISHELL Augmenter semantics (reference AISHELL yaml:278-279):
    every frequency bin keeps at least its untouched rows, i.e. no full
    frequency band is zeroed and no warp occurs."""
    x = jnp.asarray(rng.standard_normal((2, 60, 80)) + 5.0, jnp.float32)
    cfg = SpecAugmentConfig(
        time_drop_length=(5, 10), time_drop_count=2,
        freq_drop_length=(10, 20), freq_drop_count=2,
        replace="zeros", min_augmentations=1, max_augmentations=1,
    )
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), x, None, cfg))
    xn = np.asarray(x)
    # time drop applied: some whole frames zeroed
    frame_zero = (out == 0.0).all(axis=2)
    assert frame_zero.any()
    # every remaining frame is EXACTLY the input: no freq drop, no warp
    for b in range(out.shape[0]):
        keep = ~frame_zero[b]
        np.testing.assert_allclose(out[b, keep], xn[b, keep], atol=1e-6)


def test_spec_augment_subset_shuffle_runs(rng):
    x = jnp.asarray(rng.standard_normal((2, 60, 80)), jnp.float32)
    cfg = SpecAugmentConfig(min_augmentations=1, max_augmentations=3,
                            shuffle_augmentations=True)
    out = spec_augment(jax.random.PRNGKey(3), x, None, cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_speed_perturb(rng):
    sr = 16000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    batch = jnp.asarray(np.stack([wav, wav]))
    lens = jnp.asarray([sr, sr])
    # key chosen so utterances get different speeds isn't guaranteed; loop keys
    for seed in range(5):
        out, new_lens = speed_perturb_batch(jax.random.PRNGKey(seed), batch, lens)
        assert out.shape == batch.shape
        assert np.isfinite(np.asarray(out)).all()
        nl = np.asarray(new_lens)
        assert ((nl >= sr // 2) & (nl <= sr)).all()
    # a 105% speed utterance must have length ~ sr/1.05
    out, new_lens = speed_perturb_batch(jax.random.PRNGKey(0), batch, lens,
                                        speeds=(105,))
    assert abs(int(new_lens[0]) - int(np.ceil(sr / 1.05))) <= 1
    # content: still a sinusoid of ~462 Hz -> zero crossings scale by 1.05
    o = np.asarray(out)[0, : int(new_lens[0])]
    zc = ((o[:-1] * o[1:]) < 0).sum()
    want_zc = 440 * 1.05 * 2 * (len(o) / sr)
    assert abs(zc - want_zc) / want_zc < 0.05


def test_speed_perturb_identity(rng):
    wav = jnp.asarray(rng.standard_normal((1, 800)), jnp.float32)
    out, new_lens = speed_perturb_batch(
        jax.random.PRNGKey(0), wav, jnp.asarray([800]), speeds=(100,)
    )
    assert int(new_lens[0]) == 800
    # windowed-sinc interpolation at integer positions ~ identity
    np.testing.assert_allclose(np.asarray(out)[0, 8:-8], np.asarray(wav)[0, 8:-8],
                               atol=1e-3, rtol=1e-3)


def test_frame_signal_and_window(rng):
    """Utility framing path (kept as public API alongside the fused
    polyphase STFT): frames must match manual slicing."""
    from summarymixing_tpu.frontend.features import frame_signal, hamming_window
    x = jnp.asarray(rng.standard_normal((1, 1000)), jnp.float32)
    frames = frame_signal(x, 400, 160, center=True)
    assert frames.shape == (1, 1 + 1000 // 160, 400)
    pad = np.concatenate([np.zeros(200), np.asarray(x)[0], np.zeros(200)])
    np.testing.assert_allclose(np.asarray(frames)[0, 2], pad[320:720],
                               atol=1e-6)
    w = np.asarray(hamming_window(400))
    assert abs(w[0] - 0.08) < 1e-6 and w.max() <= 1.0


def test_norm_freeze_matches_reference_epoch_base(rng):
    """The reference tests its 1-BASED epoch counter against
    update_until_epoch (=4 -> updates data epochs 1-3). Our trainers use a
    0-based counter, so stats must already be frozen at 0-based epoch 3."""
    norm = InputNormalization(update_until_epoch=4)
    stats = NormStats.init(4)
    x = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    _, stats = norm(x, stats, update=True, epoch=jnp.asarray(0))
    count1 = float(stats["count"])
    _, stats = norm(x, stats, update=True, epoch=jnp.asarray(2))
    assert float(stats["count"]) > count1          # still updating (epoch 3)
    frozen = float(stats["count"])
    _, stats = norm(x, stats, update=True, epoch=jnp.asarray(3))
    assert float(stats["count"]) == frozen          # frozen at data epoch 4


def test_shuffle_augmentations_permutes_order(rng):
    """shuffle_augmentations permutes EXECUTION order (speechbrain
    Augmenter shuffle): with all 3 stages always applied, different
    permutation draws must be able to produce different outputs (drop
    sampled from a warped tensor != warp of a dropped tensor)."""
    from summarymixing_tpu.frontend.augment import (
        SpecAugmentConfig,
        spec_augment,
    )

    x = jnp.asarray(rng.standard_normal((2, 400, 80)), jnp.float32)
    cfg = SpecAugmentConfig(min_augmentations=3, max_augmentations=3,
                            shuffle_augmentations=True, replace="zeros")
    outs = {np.asarray(
        spec_augment(jax.random.PRNGKey(k), x, None, cfg)).tobytes()
        for k in range(6)}
    assert len(outs) > 1


def test_prefetch_early_exit_releases_producer():
    """Breaking out of a prefetch loop must unblock the producer thread
    (it used to block forever in q.put, pinning decoded batches)."""
    import threading
    import time as _time

    from summarymixing_tpu.data.batching import prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    assert next(it) == 0
    it.close()     # same cleanup path as `break` leaving the for-loop
    _time.sleep(0.5)
    n_after = len(produced)
    _time.sleep(0.3)
    assert len(produced) == n_after    # producer stopped
    assert n_after < 100
    assert threading.active_count() < 20


def test_load_wav_8bit_fallback(tmp_path, rng):
    """8-bit WAVs decode through the scipy fallback with the unsigned
    +128 offset removed (they used to crash or pass through unscaled)."""
    import wave as _wave

    from summarymixing_tpu.data.dataio import load_wav

    path = str(tmp_path / "u8.wav")
    audio = (np.sin(2 * np.pi * 440 * np.arange(800) / 8000) * 0.5)
    u8 = ((audio * 127) + 128).astype(np.uint8)
    with _wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(u8.tobytes())
    out = load_wav(path)
    assert out.dtype == np.float32
    assert abs(float(np.mean(out))) < 0.05          # DC offset removed
    assert 0.3 < float(np.abs(out).max()) <= 1.0
