"""Native C++ batch WAV loader: builds with g++, matches the python loader
bit-for-bit, handles stereo, bad files, and padding."""

import os
import wave

import numpy as np
import pytest

from summarymixing_tpu.data.dataio import load_wav
from summarymixing_tpu.data.native_loader import load_wav_batch, native_available


def _write_wav(path, audio, sr=16000, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())


@pytest.fixture
def wav_dir(tmp_path, rng):
    paths = []
    for i, n in enumerate([1000, 2500, 400]):
        audio = rng.standard_normal(n).astype(np.float32) * 0.4
        p = tmp_path / f"a{i}.wav"
        _write_wav(p, audio)
        paths.append(str(p))
    # stereo file
    st = rng.standard_normal(600 * 2).astype(np.float32) * 0.3
    p = tmp_path / "stereo.wav"
    _write_wav(p, st, channels=2)
    paths.append(str(p))
    return paths


def test_native_builds():
    assert native_available(), "g++ build of native/dataloader.cpp failed"


def test_native_matches_python(wav_dir):
    out, lengths = load_wav_batch(wav_dir, max_len=2000)
    assert out.shape == (4, 2000)
    assert list(lengths) == [1000, 2000, 400, 600]
    for i, p in enumerate(wav_dir):
        ref = load_wav(p, 16000)
        m = int(lengths[i])
        np.testing.assert_allclose(out[i, :m], ref[:m], atol=1e-6)
        assert np.all(out[i, m:] == 0.0)


def test_native_bad_file_falls_back(tmp_path, wav_dir):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    with pytest.raises(Exception):
        load_wav_batch([str(bad)], max_len=100)


def test_native_rejects_wrong_rate(tmp_path, rng):
    p = tmp_path / "8k.wav"
    _write_wav(p, rng.standard_normal(100).astype(np.float32), sr=8000)
    with pytest.raises(Exception):
        load_wav_batch([str(p)], max_len=100, expected_rate=16000)


def test_expected_rate_zero_fallback_matches_native(tmp_path, rng):
    """expected_rate<=0 means 'skip the check' in BOTH the native path
    and the python fallback (the fallback used to reject every file)."""
    import summarymixing_tpu.data.native_loader as nl

    p = tmp_path / "8k.wav"
    _write_wav(p, rng.standard_normal(100).astype(np.float32), sr=8000)
    out, lens = load_wav_batch([str(p)], max_len=200, expected_rate=0)
    assert lens[0] == 100
    saved = nl._lib, nl._build_failed
    nl._lib, nl._build_failed = None, True
    try:
        out2, lens2 = load_wav_batch([str(p)], max_len=200, expected_rate=0)
    finally:
        nl._lib, nl._build_failed = saved
    assert lens2[0] == 100
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_partial_native_failure_retries_only_bad_rows(tmp_path, wav_dir, rng):
    """One bad row must not force a python re-decode of the whole batch:
    good rows keep their native output, bad rows get python's precise
    error (or decode, for formats the native path doesn't support)."""
    good = tmp_path / "good.wav"
    _write_wav(good, rng.standard_normal(50).astype(np.float32), sr=16000)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        load_wav_batch([str(good), str(bad)], max_len=100,
                       expected_rate=16000)


def test_malformed_bytes_raise_valueerror():
    """Serving contract: every malformed upload maps to ValueError (HTTP
    400), never IndexError/EOFError/struct.error (HTTP 500)."""
    from summarymixing_tpu.data.dataio import load_audio_bytes

    for bad in (b"fLaC", b"fLaC\x00\x00\x00", b"RIFF",
                b"RIFF\x24\x00\x00\x00WAVE", b"\x00\x00\x00\x00"):
        with pytest.raises(ValueError):
            load_audio_bytes(bad)


def test_flac_bytes_native_path_matches_python():
    """load_audio_bytes routes FLAC through the native codec when
    available; output must match the pure-python decode exactly."""
    import summarymixing_tpu.data.native_loader as nl
    from summarymixing_tpu.data.dataio import load_audio_bytes
    from summarymixing_tpu.data.flac import encode_flac

    x = (np.sin(np.arange(8000) / 20.0) * 20000).astype(np.int32)
    blob = encode_flac(x, 16000)
    a = load_audio_bytes(blob, expected_rate=16000)
    saved = nl._lib, nl._build_failed
    nl._lib, nl._build_failed = None, True
    try:
        b = load_audio_bytes(blob, expected_rate=16000)
    finally:
        nl._lib, nl._build_failed = saved
    np.testing.assert_allclose(a, b, atol=1e-6)
