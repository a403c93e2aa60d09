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
