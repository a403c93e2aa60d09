"""Native C++ FLAC decoder (native/dataloader.cpp) parity against the
pure-python oracle (data/flac.py), through the load_wav_batch ABI."""

import numpy as np
import pytest

from summarymixing_tpu.data import native_loader
from summarymixing_tpu.data.dataio import load_wav
from summarymixing_tpu.data.flac import encode_flac_file

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="native loader unavailable")


@pytest.fixture
def rng():
    return np.random.default_rng(123)


def _signal(rng, n, nch=1):
    x = rng.standard_normal((n, nch))
    for _ in range(3):
        x[1:] = 0.7 * x[1:] + 0.3 * x[:-1]
    x = x / np.abs(x).max() * 0.6
    out = (x * 32000).round().astype(np.int64)
    return out[:, 0] if nch == 1 else out


@pytest.mark.parametrize("opts", [
    dict(),
    dict(force_subframe="verbatim"),
    dict(force_subframe="lpc", lpc_order=12, partition_order=2),
    dict(force_subframe="fixed3", rice2=True),
    dict(force_escape=True),
])
def test_native_matches_python_mono(tmp_path, rng, opts):
    x = _signal(rng, 5000)
    path = str(tmp_path / "a.flac")
    encode_flac_file(path, x, 16000, blocksize=1024, **opts)
    ref = load_wav(path, 16000)  # python codec path
    out, lengths = native_loader.load_wav_batch([path], 6000, 16000)
    assert lengths[0] == 5000
    np.testing.assert_allclose(out[0, :5000], ref, atol=1e-7)
    assert (out[0, 5000:] == 0).all()


@pytest.mark.parametrize("mode", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_native_stereo_mixdown(tmp_path, rng, mode):
    x = _signal(rng, 3000, nch=2)
    x[:, 1] = (0.8 * x[:, 0] + 0.2 * x[:, 1]).astype(np.int64)
    path = str(tmp_path / "s.flac")
    encode_flac_file(path, x, 16000, blocksize=512, stereo_mode=mode)
    ref = load_wav(path, 16000)
    out, lengths = native_loader.load_wav_batch([path], 3000, 16000)
    assert lengths[0] == 3000
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


def test_native_mixed_wav_flac_batch(tmp_path, rng):
    import wave as wave_mod

    xf = _signal(rng, 2000)
    flac_path = str(tmp_path / "a.flac")
    encode_flac_file(flac_path, xf, 16000)

    xw = _signal(rng, 1500).astype(np.int16)
    wav_path = str(tmp_path / "b.wav")
    with wave_mod.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(xw.tobytes())

    out, lengths = native_loader.load_wav_batch(
        [flac_path, wav_path], 2500, 16000)
    np.testing.assert_array_equal(lengths, [2000, 1500])
    np.testing.assert_allclose(
        out[0, :2000], xf.astype(np.float32) / 32768.0, atol=1e-7)
    np.testing.assert_allclose(
        out[1, :1500], xw.astype(np.float32) / 32768.0, atol=1e-7)


def test_native_rejects_corrupt_flac(tmp_path, rng):
    x = _signal(rng, 1000)
    path = str(tmp_path / "bad.flac")
    encode_flac_file(path, x, 16000)
    with open(path, "r+b") as f:
        f.seek(-1, 2)
        last = f.read(1)[0]
        f.seek(-1, 2)
        f.write(bytes([last ^ 0x20]))  # corrupt final frame CRC
    lib = native_loader._ensure_lib()
    import ctypes

    out = np.zeros((1, 1000), np.float32)
    lengths = np.zeros((1,), np.int32)
    rc = lib.load_wav_batch(
        (ctypes.c_char_p * 1)(path.encode()), 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 1000,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 16000, 1)
    assert rc == 1  # 1-based index of the bad file


def test_native_wrong_rate_rejected(tmp_path, rng):
    x = _signal(rng, 800)
    path = str(tmp_path / "r8k.flac")
    encode_flac_file(path, x, 8000)
    lib = native_loader._ensure_lib()
    import ctypes

    out = np.zeros((1, 800), np.float32)
    lengths = np.zeros((1,), np.int32)
    rc = lib.load_wav_batch(
        (ctypes.c_char_p * 1)(path.encode()), 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 800,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 16000, 1)
    assert rc == 1
