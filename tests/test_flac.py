"""FLAC codec (data/flac.py): hand-assembled golden streams, encoder/
decoder round trips over every subframe/stereo/residual code path, CRC
and MD5 verification, metadata scanning.

The golden streams are built by an independent bit packer defined in
this file (spec-per-the-test, not the module's writer), so a mirrored
misunderstanding between the module's encoder and decoder cannot pass.
"""

import numpy as np
import pytest

from summarymixing_tpu.data.flac import (
    StreamInfo,
    decode_flac,
    decode_flac_file,
    encode_flac,
    encode_flac_file,
    read_streaminfo,
)


@pytest.fixture
def rng():
    return np.random.default_rng(666)


# --- independent helpers (deliberately NOT the module's implementations) ---

class Pack:
    def __init__(self):
        self.bits = []

    def put(self, v, k):
        for i in range(k - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8_bitwise(data):
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16_bitwise(data):
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def golden_stream(subframe_bits, blocksize, n_samples, md5=b"\x00" * 16):
    """Assemble a minimal mono 16 kHz / 16-bit stream with one frame."""
    p = Pack()
    p.put(4, 16).put(4, 16)            # min/max blocksize
    p.put(0, 24).put(0, 24)            # min/max frame size (unknown)
    p.put(16000, 20)                   # sample rate
    p.put(0, 3)                        # channels - 1
    p.put(15, 5)                       # bps - 1
    p.put(n_samples, 36)               # total samples
    streaminfo = p.bytes() + md5
    head = (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo)

    f = Pack()
    f.put(0b11111111111110, 14)        # sync
    f.put(0, 1)                        # reserved
    f.put(0, 1)                        # fixed blocking
    f.put(6, 4)                        # blocksize: 8-bit at end of header
    f.put(0, 4)                        # sample rate: from STREAMINFO
    f.put(0, 4)                        # 1 channel
    f.put(0b100, 3)                    # 16-bit
    f.put(0, 1)                        # reserved
    f.put(0, 8)                        # frame number 0 (utf8, 1 byte)
    f.put(blocksize - 1, 8)            # blocksize - 1
    hdr = f.bytes()
    hdr += bytes([crc8_bitwise(hdr)])

    body = Pack()
    for v, k in subframe_bits:
        body.put(v, k)
    pad = (-len(body.bits)) % 8
    if pad:
        body.put(0, pad)
    frame = hdr + body.bytes()
    frame += crc16_bitwise(frame).to_bytes(2, "big")
    return head + frame


def test_golden_constant_frame():
    # CONSTANT subframe, value 1000, blocksize 4
    bits = [(0, 1), (0, 6), (0, 1), (1000, 16)]
    data = golden_stream(bits, blocksize=4, n_samples=4)
    samples, rate, bps = decode_flac(data)
    assert rate == 16000 and bps == 16
    np.testing.assert_array_equal(samples, [1000, 1000, 1000, 1000])


def test_golden_verbatim_frame():
    vals = [-3, 0, 32767, -32768]
    bits = [(0, 1), (1, 6), (0, 1)] + [(v & 0xFFFF, 16) for v in vals]
    data = golden_stream(bits, blocksize=4, n_samples=4)
    samples, _, _ = decode_flac(data)
    np.testing.assert_array_equal(samples, vals)


def test_golden_fixed2_rice_frame():
    # x = [100, 110, 120, 130]: order-2 residuals are exactly zero, so
    # rice(param 0) encodes each residual as a single 1 bit.
    bits = [
        (0, 1), (8 + 2, 6), (0, 1),      # FIXED order 2
        (100 & 0xFFFF, 16), (110 & 0xFFFF, 16),  # warmup
        (0, 2),                           # rice method 0
        (0, 4),                           # partition order 0
        (0, 4),                           # rice parameter 0
        (0b1, 1), (0b1, 1),               # two zero residuals (zigzag 0)
    ]
    data = golden_stream(bits, blocksize=4, n_samples=4)
    samples, _, _ = decode_flac(data)
    np.testing.assert_array_equal(samples, [100, 110, 120, 130])


def test_golden_wasted_bits():
    # verbatim with 2 wasted bits: stored values are x >> 2
    vals = [4, -8, 12, 400]
    bits = [(0, 1), (1, 6), (1, 1), (0b01, 2)]  # wasted flag, unary 1 -> 2
    bits += [((v >> 2) & 0x3FFF, 14) for v in vals]
    data = golden_stream(bits, blocksize=4, n_samples=4)
    samples, _, _ = decode_flac(data)
    np.testing.assert_array_equal(samples, vals)


def test_golden_bad_crc_rejected():
    bits = [(0, 1), (0, 6), (0, 1), (1000, 16)]
    data = bytearray(golden_stream(bits, blocksize=4, n_samples=4))
    data[-1] ^= 0x40  # corrupt frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(data))


# --- round trips through the module's own encoder ---

def _audio(rng, n, nch=1, bps=16, lowpass=True):
    """Speech-like test signal: filtered noise + tone, full int range."""
    lim = 1 << (bps - 1)
    x = rng.standard_normal((n, nch))
    if lowpass:  # correlated signal so predictors actually engage
        for _ in range(3):
            x[1:] = 0.7 * x[1:] + 0.3 * x[:-1]
    t = np.arange(n)[:, None]
    x = x / np.abs(x).max() * 0.5 + 0.3 * np.sin(0.05 * t)
    out = np.clip((x * (lim - 1)).round(), -lim, lim - 1).astype(np.int64)
    return out[:, 0] if nch == 1 else out


@pytest.mark.parametrize("force", [
    None, "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc",
])
def test_roundtrip_subframe_types(rng, force):
    x = _audio(rng, 1000)
    data = encode_flac(x, 16000, force_subframe=force, blocksize=256)
    y, rate, bps = decode_flac(data)
    assert rate == 16000 and bps == 16
    np.testing.assert_array_equal(y, x)


def test_roundtrip_constant_blocks():
    x = np.full(700, -123, np.int64)
    data = encode_flac(x, 16000, blocksize=256)
    y, _, _ = decode_flac(data)
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("order", [1, 8, 16, 32])
def test_roundtrip_lpc_orders(rng, order):
    x = _audio(rng, 800)
    data = encode_flac(x, 16000, force_subframe="lpc", lpc_order=order,
                       blocksize=400)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


@pytest.mark.parametrize("mode", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_roundtrip_stereo_modes(rng, mode):
    x = _audio(rng, 900, nch=2)
    x[:, 1] = (0.8 * x[:, 0] + 0.2 * x[:, 1]).astype(np.int64)  # correlated
    data = encode_flac(x, 16000, stereo_mode=mode, blocksize=256)
    y, _, _ = decode_flac(data)
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("porder", [0, 2, 4])
def test_roundtrip_partitions(rng, porder):
    x = _audio(rng, 1024)
    data = encode_flac(x, 16000, partition_order=porder, blocksize=512)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


@pytest.mark.parametrize("kwargs", [
    dict(rice2=True),
    dict(force_escape=True),
    dict(rice2=True, force_escape=True),
    dict(variable_blocking=True),
])
def test_roundtrip_residual_codings(rng, kwargs):
    x = _audio(rng, 700)
    data = encode_flac(x, 16000, blocksize=256, **kwargs)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


def test_roundtrip_wasted_bits(rng):
    x = _audio(rng, 600) & ~0b111  # 3 shared trailing zero bits
    data = encode_flac(x, 16000, blocksize=200)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


@pytest.mark.parametrize("bps", [8, 24])
def test_roundtrip_bit_depths(rng, bps):
    x = _audio(rng, 500, bps=bps)
    data = encode_flac(x, 16000, bits_per_sample=bps, blocksize=250)
    y, _, got_bps = decode_flac(data)
    assert got_bps == bps
    np.testing.assert_array_equal(y, x)


def test_roundtrip_extreme_values():
    # full-scale alternation: maximal residuals, rice escape pressure
    x = np.tile([32767, -32768], 300).astype(np.int64)
    data = encode_flac(x, 16000, blocksize=128)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


def test_roundtrip_short_final_block(rng):
    x = _audio(rng, 4096 + 37)  # non-multiple of blocksize
    data = encode_flac(x, 16000, blocksize=4096)
    np.testing.assert_array_equal(decode_flac(data)[0], x)


def test_md5_detects_tampering(rng):
    x = _audio(rng, 512)
    data = bytearray(encode_flac(x, 16000, blocksize=512))
    # alter one sample AND fix up the frame CRC so only MD5 can catch it:
    # easier equivalent — flip a bit in the stored MD5 itself
    data[26] ^= 1  # inside STREAMINFO md5 (4 magic + 4 hdr + 18 + off)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    decode_flac(bytes(data), verify_md5=False)  # opt-out still decodes


def test_streaminfo_scan(tmp_path, rng):
    x = _audio(rng, 16000 * 3 + 40)
    path = str(tmp_path / "a.flac")
    encode_flac_file(path, x, 16000)
    si = read_streaminfo(path)
    assert isinstance(si, StreamInfo)
    assert si.sample_rate == 16000
    assert si.channels == 1
    assert si.bits_per_sample == 16
    assert si.total_samples == len(x)
    assert abs(si.duration - len(x) / 16000) < 1e-9
    y, rate, _ = decode_flac_file(path)
    np.testing.assert_array_equal(y, x)


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF....WAVE" + b"\x00" * 64)
