"""ctypes binding for the native C++ batch WAV loader (native/dataloader.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back to the pure-python loader when a toolchain is unavailable.
Drop-in for the manifest batch path: `load_wav_batch(paths, max_len)` ->
(out [B, max_len] float32 zero-padded, lengths [B] int32)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "dataloader.cpp")
_LIB = os.path.join(_REPO, "native", "libdataloader.so")

_lib = None
_build_failed = False
_warned_native_reject = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            # compile to a private temp path and rename into place:
            # os.replace is atomic on one filesystem, so a concurrent
            # process (multi-process launch, parallel tests) never
            # dlopens a half-written library
            tmp = f"{_LIB}.tmp.{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _LIB)
        lib = ctypes.CDLL(_LIB)
        lib.load_wav_batch.restype = ctypes.c_int
        lib.load_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _ensure_lib() is not None


def load_wav_batch(
    paths: Sequence[str],
    max_len: int,
    expected_rate: int = 16000,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch of WAV files into a zero-padded float32 matrix.
    Uses the native threaded loader when available, else python."""
    n = len(paths)
    # the native loader treats expected_rate <= 0 as "skip the check";
    # the python loader's contract is None for the same thing
    py_rate = expected_rate if expected_rate > 0 else None
    from summarymixing_tpu.data.dataio import load_wav

    lib = _ensure_lib()
    if lib is not None:
        out = np.zeros((n, max_len), np.float32)
        lengths = np.zeros((n,), np.int32)
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths]
        )
        rc = lib.load_wav_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_len,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            expected_rate, num_threads,
        )
        if rc == 0:
            return out, lengths
        # retry ONLY the rows the native pass rejected (it zeroes their
        # lengths; successful rows are complete) through python, which
        # either decodes the formats the C++ path doesn't (24/32-bit
        # WAV) or raises a precise per-file error. Re-decoding the whole
        # batch here would silently run the slow path for every row.
        global _warned_native_reject
        if not _warned_native_reject:
            _warned_native_reject = True
            print(f"NOTE: native loader rejected {paths[rc - 1]!r} "
                  "(unsupported format or malformed); retrying such rows "
                  "with the python decoder. If most of the corpus is "
                  "24/32-bit WAV, the input pipeline runs at python "
                  "speed.")
        for i, p in enumerate(paths):
            if lengths[i] == 0:
                audio = load_wav(p, py_rate)
                m = min(len(audio), max_len)
                out[i, :m] = audio[:m]
                out[i, m:] = 0.0
                lengths[i] = m
        return out, lengths

    out = np.zeros((n, max_len), np.float32)
    lengths = np.zeros((n,), np.int32)
    for i, p in enumerate(paths):
        audio = load_wav(p, py_rate)
        m = min(len(audio), max_len)
        out[i, :m] = audio[:m]
        lengths[i] = m
    return out, lengths
