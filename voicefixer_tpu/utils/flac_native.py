"""ctypes loader for the native C++ FLAC decoder (native/flacdec.cpp).

The pure-Python decoder (utils/flac.py) is the semantic reference but runs
~11x real-time — a bottleneck for folder-mode inference when the restore
pipeline itself runs >150x real-time per chip. The native decoder is built
on first use with g++ (cached under native/build/) and falls back cleanly:
`load()` returns None when no compiler/library is available, and callers
(utils/audio_io.read_audio) drop back to the Python decoder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libvfflac.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "flacdec.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """Return the loaded library or None (no compiler / build failure)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and (
                not os.path.exists(_SRC_PATH) or not _build()):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.vf_flac_probe.restype = ctypes.c_int
        lib.vf_flac_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.vf_flac_decode.restype = ctypes.c_int
        lib.vf_flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def read_flac(fname: str):
    """Native decode: (sample_rate, float32 [samples, channels] in [-1, 1)).
    Returns None when the native library is unavailable or the stream needs
    the Python fallback (unknown total_samples)."""
    lib = load()
    if lib is None:
        return None
    with open(fname, "rb") as f:
        data = f.read()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    rc = lib.vf_flac_probe(data, len(data), ctypes.byref(sr),
                           ctypes.byref(ch), ctypes.byref(bps),
                           ctypes.byref(total))
    if rc != 0 or total.value == 0:
        return None  # malformed or streaming file -> Python path decides
    out = np.empty((total.value, ch.value), dtype=np.int32)
    decoded = ctypes.c_int64()
    rc = lib.vf_flac_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        total.value, ctypes.byref(decoded))
    if rc != 0:
        return None
    out = out[:decoded.value]
    scale = float(1 << (bps.value - 1))
    return int(sr.value), (out / scale).astype(np.float32)
