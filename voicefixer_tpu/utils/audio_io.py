"""Audio I/O without librosa/soundfile (not available in this image).

WAV read/write via scipy.io.wavfile; resampling to the pipeline rate via
scipy.signal.resample_poly (polyphase windowed-sinc). The reference uses
librosa.load (resampy kaiser_best) — numerically different resampler, same
contract (/root/reference/voicefixer/tools/wav.py:116-149).

FLAC read is provided by utils.flac (pure-python decoder) when the file
magic is 'fLaC'.
"""

from __future__ import annotations

import math
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _to_float(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32)


def _resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return wav
    g = math.gcd(sr_in, sr_out)
    return resample_poly(wav, sr_out // g, sr_in // g, axis=0).astype(
        np.float32)


def read_audio(fname: str):
    """Read wav/flac -> (native_sr, float32 [samples, channels] in [-1, 1])."""
    if not os.path.exists(fname):
        raise FileNotFoundError(fname)
    with open(fname, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from voicefixer_tpu.utils import flac, flac_native
        native = flac_native.read_flac(fname)
        if native is not None:
            sr, data = native
        else:
            sr, data = flac.read_flac(fname)
    else:
        sr, data = wavfile.read(fname)
        data = _to_float(np.asarray(data))
    if data.ndim == 1:
        data = data[:, None]
    return sr, data


def read_wave(fname: str, sample_rate: int | None = None,
              mono: bool = False) -> np.ndarray:
    """Read a wav/flac file -> float32 [samples, channels] in [-1, 1],
    resampled to `sample_rate` if given. mono=True averages channels
    (librosa.load semantics)."""
    sr, data = read_audio(fname)
    if mono and data.shape[1] > 1:
        data = data.mean(axis=1, keepdims=True)
    if sample_rate is not None and sr != sample_rate:
        data = _resample(data, sr, sample_rate)
    return data


def load_wav(path: str, sample_rate: int) -> np.ndarray:
    """librosa.load(path, sr)-equivalent: mono float32 [samples]
    (ref: base.py:47-49)."""
    return read_wave(path, sample_rate=sample_rate, mono=True)[:, 0]


def save_wave(frames: np.ndarray, fname: str, sample_rate: int = 44100):
    """Reference save_wave semantics (tools/wav.py:9-37): floats with
    max <= 1 are scaled by 2**15, cast to int16, then written in the
    container chosen by the extension — FLAC via the bundled encoder
    (utils.flac_enc), anything else as RIFF/WAV data (the reference
    defers to soundfile's extension dispatch, __main__.py:30-33)."""
    frames = np.asarray(frames)
    if frames.ndim == 1:
        frames = frames[:, None]
    if frames.ndim >= 3:
        frames = frames.reshape(frames.shape[0], -1) if frames.shape[0] > 1 \
            else frames.reshape(-1, frames.shape[-1])
    if np.issubdtype(frames.dtype, np.floating) and np.max(np.abs(frames)) <= 1:
        frames = frames * (2 ** 15)
    frames = frames.astype(np.int16)
    if fname.lower().endswith(".flac"):
        from voicefixer_tpu.utils.flac_enc import write_flac
        write_flac(frames, fname, sample_rate)
        return
    wavfile.write(fname, sample_rate, frames)


def get_duration(fname: str) -> float:
    sr, data = read_audio(fname)
    return data.shape[0] / sr
