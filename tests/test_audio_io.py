"""Audio I/O: pure-Python FLAC decode, WAV round-trip, resampling, and
save_wave int16 semantics (ref: /root/reference/voicefixer/tools/wav.py:9-37).
"""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from voicefixer_tpu.utils import audio_io
from voicefixer_tpu.utils.flac import read_flac

ORIG_WAV = "/root/reference/test/utterance/original/original.wav"
ORIG_FLAC = "/root/reference/test/utterance/original/original.flac"
FIXTURES = [
    "/root/reference/test/utterance/original/p360_001_mic1.flac",
    "/root/reference/test/utterance/target/oracle.flac",
    "/root/reference/test/utterance/target/output_mode_0.flac",
    "/root/reference/test/utterance/target/output_mode_1.flac",
    "/root/reference/test/utterance/target/output_mode_2.flac",
]


def test_flac_lossless_vs_wav():
    """original.flac and original.wav are the same audio; FLAC is lossless so
    the decoded integers must match bit-for-bit."""
    sr, d = read_flac(ORIG_FLAC)
    wsr, wd = wavfile.read(ORIG_WAV)
    assert sr == wsr == 44100
    ints = np.round(d[:, 0] * 32768).astype(np.int64)
    assert np.array_equal(ints, wd.astype(np.int64))


@pytest.mark.parametrize("path", FIXTURES)
def test_flac_fixtures_decode(path):
    sr, d = read_flac(path)
    assert sr == 44100
    assert d.ndim == 2 and d.shape[0] > 40000
    assert np.abs(d).max() <= 1.0


def test_read_audio_dispatch():
    sr_w, d_w = audio_io.read_audio(ORIG_WAV)
    sr_f, d_f = audio_io.read_audio(ORIG_FLAC)
    assert sr_w == sr_f
    np.testing.assert_allclose(d_w, d_f, atol=1e-7)


def test_load_wav_mono_shape():
    wav = audio_io.load_wav(ORIG_WAV, 44100)
    assert wav.shape == (132300,)
    assert wav.dtype == np.float32


def test_resample_halves_length():
    wav = audio_io.read_wave(ORIG_WAV, sample_rate=22050)
    assert abs(wav.shape[0] - 132300 // 2) <= 1


def test_save_wave_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.random(1000, dtype=np.float32) * 2 - 1) * 0.5
    out = str(tmp_path / "x.wav")
    audio_io.save_wave(wav, out, 44100)
    sr, data = wavfile.read(out)
    assert sr == 44100 and data.dtype == np.int16
    np.testing.assert_allclose(data / 32768.0, wav, atol=1 / 32768.0)


def test_save_wave_int16_scaling_matches_reference(tmp_path):
    """Floats with max<=1 are scaled by 2**15 then truncated to int16
    (tools/wav.py:27-33)."""
    wav = np.array([0.5, -0.5, 1.0 - 2 ** -15], dtype=np.float32)
    out = str(tmp_path / "y.wav")
    audio_io.save_wave(wav, out, 44100)
    _, data = wavfile.read(out)
    data = data.reshape(-1)
    assert data[0] == 16384 and data[1] == -16384


def test_native_flac_decoder_bit_exact():
    """The C++ decoder (native/flacdec.cpp) must match the pure-Python
    reference decoder exactly on the bundled utterances; skipped when no
    compiler/library is available (the audio_io path falls back)."""
    from voicefixer_tpu.utils import flac, flac_native

    if flac_native.load() is None:
        pytest.skip("native FLAC library unavailable (no g++)")
    for name in ("original.flac", "p360_001_mic1.flac"):
        path = f"/root/reference/test/utterance/original/{name}"
        if not os.path.exists(path):
            pytest.skip("reference fixtures unavailable")
        sr_p, d_p = flac.read_flac(path)
        sr_n, d_n = flac_native.read_flac(path)
        assert sr_p == sr_n
        np.testing.assert_array_equal(d_p, d_n)
