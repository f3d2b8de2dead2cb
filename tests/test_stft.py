"""STFT/ISTFT parity vs torch.stft (same semantics as torchlibrosa: librosa
center/reflect/periodic-hann conventions) and round-trip tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from voicefixer_tpu.config import STFTConfig
from voicefixer_tpu.ops import stft as vstft

CFG = STFTConfig()


def _torch_stft(x: np.ndarray, cfg: STFTConfig):
    win = torch.hann_window(cfg.win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        torch.from_numpy(x.astype(np.float64)),
        n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, window=win, center=cfg.center,
        pad_mode=cfg.pad_mode, return_complex=True,
    )  # [F, T]
    return spec.numpy()


@pytest.mark.parametrize("n", [44100, 132300, 10000])
def test_stft_matches_torch(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    real, imag = vstft.stft_real_imag(jnp.asarray(x), CFG)
    ref = _torch_stft(x, CFG)  # [F, T] complex
    np.testing.assert_allclose(np.asarray(real), ref.real.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(imag), ref.imag.T, atol=2e-3)
    # relative error of the magnitude is what actually matters downstream
    mag = np.hypot(np.asarray(real), np.asarray(imag))
    ref_mag = np.abs(ref).T
    denom = np.maximum(ref_mag, 1e-3)
    # float32 GEMM accumulation over 2048 taps vs float64 reference
    assert np.max(np.abs(mag - ref_mag) / denom) < 5e-4


def test_frame_count():
    # T = ceil(N/hop) + 1 for multiples of hop (SURVEY.md 2.3 step 2)
    n = 1323000
    assert vstft.num_frames(n, CFG) == n // CFG.hop_length + 1


def test_spectrogram_floor():
    x = jnp.zeros(44100)
    sp = vstft.spectrogram(x, CFG, eps=1e-8)
    assert float(sp.min()) >= np.sqrt(1e-8) * 0.999


def test_spectrogram_phase_unit_norm():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    mag, cos, sin = vstft.spectrogram_phase(x, CFG)
    np.testing.assert_allclose(np.asarray(cos**2 + sin**2), 1.0, atol=1e-3)


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    n = 44100
    x = rng.standard_normal(n).astype(np.float32)
    real, imag = vstft.stft_real_imag(jnp.asarray(x), CFG)
    y = vstft.istft(real, imag, CFG, length=n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_istft_matches_torch():
    rng = np.random.default_rng(3)
    n = 22050
    x = rng.standard_normal(n).astype(np.float32)
    spec = _torch_stft(x, CFG)
    win = torch.hann_window(CFG.win_length, periodic=True, dtype=torch.float64)
    ref = torch.istft(torch.from_numpy(spec), n_fft=CFG.n_fft,
                      hop_length=CFG.hop_length, win_length=CFG.win_length,
                      window=win, center=True, length=n).numpy()
    real, imag = vstft.stft_real_imag(jnp.asarray(x), CFG)
    y = vstft.istft(real, imag, CFG, length=n)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3)
