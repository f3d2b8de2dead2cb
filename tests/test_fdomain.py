"""FDomainHelper completion: complex and subband spectrogram variants
(ref: /root/reference/voicefixer/tools/modules/fDomainHelper.py:64-234 —
dead at inference there, reimplemented for API completeness; VERDICT r3
missing-4).

The reference's own subband path cannot run (its PQMF .mat filter files
are 0-byte placeholders), so the acceptance bar here is round-trip
reconstruction against the analytically designed ops.pqmf bank plus
consistency with the ops.stft building blocks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import STFTConfig
from voicefixer_tpu.ops import fdomain as F
from voicefixer_tpu.ops import stft as vstft

CFG = STFTConfig(n_fft=512, hop_length=128, win_length=512)


def _wav(b=2, c=1, n=8192, seed=0):
    return 0.3 * jax.random.normal(jax.random.PRNGKey(seed), (b, c, n),
                                   jnp.float32)


def test_complex_spectrogram_roundtrip():
    x = _wav(c=1)[:, 0]
    spec = F.complex_spectrogram(x, CFG)
    assert spec.shape[-3] == 2
    back = F.reverse_complex_spectrogram(spec, CFG, length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_complex_spectrogram_matches_stft():
    x = _wav(c=2)
    spec = F.wav_to_complex_spectrogram(x, CFG)
    real, imag = vstft.stft_real_imag(x, CFG)
    np.testing.assert_array_equal(np.asarray(spec[:, 0]),
                                  np.asarray(real[:, 0]))
    np.testing.assert_array_equal(np.asarray(spec[:, 1]),
                                  np.asarray(imag[:, 0]))
    np.testing.assert_array_equal(np.asarray(spec[:, 2]),
                                  np.asarray(real[:, 1]))


def test_multichannel_complex_roundtrip():
    x = _wav(c=2)
    spec = F.wav_to_complex_spectrogram(x, CFG)
    assert spec.shape[1] == 4
    back = F.complex_spectrogram_to_wav(spec, CFG, length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_spectrogram_phase_to_wav_roundtrip():
    x = _wav(c=2)
    sps, coss, sins = vstft.wav_to_spectrogram_phase(x, CFG)
    back = F.spectrogram_phase_to_wav(sps, coss, sins, CFG,
                                      length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_spectrogram_to_wav_with_phase_from():
    """Feeding a magnitude back with the phase of the same signal must
    reconstruct it (the reference's spectrogram_to_wav contract)."""
    x = _wav(c=1)
    mag = F.wav_to_spectrogram(x, CFG)
    back = F.spectrogram_to_wav_with_phase_from(x, mag, CFG,
                                                length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def _snr(a, b, edge=128):
    """Interior SNR: the PQMF filter's startup transient (~L samples)
    lives at the signal edges and is a property of the bank, not of the
    spectrogram transforms under test (see tests/test_pqmf.py)."""
    a = np.asarray(a, np.float64)[..., edge:-edge]
    b = np.asarray(b, np.float64)[..., edge:-edge]
    return 10 * np.log10((b * b).sum() / ((a - b) ** 2).sum())


def test_complex_subband_roundtrip():
    x = _wav(c=1, n=16384)
    spec = F.wav_to_complex_subband_spectrogram(x, CFG, subband=4)
    assert spec.shape[1] == 8  # 2 * S * C
    back = F.complex_subband_spectrogram_to_wav(spec, CFG, subband=4,
                                                length=x.shape[-1] // 4)
    assert back.shape == x.shape
    # PQMF is near-perfect-reconstruction: the bank itself bounds SNR
    # (~63 dB for 4 bands, ops.pqmf design notes); the transform chain
    # must not degrade it materially
    assert _snr(back, x) > 55, _snr(back, x)


def test_mag_phase_subband_roundtrip():
    x = _wav(c=1, n=16384)
    sps, coss, sins = F.wav_to_mag_phase_subband_spectrogram(x, CFG,
                                                             subband=4)
    assert sps.shape[1] == 4
    back = F.mag_phase_subband_spectrogram_to_wav(
        sps, coss, sins, CFG, subband=4, length=x.shape[-1] // 4)
    assert back.shape == x.shape
    assert _snr(back, x) > 55, _snr(back, x)


def test_subband_config_scaling():
    scfg = F.subband_config(CFG, 4)
    assert (scfg.n_fft, scfg.hop_length, scfg.win_length) == (128, 32, 128)
