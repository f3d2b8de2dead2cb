"""Mel filterbanks for both conventions the reference mixes.

The analysis stage uses torchaudio-style fbanks (htk scale, norm=None):
`/root/reference/voicefixer/tools/mel_scale.py:173-238` applied as
`sp [.., T, F] @ fb [F, n_mels]` (mel_scale.py:63-77).

The vocoder was trained on librosa mels (htk scale, slaney area-norm):
`/root/reference/voicefixer/vocoder/model/util.py:115-123`. The bridge between
the two is the fitted exponential weight curve in config.mel_weight_curve
(ref: vocoder/config.py:300-316).
"""

from __future__ import annotations

import functools

import numpy as np


def _hz_to_mel_htk(freq: np.ndarray | float) -> np.ndarray | float:
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(mels: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mels, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def melscale_fbanks(n_freqs: int = 1025,
                    f_min: float = 0.0,
                    f_max: float = 22050.0,
                    n_mels: int = 128,
                    sample_rate: int = 44100,
                    norm: str | None = None) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], htk scale.

    norm=None reproduces torchaudio/mel_scale.py semantics (analysis stage);
    norm='slaney' adds the 2/(f_hi-f_lo) area normalization that librosa
    applies by default (vocoder oracle path).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    # triangular filters (mel_scale.py:147-170)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels+2]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError("norm must be None or 'slaney'")
    return fb.astype(np.float32)


def librosa_mel_basis(n_fft: int = 2048,
                      n_mels: int = 128,
                      sample_rate: int = 44100,
                      f_min: float = 0.0,
                      f_max: float | None = None) -> np.ndarray:
    """librosa.filters.mel(htk=True) equivalent: [n_mels, n_freqs]
    (ref: vocoder/model/util.py:115-123, fmin=0, fmax=sr//2)."""
    if f_max is None:
        f_max = float(sample_rate // 2)
    fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate,
                         norm="slaney")
    return fb.T.copy()
