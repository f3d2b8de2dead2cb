"""Complete FDomainHelper surface: complex and subband spectrogram
variants (ref: /root/reference/voicefixer/tools/modules/fDomainHelper.py
:64-234).

The executed inference path only uses wav_to_spectrogram_phase /
spectrogram_to_wav (ops.stft); these remaining helpers are the reference's
training-era feature transforms (complex spectrograms, PQMF subband
decompositions — dead at inference because FDomainHelper is constructed
with subband=None, fDomainHelper.py:16-22, and the reference's PQMF filter
files are 0-byte placeholders). They are implemented here for API
completeness on top of ops.stft and the analytically-designed ops.pqmf,
batched over channels instead of the reference's per-channel python loops.

Subband semantics mirror the reference (fDomainHelper.py:42-61): with
subband = S the STFT runs at n_fft/S, hop/S, win/S on the S-times-
decimated subband signals. The PQMF here is causal-padded inside
ops.pqmf.analysis/synthesis, so unlike the reference's
`length + pad_samples // N` bookkeeping (fDomainHelper.py:227), lengths
pass through unchanged.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from voicefixer_tpu.config import STFTConfig
from voicefixer_tpu.ops import pqmf
from voicefixer_tpu.ops.stft import istft, spectrogram, spectrogram_phase, \
    stft_real_imag


def subband_config(cfg: STFTConfig, subband: int) -> STFTConfig:
    """STFT settings for S-times-decimated subband signals
    (fDomainHelper.py:42-61)."""
    return dataclasses.replace(cfg, n_fft=cfg.n_fft // subband,
                               hop_length=cfg.hop_length // subband,
                               win_length=cfg.win_length // subband)


# ------------------------------------------------------------- magnitude path

def wav_to_spectrogram(x: jnp.ndarray, cfg: STFTConfig,
                       eps: float = 1e-8) -> jnp.ndarray:
    """[B, C, N] -> magnitude [B, C, T, F] (fDomainHelper.py:126-140)."""
    return spectrogram(x, cfg, eps=eps)


def spectrogram_to_wav_with_phase_from(x: jnp.ndarray, mag: jnp.ndarray,
                                       cfg: STFTConfig,
                                       length: int | None = None
                                       ) -> jnp.ndarray:
    """Resynthesize `mag` using the PHASE of reference signal `x`
    (fDomainHelper.py:142-165 `spectrogram_to_wav`): x [B, C, N],
    mag [B, C, T, F] -> [B, C, N]."""
    _, cos, sin = spectrogram_phase(x, cfg, eps=1e-8)
    return istft(mag * cos, mag * sin, cfg, length=length)


def spectrogram_phase_to_wav(sps: jnp.ndarray, coss: jnp.ndarray,
                             sins: jnp.ndarray, cfg: STFTConfig,
                             length: int | None = None) -> jnp.ndarray:
    """(mag, cos, sin) [B, C, T, F] -> [B, C, N]
    (fDomainHelper.py:112-124)."""
    return istft(sps * coss, sps * sins, cfg, length=length)


# --------------------------------------------------------------- complex path

def complex_spectrogram(x: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """[B, N] -> [B, 2, T, F] with real/imag stacked on the channel axis
    (fDomainHelper.py:66-70)."""
    real, imag = stft_real_imag(x, cfg)
    return jnp.stack([real, imag], axis=-3)


def reverse_complex_spectrogram(spec: jnp.ndarray, cfg: STFTConfig,
                                length: int | None = None) -> jnp.ndarray:
    """[B, 2, T, F] -> [B, N] (fDomainHelper.py:72-75)."""
    return istft(spec[..., 0, :, :], spec[..., 1, :, :], cfg, length=length)


def wav_to_complex_spectrogram(x: jnp.ndarray, cfg: STFTConfig
                               ) -> jnp.ndarray:
    """[B, C, N] -> [B, 2C, T, F], channel c at rows (2c, 2c+1)
    (fDomainHelper.py:168-175)."""
    b, c, n = x.shape
    real, imag = stft_real_imag(x, cfg)        # [B, C, T, F]
    ri = jnp.stack([real, imag], axis=2)       # [B, C, 2, T, F]
    return ri.reshape(b, 2 * c, *ri.shape[-2:])


def complex_spectrogram_to_wav(spec: jnp.ndarray, cfg: STFTConfig,
                               length: int | None = None) -> jnp.ndarray:
    """[B, 2C, T, F] -> [B, C, N] (fDomainHelper.py:177-189)."""
    b, c2, t, f = spec.shape
    ri = spec.reshape(b, c2 // 2, 2, t, f)
    return istft(ri[:, :, 0], ri[:, :, 1], cfg, length=length)


# --------------------------------------------------------------- subband path

def _analysis(x: jnp.ndarray, subband: int) -> jnp.ndarray:
    """[B, C, N] -> [B, C*S, N/S], channel c's subbands at rows
    [c*S, (c+1)*S) (ops.pqmf uses NWC layout internally)."""
    b, c, n = x.shape
    sub = pqmf.analysis(x.reshape(b * c, n, 1), bands=subband)
    sub = jnp.swapaxes(sub, -1, -2)  # [B*C, S, N/S]
    return sub.reshape(b, c * subband, -1)


def _synthesis(sub: jnp.ndarray, subband: int) -> jnp.ndarray:
    """[B, C*S, N'] -> [B, C, N'*S] (inverse of _analysis)."""
    b, sc, n = sub.shape
    c = sc // subband
    sb = jnp.swapaxes(sub.reshape(b * c, subband, n), -1, -2)
    wav = pqmf.synthesis(sb, bands=subband)  # [B*C, N, 1]
    return wav[..., 0].reshape(b, c, -1)


def wav_to_complex_subband_spectrogram(x: jnp.ndarray, cfg: STFTConfig,
                                       subband: int) -> jnp.ndarray:
    """[B, C, N] -> [B, 2*S*C, T', F'] (fDomainHelper.py:191-196)."""
    return wav_to_complex_spectrogram(_analysis(x, subband),
                                      subband_config(cfg, subband))


def complex_subband_spectrogram_to_wav(spec: jnp.ndarray, cfg: STFTConfig,
                                       subband: int,
                                       length: int | None = None
                                       ) -> jnp.ndarray:
    """[B, 2*S*C, T', F'] -> [B, C, N] (fDomainHelper.py:198-203)."""
    sub = complex_spectrogram_to_wav(spec, subband_config(cfg, subband),
                                     length=length)
    return _synthesis(sub, subband)


def wav_to_mag_phase_subband_spectrogram(x: jnp.ndarray, cfg: STFTConfig,
                                         subband: int, eps: float = 1e-8):
    """[B, C, N] -> (sps, coss, sins) each [B, S*C, T', F']
    (fDomainHelper.py:205-223)."""
    return spectrogram_phase(_analysis(x, subband),
                             subband_config(cfg, subband), eps=eps)


def mag_phase_subband_spectrogram_to_wav(sps: jnp.ndarray, coss: jnp.ndarray,
                                         sins: jnp.ndarray, cfg: STFTConfig,
                                         subband: int,
                                         length: int | None = None
                                         ) -> jnp.ndarray:
    """(sps, coss, sins) [B, S*C, T', F'] -> [B, C, N]
    (fDomainHelper.py:225-232)."""
    scfg = subband_config(cfg, subband)
    sub = istft(sps * coss, sps * sins, scfg, length=length)
    return _synthesis(sub, subband)
