"""STFT / ISTFT as MXU-friendly matmuls.

The reference computes its STFT with torchlibrosa's frozen-conv DFT
(`/root/reference/voicefixer/tools/modules/fDomainHelper.py:23-41`): center=True,
reflect padding of n_fft//2 on both sides, periodic hann window, and an
np.fft-convention DFT (real = sum x w cos, imag = -sum x w sin).

On TPU the natural formulation is: frame the padded signal into overlapping
windows `[T, n_fft]` and multiply by a precomputed windowed-DFT matrix
`[n_fft, 2*(n_fft//2+1)]` — one large matmul that XLA tiles straight onto the
MXU. The window is folded into the DFT matrix so framing + windowing + DFT is a
single GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import STFTConfig
from voicefixer_tpu.ops.precision import get_precision


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic hann window, matching scipy.signal.get_window('hann', N,
    fftbins=True) which librosa/torchlibrosa use."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int, win_length: int):
    """Windowed DFT matrices W_re, W_im of shape [n_fft, n_freqs] (numpy —
    converted to device constants at the call site so nothing traced is ever
    cached).

    real[k] = sum_n x[n] w[n] cos(2 pi k n / N)
    imag[k] = -sum_n x[n] w[n] sin(2 pi k n / N)   (np.fft sign convention)
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [n_fft, n_freqs]
    w = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    w_re = (np.cos(ang) * w[:, None]).astype(np.float32)
    w_im = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return w_re, w_im


def dft_matrices_ingraph(n_fft: int, win_length: int, dtype=jnp.float32):
    """In-graph (traceable) windowed DFT matrices — numerically equal to
    dft_matrices to ~1e-7 but WITHOUT baking 2 x [n_fft, n_freqs] fp32
    constants (~17 MB at n_fft=2048) into the compiled program: the
    development tunnel's remote-compile endpoint rejects oversized program
    uploads (HTTP 413), and the constants also bloat the persistent cache.

    Accuracy: the angle 2*pi*n*k/N is reduced EXACTLY first — n*k mod N is
    computed in int32 (products < 2^24, exact), so cos/sin see arguments in
    [0, 2*pi) and fp32 argument-reduction error never scales with n*k.
    """
    n_freqs = n_fft // 2 + 1
    n = jax.lax.broadcasted_iota(jnp.int32, (n_fft, n_freqs), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_fft, n_freqs), 1)
    m = (n * k) % n_fft
    ang = m.astype(jnp.float32) * np.float32(2.0 * np.pi / n_fft)
    w = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    w = jnp.asarray(w[:, None], dtype=jnp.float32)
    w_re = (jnp.cos(ang) * w).astype(dtype)
    w_im = (-jnp.sin(ang) * w).astype(dtype)
    return w_re, w_im


def num_frames(n_samples: int, cfg: STFTConfig) -> int:
    if cfg.center:
        padded = n_samples + 2 * (cfg.n_fft // 2)
    else:
        padded = n_samples
    return (padded - cfg.n_fft) // cfg.hop_length + 1


def frame_signal(x: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """[..., n_samples] -> [..., T, n_fft] overlapping frames (after center
    reflect-padding).

    Implemented gather-free: reshape into hop-sized rows, then concatenate
    ceil(n_fft/hop)+1 shifted row views. A gather with a [T, n_fft] index
    matrix (the naive formulation) makes XLA:TPU compile pathologically
    slowly at production lengths (30 s -> 6M constant indices).
    """
    if cfg.center:
        pad = cfg.n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=cfg.pad_mode)
    n = x.shape[-1]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    t = (n - n_fft) // hop + 1
    rows_per_frame = (n_fft - 1) // hop + 1
    total_rows = t + rows_per_frame - 1
    need = total_rows * hop
    if need > n:
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(0, need - n)]
        x = jnp.pad(x, pad_widths)
    batch = x.shape[:-1]
    xr = x[..., :need].reshape(*batch, total_rows, hop)
    parts = [xr[..., k:k + t, :] for k in range(rows_per_frame)]
    return jnp.concatenate(parts, axis=-1)[..., :n_fft]


def stft_real_imag(x: jnp.ndarray, cfg: STFTConfig):
    """[..., n_samples] -> (real, imag) each [..., T, n_freqs]."""
    frames = frame_signal(x, cfg)
    w_re, w_im = dft_matrices_ingraph(cfg.n_fft, cfg.win_length,
                                      dtype=frames.dtype)
    real = jnp.matmul(frames, w_re, precision=get_precision())
    imag = jnp.matmul(frames, w_im, precision=get_precision())
    return real, imag


def spectrogram(x: jnp.ndarray, cfg: STFTConfig, eps: float = 0.0) -> jnp.ndarray:
    """Magnitude spectrogram: clamp(re^2 + im^2, eps)^0.5
    (ref: fDomainHelper.py:77-79)."""
    real, imag = stft_real_imag(x, cfg)
    power = real * real + imag * imag
    if eps > 0.0:
        power = jnp.clip(power, min=eps)
    return jnp.sqrt(power)


def spectrogram_phase(x: jnp.ndarray, cfg: STFTConfig, eps: float = 1e-8):
    """(mag, cos, sin) per ref fDomainHelper.py:81-86. Note eps clamps the
    *power* before sqrt, matching the reference exactly."""
    real, imag = stft_real_imag(x, cfg)
    power = real * real + imag * imag
    mag = jnp.sqrt(jnp.clip(power, min=eps))
    return mag, real / mag, imag / mag


def wav_to_spectrogram_phase(x: jnp.ndarray, cfg: STFTConfig, eps: float = 1e-8):
    """[B, C, n_samples] -> (sp, cos, sin) each [B, C, T, n_freqs]
    (ref: fDomainHelper.py:88-110). Channels are batched, not looped."""
    return spectrogram_phase(x, cfg, eps=eps)


def spectrogram_to_wav(mag: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                       cfg: STFTConfig, length: int | None = None
                       ) -> jnp.ndarray:
    """(mag, cos, sin) [..., T, n_freqs] -> wav [..., n_samples], the inverse
    of spectrogram_phase (ref: fDomainHelper.py:112-130 `spectrogram_to_wav`,
    which feeds mag*cos / mag*sin to torchlibrosa ISTFT)."""
    return istft(mag * cos, mag * sin, cfg, length=length)


@functools.lru_cache(maxsize=8)
def idft_matrices(n_fft: int, win_length: int):
    """Inverse DFT matrices mapping [n_freqs] (real, imag) -> windowed time
    frame [n_fft] (numpy), matching librosa istft's per-frame irfft * window."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # [n_freqs, n_fft]
    # irfft: x[n] = (1/N) * sum_k c_k (re[k] cos + (-im_sign) ...) with
    # hermitian symmetry weights c_0 = c_{N/2} = 1, else 2.
    c = np.full((n_freqs, 1), 2.0)
    c[0] = 1.0
    c[-1] = 1.0
    w = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    m_re = (c * np.cos(ang) / n_fft * w[None, :]).astype(np.float32)
    # imag stored with np.fft sign (negative); ifft uses -imag * sin term:
    m_im = (-c * np.sin(ang) / n_fft * w[None, :]).astype(np.float32)
    return m_re, m_im


def idft_matrices_ingraph(n_fft: int, win_length: int, dtype=jnp.float32):
    """In-graph version of idft_matrices (same rationale and exact-mod
    angle reduction as dft_matrices_ingraph)."""
    n_freqs = n_fft // 2 + 1
    k = jax.lax.broadcasted_iota(jnp.int32, (n_freqs, n_fft), 0)
    n = jax.lax.broadcasted_iota(jnp.int32, (n_freqs, n_fft), 1)
    ang = ((k * n) % n_fft).astype(jnp.float32) * np.float32(
        2.0 * np.pi / n_fft)
    c = jnp.where((k == 0) | (k == n_freqs - 1), 1.0, 2.0)
    w = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    w = jnp.asarray((w / n_fft)[None, :], dtype=jnp.float32)
    m_re = (c * jnp.cos(ang) * w).astype(dtype)
    m_im = (-c * jnp.sin(ang) * w).astype(dtype)
    return m_re, m_im


def istft(real: jnp.ndarray, imag: jnp.ndarray, cfg: STFTConfig,
          length: int | None = None) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add, librosa semantics (center=True).

    real/imag: [..., T, n_freqs] in the np.fft sign convention used by
    stft_real_imag. Returns [..., n_samples].
    """
    m_re, m_im = idft_matrices_ingraph(cfg.n_fft, cfg.win_length,
                                       dtype=real.dtype)
    frames = (jnp.matmul(real, m_re, precision=get_precision())
              + jnp.matmul(imag, m_im, precision=get_precision()))
    t = frames.shape[-2]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    total = n_fft + hop * (t - 1)
    batch_shape = frames.shape[:-2]
    # Gather-free overlap-add: split each frame into hop-sized chunks and
    # shift-add them as whole rows (the scatter formulation compiles
    # pathologically slowly on XLA:TPU at production lengths).
    rows_per_frame = (n_fft - 1) // hop + 1
    width = rows_per_frame * hop
    fpad = jnp.pad(frames, [(0, 0)] * len(batch_shape)
                   + [(0, 0), (0, width - n_fft)])
    fr = fpad.reshape(batch_shape + (t, rows_per_frame, hop))
    total_rows = t + rows_per_frame - 1
    y = None
    for k in range(rows_per_frame):
        contrib = jnp.pad(fr[..., :, k, :], [(0, 0)] * len(batch_shape)
                          + [(k, total_rows - t - k), (0, 0)])
        y = contrib if y is None else y + contrib
    y = y.reshape(batch_shape + (total_rows * hop,))[..., :total]
    # Window-squared normalization, built IN-GRAPH (a [total] fp32 constant
    # is ~5 MB at production lengths — see dft_matrices_ingraph). The OLA of
    # shifted w^2 copies has closed form via a cumulative sum over the
    # hop-chunks of w^2: interior rows get the full sum, the first/last
    # rows_per_frame-1 rows get partial prefixes/suffixes.
    w = hann_window(cfg.win_length, dtype=np.float64)
    if cfg.win_length < n_fft:
        p = (n_fft - cfg.win_length) // 2
        w = np.pad(w, (p, n_fft - cfg.win_length - p))
    if t >= rows_per_frame:
        wr = jnp.asarray(np.pad(w * w, (0, width - n_fft)).reshape(
            rows_per_frame, hop), dtype=jnp.float32)
        csum = jnp.cumsum(wr, axis=0)          # prefix sums of w^2 chunks
        full = csum[-1:]
        wsq = jnp.concatenate([
            csum[: rows_per_frame - 1],
            jnp.tile(full, (t - rows_per_frame + 1, 1)),
            full - csum[: rows_per_frame - 1],
        ]).reshape(total_rows * hop)[:total]
    else:  # tiny signals: the host loop constant is small
        wsq_np = np.zeros(total)
        for ti in range(t):
            wsq_np[ti * hop: ti * hop + n_fft] += w * w
        wsq = jnp.asarray(wsq_np, dtype=jnp.float32)
    wsq = jnp.where(wsq > 1e-10, wsq, 1.0)
    y = y / wsq.astype(frames.dtype)
    if cfg.center:
        y = y[..., cfg.n_fft // 2: total - cfg.n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y
