"""Fused windowed-DFT -> magnitude -> mel kernel.

Reference semantics: torchlibrosa frozen-conv DFT + torchaudio MelScale
(/root/reference/voicefixer/tools/modules/fDomainHelper.py:77-110,
/root/reference/voicefixer/tools/mel_scale.py:63-77): center reflect pad,
periodic hann folded into the DFT matrix, sp = clamp(re^2+im^2, 1e-8)^0.5,
mel = sp @ fb.

The jax path (ops.stft.spectrogram + matmul) materializes the [T, 1025]
magnitude spectrogram in HBM between the DFT and mel GEMMs, and the
magnitude's sqrt breaks XLA's fusion of the two. This kernel consumes the
framed signal (XLA's gather-free overlapping-frame view — cheap,
bandwidth-bound) in [TF, n_fft] tiles, runs the windowed-DFT matmuls one
128-bin block at a time, and accumulates the mel projection in VMEM across
the frequency grid — only the [T, n_mels] result hits HBM. (In-kernel
framing via lane-offset loads is rejected by Mosaic: hop=441 offsets are
not provably 128-aligned.)

Frequency axis is zero-padded 1025 -> 1152 (9 lanes of 128); the padded DFT
columns produce mag = sqrt(1e-8) = 1e-4 which the zero-padded fbank rows
annihilate, so the mel output is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voicefixer_tpu.config import STFTConfig
from voicefixer_tpu.ops import stft as vstft

F_BLK = 128


def _dft_mel_kernel(frames_ref, wre_ref, wim_ref, fb_ref, out_ref, *,
                    mag_eps: float):
    c = pl.program_id(2)
    # HIGHEST: fp32 DFT/mel matmuls would silently truncate to one bf16
    # MXU pass under the default dot precision
    prec = jax.lax.Precision.HIGHEST
    frames = frames_ref[0]
    re = jnp.dot(frames, wre_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    im = jnp.dot(frames, wim_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    mag = jnp.sqrt(jnp.maximum(re * re + im * im, mag_eps))
    partial = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)

    @pl.when(c == 0)
    def _():
        out_ref[0] = partial

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + partial


@functools.partial(jax.jit, static_argnames=("cfg", "t_tile", "interpret"))
def stft_mel(wav: jnp.ndarray, fb: jnp.ndarray, cfg: STFTConfig,
             t_tile: int = 256, interpret: bool = False) -> jnp.ndarray:
    """wav: [B, N] -> mel [B, T, n_mels] where T = N//hop + 1 (center) and
    mel = clamp(|STFT|^2, mag_eps)^0.5 @ fb. fb: [n_freqs, n_mels]."""
    bsz, _ = wav.shape
    n_fft = cfg.n_fft
    n_freqs = n_fft // 2 + 1
    n_mels = fb.shape[1]

    frames = vstft.frame_signal(wav, cfg)  # [B, T, n_fft]
    t_total = frames.shape[1]
    t_tile = min(t_tile, max(8, t_total))
    t_tile = -(-t_tile // 8) * 8
    n_blk = pl.cdiv(t_total, t_tile)
    t_pad = n_blk * t_tile
    if t_pad != t_total:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - t_total), (0, 0)))

    f_pad = pl.cdiv(n_freqs, F_BLK) * F_BLK
    # in-graph DFT matrices: baking them as fp32 constants (~17 MB) blows
    # the remote-compile upload limit and the persistent cache (ops/stft.py
    # dft_matrices_ingraph docstring)
    w_re, w_im = vstft.dft_matrices_ingraph(n_fft, cfg.win_length)
    w_re = jnp.pad(w_re, ((0, 0), (0, f_pad - n_freqs)))
    w_im = jnp.pad(w_im, ((0, 0), (0, f_pad - n_freqs)))
    fb_p = jnp.concatenate(
        [jnp.asarray(fb, jnp.float32),
         jnp.zeros((f_pad - n_freqs, n_mels), jnp.float32)], axis=0)
    n_fb = f_pad // F_BLK

    kernel = functools.partial(_dft_mel_kernel, mag_eps=cfg.mag_eps)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk, n_fb),
        in_specs=[
            pl.BlockSpec((1, t_tile, n_fft), lambda i, j, c: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, F_BLK), lambda i, j, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, F_BLK), lambda i, j, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_BLK, n_mels), lambda i, j, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, n_mels), lambda i, j, c: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, w_re, w_im, fb_p)
    return out[:, :t_total, :]
