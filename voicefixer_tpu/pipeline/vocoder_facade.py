"""Synthesis-stage facade: mel -> 44.1 kHz waveform.

Reference: /root/reference/voicefixer/vocoder/base.py:10-77 (Vocoder.forward
and Vocoder.oracle). The facade owns the vocoder params and a jit cache keyed
by mel length; the whole normalize + generator chain is one jitted function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import (DEFAULT_CONFIG, VocoderConfig,
                                   VoiceFixerConfig, mel_weight_curve)
from voicefixer_tpu.models import vocoder as vocoder_model
from voicefixer_tpu.ops import mel as vmel
from voicefixer_tpu.ops import stft as vstft
from voicefixer_tpu.ops.norm import vocoder_normalize_mel
from voicefixer_tpu.ops.precision import get_precision


def pad_tail(mel_btc: jnp.ndarray, pad_value: float) -> jnp.ndarray:
    """Append T%2 + 4 frames of `pad_value` along time ([B, T, C] layout;
    ref: vocoder/model/util.py:69-80)."""
    t = mel_btc.shape[1]
    pad = t % 2 + 4
    return jnp.pad(mel_btc, ((0, 0), (0, pad), (0, 0)),
                   constant_values=pad_value)


def synthesize(params: dict, mel: jnp.ndarray, cfg: VocoderConfig,
               divide_weight: bool = True) -> jnp.ndarray:
    """Full Vocoder.forward chain (vocoder/base.py:42-56): mel [B, T, 128]
    *linear, analysis-convention* -> wav [B, S, 1].

    divide_weight=False skips the mel-weight bridge for mels that are already
    in the vocoder's librosa convention (the oracle path, vocoder/base.py:70-73
    applies no weight division).
    """
    if divide_weight:
        w = jnp.asarray(mel_weight_curve(cfg.num_mels), dtype=mel.dtype)
        mel = mel / w
    mel = vocoder_normalize_mel(mel, cfg)
    mel = pad_tail(mel, -cfg.max_abs_value)
    return vocoder_model.apply(params, mel, cfg)


class Vocoder:
    """Public synthesis API mirroring the reference `Vocoder(sample_rate)`
    (vocoder/base.py:11-22). Only 44100 Hz is supported, as in the reference
    (vocoder/config.py:28-31)."""

    def __init__(self, sample_rate: int = 44100, ckpt: str | None = None,
                 params: dict | None = None,
                 config: VoiceFixerConfig = DEFAULT_CONFIG,
                 download: bool = True):
        if sample_rate != 44100:
            raise RuntimeError("Error: VoiceFixer only supports 44100 sample"
                               " rate at present (as does the reference).")
        self.rate = sample_rate
        self.config = config
        if params is None:
            from voicefixer_tpu.pipeline import checkpoints
            params = checkpoints.load_vocoder_params(ckpt, download=download)
        self.params = params
        self._jit_synth = jax.jit(
            synthesize, static_argnames=("cfg", "divide_weight"))

    @classmethod
    def random(cls, seed: int = 0,
               config: VoiceFixerConfig = DEFAULT_CONFIG) -> "Vocoder":
        """Randomly initialized vocoder (tests/benchmarks in zero-egress
        environments)."""
        params = vocoder_model.init(jax.random.PRNGKey(seed), config.vocoder)
        return cls(params=params, config=config)

    def forward(self, mel, cuda: bool = False) -> np.ndarray:
        """mel: non-normalized analysis-convention mel, [B, 1, T, 128] (the
        reference's documented layout, vocoder/base.py:44-47) or [B, T, 128].
        Returns wav [B, 1, S] to match the reference contract. `cuda` is
        accepted for API compatibility and ignored (JAX owns placement)."""
        mel = jnp.asarray(mel)
        if mel.ndim == 4:  # [B, 1, T, 128]
            mel = mel[:, 0]
        if mel.shape[-1] != self.config.vocoder.num_mels:
            raise ValueError(f"expected {self.config.vocoder.num_mels} mel "
                             f"bins, got {mel.shape[-1]}")
        wav = self._jit_synth(self.params, mel, self.config.vocoder)
        return np.asarray(wav)[..., 0][:, None, :]  # [B, 1, S]

    __call__ = forward

    def oracle(self, fpath: str, out_path: str, cuda: bool = False,
               pad_mode: str = "constant") -> np.ndarray:
        """Copy-synthesis golden path (vocoder/base.py:58-77): wav -> peak
        normalize -> |STFT| (librosa defaults: n_fft 2048, hop 441, win 2048,
        center) -> librosa htk/slaney mel -> dB normalize -> generator -> wav.

        pad_mode: librosa.stft's center pad mode — 'constant' for librosa
        >=0.10 (what a fresh reference install uses today), 'reflect' for the
        older releases the golden fixtures were generated with.
        """
        from voicefixer_tpu.utils import audio_io
        wav = audio_io.read_wave(fpath, sample_rate=self.rate)[..., 0]
        wav = wav / np.max(np.abs(wav))

        scfg = dataclasses.replace(self.config.stft, pad_mode=pad_mode)
        sp = vstft.spectrogram(jnp.asarray(wav)[None], scfg)  # [1, T, 1025]
        basis = jnp.asarray(vmel.librosa_mel_basis(
            scfg.n_fft, self.config.vocoder.num_mels, self.rate))
        mel = jnp.matmul(sp, basis.T,
                         precision=get_precision())  # [1, T, 128]
        wav_re = self._jit_synth(self.params, mel, self.config.vocoder,
                                 divide_weight=False)
        out = np.asarray(wav_re)[..., 0]  # [1, S]
        if out_path is not None:
            audio_io.save_wave(out[0] * 2 ** 15, out_path,
                               sample_rate=self.rate)
        return out
