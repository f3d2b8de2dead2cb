"""End-to-end restoration facade: wav -> analysis -> vocoder -> wav.

Reference: /root/reference/voicefixer/base.py:10-146 (VoiceFixer facade,
restore / restore_inmem, 30 s chunking, modes 0/1/2, mode-1 high-frequency
removal, energy cap, center trim).

TPU design: each 30 s chunk is one jitted program (analysis + vocoder fused
under a single jit); jit programs are cached per (chunk length, mode), so a
long file costs at most two compilations (full chunks + the shorter tail).
Mode 2 runs BatchNorm on batch statistics and live Dropout with an explicit
PRNG key — deterministic given a seed, unlike the reference's torch
`model.train()`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import DEFAULT_CONFIG, VoiceFixerConfig
from voicefixer_tpu.models import analysis
from voicefixer_tpu.ops import stft as vstft
from voicefixer_tpu.ops.norm import from_log
from voicefixer_tpu.pipeline import vocoder_facade

EPS = 1e-8


def remove_higher_frequency(wav: jnp.ndarray, cfg: VoiceFixerConfig,
                            pad_mode: str = "constant") -> jnp.ndarray:
    """Mode-1 preprocessing (base.py:87-104): zero all STFT bins above the
    0.95 cumulative-log-energy cutoff, then ISTFT.

    The reference uses librosa.stft/istft *defaults*: n_fft 2048, hop 512,
    win 2048, center=True; istft returns hop*(T-1) samples, i.e. slightly
    shorter than the input — the length change is intentional and mirrored
    here. The data-dependent cutoff bin is a cumsum+argmax mask, so the whole
    transform stays jittable.
    """
    scfg = dataclasses.replace(cfg.stft, hop_length=cfg.stft.n_fft // 4,
                               pad_mode=pad_mode)
    real, imag = vstft.stft_real_imag(wav[None], scfg)  # [1, T, F]
    mag = jnp.sqrt(real * real + imag * imag)
    cos, sin = real / (mag + EPS), imag / (mag + EPS)
    feature = jnp.log10(mag + EPS)
    feature = jnp.where(feature < 0, 0.0, feature)
    energy_level = jnp.sum(feature, axis=(0, 1))  # [F]
    threshold = jnp.sum(energy_level) * cfg.pipeline.hf_removal_ratio
    cum = jnp.cumsum(energy_level)
    cutoff = jnp.argmax(cum >= threshold)  # first bin reaching threshold
    keep = jnp.arange(mag.shape[-1]) < cutoff  # spec[cutoff:] = 0
    spec = mag * keep
    return vstft.istft(spec * cos, spec * sin, scfg)[0]


def _trim_center(est: np.ndarray, ref_len: int) -> np.ndarray:
    """Center-trim est's last axis to ref_len (base.py:63-76)."""
    diff = abs(est.shape[-1] - ref_len)
    if est.shape[-1] == ref_len:
        return est
    if est.shape[-1] > ref_len:
        if diff // 2 > 0:
            est = est[..., diff // 2: -(diff // 2)]
        return est[..., :ref_len]
    return est  # shorter than ref: reference trims ref instead; keep est


def restore_segment(analysis_params: dict, vocoder_params: dict,
                    wav: jnp.ndarray, cfg: VoiceFixerConfig,
                    training: bool = False, rng=None):
    """One chunk through both stages: wav [N] -> (wav_out [S], peak).

    Mirrors the base.py:123-133 body: _pre -> model -> from_log -> vocoder ->
    energy cap. Returns the pre-cap peak so the caller can emit the
    reference's warning.
    """
    _, mel_orig = analysis.wav_to_sp_mel(wav[None], cfg)
    out = analysis.apply(analysis_params, mel_orig, cfg,
                         training=training, rng=rng)
    denoised_mel = from_log(out["mel"])
    wav_out = vocoder_facade.synthesize(vocoder_params, denoised_mel,
                                        cfg.vocoder)[..., 0]  # [1, S]
    peak = jnp.max(jnp.abs(wav_out))
    wav_out = jnp.where(peak > 1.0, wav_out / peak, wav_out)
    return wav_out[0], peak


class VoiceFixer:
    """Public restoration API mirroring the reference `VoiceFixer()`
    (base.py:10-146)."""

    def __init__(self, ckpt: str | None = None,
                 vocoder_ckpt: str | None = None,
                 params: dict | None = None,
                 vocoder_params: dict | None = None,
                 config: VoiceFixerConfig = DEFAULT_CONFIG,
                 download: bool = True):
        self.config = config
        if params is None or vocoder_params is None:
            from voicefixer_tpu.pipeline import checkpoints
            if params is None:
                params = checkpoints.load_analysis_params(
                    ckpt, download=download)
            if vocoder_params is None:
                vocoder_params = checkpoints.load_vocoder_params(
                    vocoder_ckpt, download=download)
        self.params = params
        self.vocoder_params = vocoder_params
        self._jit_segment = jax.jit(
            partial(restore_segment, cfg=config),
            static_argnames=("training",))
        self._jit_mel = jax.jit(
            partial(analysis.restore_mel, cfg=config),
            static_argnames=("training",))
        self._jit_hf = jax.jit(partial(remove_higher_frequency, cfg=config))

    @classmethod
    def random(cls, seed: int = 0,
               config: VoiceFixerConfig = DEFAULT_CONFIG) -> "VoiceFixer":
        """Randomly initialized pipeline (tests/benchmarks in zero-egress
        environments)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        from voicefixer_tpu.models import vocoder as vocoder_model
        return cls(params=analysis.init(k1, config),
                   vocoder_params=vocoder_model.init(k2, config.vocoder),
                   config=config)

    # ------------------------------------------------------------- pipeline

    def restore_inmem(self, wav_10k: np.ndarray, cuda: bool = False,
                      mode: int = 0, your_vocoder_func=None,
                      seed: int = 0) -> np.ndarray:
        """wav [N] at 44.1 kHz -> restored wav [N] (base.py:106-139).

        mode 0: eval. mode 1: eval + high-frequency removal preprocessing.
        mode 2: BN batch-stats + live dropout (stochastic in the reference;
        here deterministic given `seed`). `cuda` is accepted for API
        compatibility and ignored (JAX owns placement).
        """
        if mode not in (0, 1, 2):
            raise ValueError(f"mode must be 0, 1, or 2, got {mode}")
        wav_10k = np.asarray(wav_10k, dtype=np.float32).reshape(-1)
        training = mode == 2
        rng = jax.random.PRNGKey(seed) if training else None

        res = []
        seg_length = self.config.pipeline.seg_length
        break_point = seg_length
        while break_point < wav_10k.shape[0] + seg_length:
            segment = wav_10k[break_point - seg_length: break_point]
            seg = jnp.asarray(segment)
            if mode == 1:
                seg = self._jit_hf(seg)
            # mode 1 reassigns `segment` before the trim in the reference
            # (base.py:121-135), so trim targets the post-ISTFT length.
            seg_len = seg.shape[0]
            if training:
                rng, step_rng = jax.random.split(rng)
            else:
                step_rng = None
            if your_vocoder_func is None:
                out, peak = self._jit_segment(
                    self.params, self.vocoder_params, seg,
                    training=training, rng=step_rng)
                if float(peak) > 1.0:
                    print("Warning: Exceed energy limit,", float(peak))
            else:
                mel_log = self._jit_mel(self.params, seg[None],
                                        training=training, rng=step_rng)
                # reference hands the vocoder func a [B, 1, T, 128] linear
                # mel (base.py:125-129)
                denoised = from_log(mel_log)[:, None]
                out = np.asarray(your_vocoder_func(denoised)).reshape(-1)
            out = _trim_center(np.asarray(out), seg_len)
            res.append(out)
            break_point += seg_length
        return np.concatenate(res, axis=-1)

    def restore(self, input: str, output: str, cuda: bool = False,
                mode: int = 0, your_vocoder_func=None, seed: int = 0):
        """File-to-file restore (base.py:141-146)."""
        from voicefixer_tpu.utils import audio_io
        wav_10k = audio_io.load_wav(input,
                                    sample_rate=self.config.pipeline.sample_rate)
        out = self.restore_inmem(wav_10k, cuda=cuda, mode=mode,
                                 your_vocoder_func=your_vocoder_func,
                                 seed=seed)
        audio_io.save_wave(out, fname=output,
                           sample_rate=self.config.pipeline.sample_rate)
