"""Frozen configuration dataclasses for the TPU-native VoiceFixer framework.

The reference keeps its hyperparameters in a mutable class-attribute singleton
(`/root/reference/voicefixer/vocoder/config.py:7-316`) plus hard-coded
``if sample_rate == 44100`` branches (`/root/reference/voicefixer/restorer/model.py:142-157`).
Here everything is resolved once into immutable dataclasses so that model-building
code is pure and jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Analysis-stage STFT settings (ref: restorer/model.py:142-145)."""

    n_fft: int = 2048
    hop_length: int = 441
    win_length: int = 2048
    center: bool = True
    pad_mode: str = "reflect"
    window: str = "hann"
    # magnitude floor used by wav_to_spectrogram_phase (ref: fDomainHelper.py:88)
    mag_eps: float = 1e-8

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Mel filterbank settings.

    The analysis stage uses torchaudio-style fbanks: htk scale, norm=None
    (ref: restorer/model.py:203 -> tools/mel_scale.py:52-77).
    The vocoder oracle path uses librosa-style fbanks: htk scale, slaney area
    norm (ref: vocoder/model/util.py:115-123).
    """

    n_mels: int = 128
    sample_rate: int = 44100
    f_min: float = 0.0
    f_max: float = 22050.0
    n_stft: int = 1025


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Mel-domain mask net (ref: restorer/model.py:69-99)."""

    n_mel: int = 128
    dropout: float = 0.5
    gru_layers: int = 2
    # two stacked BN_GRU blocks, each bidirectional with hidden = 2*n_mel
    num_gru_blocks: int = 2
    # width unit: fc1 -> base_width, fc4 -> 2*base_width, GRU hidden =
    # base_width (reference: 2*n_mel = 256, restorer/model.py:69-99)
    base_width: int = 256


@dataclasses.dataclass(frozen=True)
class ResUNetConfig:
    """6-enc/6-dec residual U-Net (ref: restorer/model_kqq_bn.py:6-125)."""

    in_channels: int = 2
    encoder_channels: Tuple[int, ...] = (32, 64, 128, 256, 384, 384)
    center_channels: int = 384
    # ConvBlockRes per encoder/decoder stage (reference hard-codes 4:
    # modules.py:68-76,149-157); configurable here so scaled-down variants
    # keep the exact reference topology.
    blocks_per_stage: int = 4
    bn_momentum: float = 0.01
    bn_eps: float = 1e-5
    leaky_slope: float = 0.01

    @property
    def levels(self) -> int:
        return len(self.encoder_channels)

    @property
    def downsample_ratio(self) -> int:
        return 2 ** self.levels  # 64 at the reference depth of 6


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """TFGAN-style 441x upsampling generator (ref: vocoder/config.py:10-27,
    vocoder/model/generator.py:12-125)."""

    in_channels: int = 128
    cond_channels: int = 512
    channels: int = 1024
    upsample_scales: Tuple[int, ...] = (7, 7, 3, 3)
    resstack_depth: Tuple[int, ...] = (8, 8, 8, 8)
    resstack_kernel: Tuple[int, ...] = (3, 3, 3, 3)
    out_channels: int = 1
    leaky_slope_act: float = 0.2  # between stages (generator.py:68)
    leaky_slope_res: float = 0.01  # inside ResStack (nn.LeakyReLU() default)
    # dB / normalization constants (vocoder/config.py:48,63,66,67)
    min_db: float = -115.0
    max_abs_value: float = 4.0
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    num_mels: int = 128
    sample_rate: int = 44100
    hop_length: int = 441

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_scales))


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end restore pipeline (ref: base.py:106-146)."""

    sample_rate: int = 44100
    seg_length_seconds: int = 30
    # mode-1 preprocessing cumulative-energy cutoff (ref: base.py:87)
    hf_removal_ratio: float = 0.95
    # XLA programs specialize on shape: without padding, every distinct
    # file/tail length compiles its own pipeline program (~60 s cold).
    # With this on (eval modes only), short/tail chunks are zero-padded to
    # seg_length so ONE cached program serves every input length; outputs
    # are trimmed back, so lengths are unchanged. Costs one full chunk of
    # device compute (~ms) per tail; off = reference-exact short-chunk
    # programs.
    pad_short_to_seg: bool = True

    @property
    def seg_length(self) -> int:
        return self.sample_rate * self.seg_length_seconds


def mel_weight_curve(n_mels: int = 128,
                     a: float = 18.8927416350036,
                     b: float = 0.0269863588184314,
                     percent: float = 1.0) -> np.ndarray:
    """Fitted exponential mel-weight curve used to convert the analysis stage's
    unnormalized torchaudio mel into the vocoder's librosa-normalized mel
    convention (ref: vocoder/config.py:300-316, used at vocoder/base.py:20-22,52).
    """
    x = np.linspace(1, n_mels, num=n_mels)
    return (a * np.exp(percent * b * x)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class VoiceFixerConfig:
    """Top-level bundle for the two-stage pipeline at 44.1 kHz."""

    stft: STFTConfig = dataclasses.field(default_factory=STFTConfig)
    mel: MelConfig = dataclasses.field(default_factory=MelConfig)
    denoiser: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)
    unet: ResUNetConfig = dataclasses.field(default_factory=ResUNetConfig)
    vocoder: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)


DEFAULT_CONFIG = VoiceFixerConfig()


def small_tp_config() -> VoiceFixerConfig:
    """Small config whose channel widths are wide enough (>= 64) for the
    "model" mesh axis to actually shard kernels (parallel.sharding's
    min_channels) — used by the TP inference parity tests and the multichip
    dryrun. NOT numerically related to the reference checkpoints."""
    return VoiceFixerConfig(
        denoiser=DenoiserConfig(base_width=64),
        unet=ResUNetConfig(encoder_channels=(16, 64), blocks_per_stage=1,
                           center_channels=64),
        vocoder=VocoderConfig(cond_channels=64, channels=256),
        pipeline=PipelineConfig(seg_length_seconds=1),
    )


def tiny_test_config() -> VoiceFixerConfig:
    """Scaled-down config (same structure, tiny channels) for fast jit in
    tests, CPU-mesh dry runs, and CI — NOT numerically related to the
    reference checkpoints."""
    return VoiceFixerConfig(
        denoiser=DenoiserConfig(base_width=64),
        unet=ResUNetConfig(encoder_channels=(4, 8), blocks_per_stage=1,
                           center_channels=8),
        vocoder=VocoderConfig(cond_channels=16, channels=32),
        pipeline=PipelineConfig(seg_length_seconds=1),
    )
