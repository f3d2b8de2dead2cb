"""Analysis stage: wav -> STFT magnitude -> mel -> denoiser mask -> ResUNet
-> restored log-mel.

Reference: /root/reference/voicefixer/restorer/model.py:103-120 (Generator
forward), base.py:78-85 (_pre), model.py:192-203 (frontend construction).

The whole stage is one jittable function; the STFT is a GEMM (ops.stft), the
mel projection a second GEMM fused by XLA, the denoiser a masked multiply in
linear mel, and the U-Net a conv stack. Everything is static-shape for a
fixed chunk length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voicefixer_tpu.config import VoiceFixerConfig
from voicefixer_tpu.models import denoiser as dn
from voicefixer_tpu.models import resunet
from voicefixer_tpu.ops import mel as vmel
from voicefixer_tpu.ops import stft as vstft
from voicefixer_tpu.ops.norm import to_log
from voicefixer_tpu.ops.precision import get_precision


def wav_to_sp_mel(wav: jnp.ndarray, cfg: VoiceFixerConfig):
    """wav: [B, N] -> (sp [B, T, 1025], mel [B, T, 128]).

    Matches base.py:78-85: sp = |STFT| with power floor 1e-8, mel = sp @ fb
    (torchaudio htk fbanks, norm=None).
    """
    sp = vstft.spectrogram(wav, cfg.stft, eps=cfg.stft.mag_eps)
    fb = jnp.asarray(vmel.melscale_fbanks(
        cfg.mel.n_stft, cfg.mel.f_min, cfg.mel.f_max, cfg.mel.n_mels,
        cfg.mel.sample_rate, norm=None), dtype=sp.dtype)
    mel = jnp.matmul(sp, fb, precision=get_precision())
    return sp, mel


def wav_to_mel(wav: jnp.ndarray, cfg: VoiceFixerConfig) -> jnp.ndarray:
    """Inference hot path: wav [B, N] -> mel [B, T, 128] without ever
    materializing the [B, T, 1025] spectrogram (the restore pipeline never
    uses sp — base.py:123-125 passes only the mel onward). Dispatches to the
    fused Pallas STFT->mag->mel kernel on TPU; training uses wav_to_sp_mel
    (differentiable jax path)."""
    fb = jnp.asarray(vmel.melscale_fbanks(
        cfg.mel.n_stft, cfg.mel.f_min, cfg.mel.f_max, cfg.mel.n_mels,
        cfg.mel.sample_rate, norm=None), dtype=wav.dtype)
    from voicefixer_tpu import kernels
    if (kernels.use("stft") and cfg.stft.n_fft % 128 == 0
            and cfg.mel.n_mels % 128 == 0):
        from voicefixer_tpu.kernels.stft import stft_mel
        return stft_mel(wav, fb, cfg.stft)
    sp = vstft.spectrogram(wav, cfg.stft, eps=cfg.stft.mag_eps)
    return jnp.matmul(sp, fb, precision=get_precision())


def apply(params: dict, mel_orig: jnp.ndarray, cfg: VoiceFixerConfig,
          training: bool = False, rng=None) -> dict:
    """Generator.forward (model.py:103-120). mel_orig: [B, T, 128] linear mel.

    Returns dict with 'mel' (restored log10-mel, [B, T, 128]), 'clean'
    (masked linear mel), 'unet_out'.
    """
    from voicefixer_tpu.parallel.tp import replicate_model
    mask = dn.apply(params["denoiser"], mel_orig, cfg.denoiser,
                    training=training, rng=rng)
    clean = mask * mel_orig
    x = to_log(clean)
    unet_in = jnp.stack([to_log(mel_orig), x], axis=-1)  # [B, T, 128, 2]
    # the mel axis is SPATIAL for the U-Net (freq convs/pools) — never let a
    # model-axis sharding ride in on it (parallel.tp.replicate_model)
    unet_in = replicate_model(unet_in)
    unet_out = resunet.apply(params["unet"], unet_in, cfg.unet,
                             training=training)[..., 0]  # [B, T, 128]
    return {"mel": unet_out + x, "clean": clean, "unet_out": unet_out}


def restore_mel(params: dict, wav: jnp.ndarray, cfg: VoiceFixerConfig,
                training: bool = False, rng=None) -> jnp.ndarray:
    """wav [B, N] -> restored log10 mel [B, T, 128] (analysis stage only)."""
    mel_orig = wav_to_mel(wav, cfg)
    return apply(params, mel_orig, cfg, training=training, rng=rng)["mel"]


def init(key, cfg: VoiceFixerConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"denoiser": dn.init(k1, cfg.denoiser, dtype),
            "unet": resunet.init(k2, cfg.unet, dtype)}
