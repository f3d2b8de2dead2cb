"""Log-domain transforms and the vocoder dB/normalize chain.

References:
- to_log / from_log: /root/reference/voicefixer/tools/pytorch_util.py:18-27
- amp_to_db (floor -100 dB) + symmetric +-4 normalize over -115 dB:
  /root/reference/voicefixer/vocoder/model/util.py:8-66
- tail padding with -4 frames: util.py:69-94
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import VocoderConfig

_LOG10 = float(np.log(10.0))


def to_log(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """log10(clip(x, min=eps)) (ref: pytorch_util.py:18-22)."""
    return jnp.log(jnp.clip(x, min=eps)) / _LOG10


def from_log(x: jnp.ndarray, max_value: float = 5.0) -> jnp.ndarray:
    """10**clip(x, max=5) (ref: pytorch_util.py:25-27)."""
    return jnp.exp(jnp.clip(x, max=max_value) * _LOG10)


def amp_to_db(x: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    """20*log10(max(min_level, x)) with min_level = 10^(min_level_db/20) = 1e-5
    (ref: util.py:33-36)."""
    min_level = float(np.exp(cfg.min_level_db / 20.0 * _LOG10))
    return 20.0 * jnp.log(jnp.maximum(min_level, x)) / _LOG10


def db_normalize(s: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    """Symmetric clip-normalize to +-max_abs_value over min_db range
    (ref: util.py:8-22 with allow_clipping+symmetric, the executed branch)."""
    m = cfg.max_abs_value
    return jnp.clip((2.0 * m) * ((s - cfg.min_db) / (-cfg.min_db)) - m, -m, m)


def vocoder_normalize_mel(mel: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    """Full chain applied in Vocoder.forward after the mel-weight division:
    tr_normalize(tr_amp_to_db(|mel|) - ref_level_db)
    (ref: vocoder/base.py:53)."""
    return db_normalize(amp_to_db(jnp.abs(mel), cfg) - cfg.ref_level_db, cfg)


def pad_tail_frames(mel_bct: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    """Append T%2 + 4 frames of constant -4.0 along time
    (ref: util.py:69-80; mel layout [B, n_mels, T])."""
    t = mel_bct.shape[-1]
    pad_tail = t % 2 + 4
    pad = jnp.full(mel_bct.shape[:-1] + (pad_tail,), -cfg.max_abs_value,
                   dtype=mel_bct.dtype)
    return jnp.concatenate([mel_bct, pad], axis=-1)
