"""Analysis-stage training losses.

The reference ships only *vestigial* training code that cannot run (its
`training_step` references `self.discriminator`, `self.l1loss` and an
undefined augmentation helper — /root/reference/voicefixer/restorer/
model.py:494-644; SURVEY.md 2.2). The runnable subset of its generator
objective (model.py:538-556) is two L1 terms:

- targ_loss: L1 between the denoiser's masked *linear* mel and the clean
  target mel (the mask-supervision term, model.py:545-549);
- mel_loss:  L1 between the restored log-mel and the log clean target mel
  (model.py:550-556).

GAN terms (D after step 16k/18k, model.py:579-644) need the discriminator
checkpoint that the reference repo does not contain; they are out of scope
for the numerical acceptance path and can be added as a third term later.
"""

from __future__ import annotations

import jax.numpy as jnp

from voicefixer_tpu.config import VoiceFixerConfig
from voicefixer_tpu.models import analysis
from voicefixer_tpu.ops.norm import to_log


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def analysis_loss(params: dict, wav_noisy: jnp.ndarray,
                  wav_clean: jnp.ndarray, cfg: VoiceFixerConfig,
                  rng=None, targ_weight: float = 1.0,
                  mel_weight: float = 1.0):
    """Training loss for the analysis stage.

    wav_noisy/wav_clean: [B, N] paired 44.1 kHz waveforms.
    Returns (total_loss, metrics dict).
    """
    _, mel_noisy = analysis.wav_to_sp_mel(wav_noisy, cfg)
    _, mel_clean = analysis.wav_to_sp_mel(wav_clean, cfg)
    out = analysis.apply(params, mel_noisy, cfg, training=True, rng=rng)
    targ_loss = l1(out["clean"], mel_clean)
    mel_loss = l1(out["mel"], to_log(mel_clean))
    total = targ_weight * targ_loss + mel_weight * mel_loss
    return total, {"loss": total, "targ_loss": targ_loss,
                   "mel_loss": mel_loss}
