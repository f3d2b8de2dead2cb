"""Training-time waveform augmentation.

The reference's augmentation helpers are vestigial: `tools/random_.py:7-52`
defines torch RNG utilities, and the training step calls
`add_noise_and_scale_with_HQ_with_Aug` which is NOT defined anywhere in the
repo (restorer/model.py:458 — dead code, SURVEY.md 2.2). This module provides
a runnable JAX equivalent of the intent: random gain scaling and additive
noise mixing with explicit PRNG keys (pure, jit/vmap-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(key, low: float, high: float, shape=()):
    """tools/random_.py:20-24 equivalent with an explicit key."""
    return jax.random.uniform(key, shape, minval=low, maxval=high)


def random_gain(key, wav: jnp.ndarray, low_db: float = -12.0,
                high_db: float = 6.0) -> jnp.ndarray:
    """Per-utterance random gain in dB. wav: [B, N]."""
    db = uniform(key, low_db, high_db, (wav.shape[0], 1))
    return wav * 10.0 ** (db / 20.0)


def add_noise_and_scale(key, clean: jnp.ndarray, noise: jnp.ndarray,
                        snr_low_db: float = 0.0,
                        snr_high_db: float = 30.0):
    """Mix noise into clean at a random per-utterance SNR, then apply a
    shared random gain. Returns (noisy, clean_scaled) — the paired training
    input for train.losses.analysis_loss.
    """
    k_snr, k_gain = jax.random.split(key)
    eps = 1e-8
    rms_c = jnp.sqrt(jnp.mean(clean ** 2, axis=-1, keepdims=True)) + eps
    rms_n = jnp.sqrt(jnp.mean(noise ** 2, axis=-1, keepdims=True)) + eps
    snr = uniform(k_snr, snr_low_db, snr_high_db, (clean.shape[0], 1))
    scale_n = rms_c / rms_n / 10.0 ** (snr / 20.0)
    noisy = clean + noise * scale_n
    gain = 10.0 ** (uniform(k_gain, -12.0, 6.0, (clean.shape[0], 1)) / 20.0)
    return noisy * gain, clean * gain
