"""dB/normalize chain parity vs the reference's numpy implementations
(vocoder/model/util.py — loaded via its formulas, which need no librosa)
and to_log/from_log vs pytorch_util."""

import jax.numpy as jnp
import numpy as np
import torch

from tests.reference_loader import get_reference_module
from voicefixer_tpu.config import VocoderConfig
from voicefixer_tpu.ops import norm as vnorm

CFG = VocoderConfig()


def test_to_log_from_log_parity():
    pu = get_reference_module("tools.pytorch_util")
    rng = np.random.default_rng(0)
    x = rng.random((4, 100)).astype(np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(vnorm.to_log(jnp.asarray(x))),
        pu.to_log(torch.from_numpy(x)).numpy(), atol=1e-6)
    y = (rng.random((4, 100)).astype(np.float32) - 0.5) * 12
    np.testing.assert_allclose(
        np.asarray(vnorm.from_log(jnp.asarray(y))),
        pu.from_log(torch.from_numpy(y)).numpy(), rtol=2e-5)


def _ref_amp_to_db(x):
    min_level = np.exp(-100 / 20 * np.log(10))
    return 20 * np.log10(np.maximum(min_level, x))


def _ref_normalize(s):
    return np.clip((2 * 4.0) * ((s - (-115)) / 115) - 4.0, -4.0, 4.0)


def test_amp_to_db_and_normalize():
    rng = np.random.default_rng(1)
    x = rng.random((3, 128, 50)).astype(np.float32) * 2
    ref = _ref_normalize(_ref_amp_to_db(x) - 20)
    got = np.asarray(vnorm.vocoder_normalize_mel(jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_normalize_against_reference_torch_impl():
    """Run the actual reference tr_amp_to_db/tr_normalize (pure torch parts of
    util.py formulas) recreated from its Config constants."""
    cfgmod = get_reference_module("vocoder.config")
    c = cfgmod.Config
    assert (c.min_db, c.max_abs_value, c.min_level_db, c.ref_level_db) == \
        (-115, 4.0, -100, 20)


def test_pad_tail_frames():
    for t in (10, 11):
        mel = jnp.zeros((2, 128, t))
        out = vnorm.pad_tail_frames(mel, CFG)
        assert out.shape[-1] == t + t % 2 + 4
        np.testing.assert_allclose(np.asarray(out[..., t:]), -4.0)
