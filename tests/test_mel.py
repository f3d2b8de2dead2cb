"""Mel filterbank parity vs the reference's own torch implementation
(tools/mel_scale.py, pure torch — loaded standalone) and internal
cross-checks of the librosa-convention basis and the mel weight bridge."""

import numpy as np
import torch

from tests.reference_loader import get_reference_module
from voicefixer_tpu.config import mel_weight_curve
from voicefixer_tpu.ops import mel as vmel


def test_fbanks_match_reference_torchaudio_style():
    ref = get_reference_module("tools.mel_scale")
    fb_ref = ref.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100,
                                 norm=None, mel_scale="htk").numpy()
    fb = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm=None)
    np.testing.assert_allclose(fb, fb_ref, atol=2e-5)


def test_melscale_forward_parity():
    ref = get_reference_module("tools.mel_scale")
    m = ref.MelScale(n_mels=128, sample_rate=44100, n_stft=1025)
    rng = np.random.default_rng(0)
    sp = rng.random((1, 1, 1025, 50)).astype(np.float32)  # (..., freq, time)
    out_ref = m(torch.from_numpy(sp)).numpy()  # (..., n_mels, time)
    fb = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm=None)
    out = np.matmul(sp.transpose(0, 1, 3, 2), fb).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(out, out_ref, atol=1e-4)


def test_slaney_norm_relation():
    """librosa basis == torchaudio basis^T * enorm; verify via the analytic
    enorm = 2/(f_pts[m+2]-f_pts[m])."""
    fb_none = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm=None)
    fb_sl = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm="slaney")
    ratio = fb_sl[fb_none > 0] / fb_none[fb_none > 0]
    # each mel column scaled by a constant
    fbn = np.where(fb_none > 0, fb_none, np.nan)
    col_ratio = np.nanmean(np.where(fb_none > 0, fb_sl / fbn, np.nan), axis=0)
    assert np.all(np.isfinite(col_ratio))
    np.testing.assert_allclose(
        fb_sl, fb_none * col_ratio[None, :], rtol=1e-4)
    assert ratio.min() > 0


def test_mel_weight_curve_matches_reference_table():
    """The fitted exponential matches the exact table to <=1e-5 relative
    (SURVEY.md 2.3 step 8; ref vocoder/config.py:160-316)."""
    ref = get_reference_module("vocoder.config")
    table = ref.Config.mel_weight_torch.numpy()
    curve = mel_weight_curve(128)
    np.testing.assert_allclose(curve, table, rtol=1e-5)


def test_mel_weight_is_torchaudio_to_librosa_bridge():
    """weight[m] ~= 1/enorm[m] = (f_pts[m+2]-f_pts[m])/2, i.e. dividing the
    unnormalized mel by it reproduces the slaney-area-normalized mel."""
    fb_none = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm=None)
    fb_sl = vmel.melscale_fbanks(1025, 0.0, 22050.0, 128, 44100, norm="slaney")
    w = mel_weight_curve(128)
    np.testing.assert_allclose(fb_none / w[None, :], fb_sl, atol=5e-4)
