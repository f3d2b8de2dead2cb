"""Mel debug plotting (reference restorer/model.py:646-680)."""

import numpy as np
import pytest

from voicefixer_tpu.utils.plotting import clip, draw_and_save


def test_clip_shared_limits():
    a = np.array([[0.1, 2.0]])
    b = np.array([[0.5, 3.0]])
    vmax, vmin = clip(a, b)
    assert vmax == 3.0 and vmin == 0.1


def test_draw_and_save_writes_png(tmp_path):
    pytest.importorskip("matplotlib")
    mel = np.abs(np.random.RandomState(0).randn(1, 1, 64, 128)).astype(
        np.float32)
    out = tmp_path / "mel.png"
    draw_and_save(mel, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_draw_and_save_rejects_negative_with_log(tmp_path):
    pytest.importorskip("matplotlib")
    mel = np.full((4, 4), -1.0, dtype=np.float32)
    with pytest.raises(AssertionError):
        draw_and_save(mel, str(tmp_path / "bad.png"))
    # needlog=False accepts signed data (the reference's log-mel debug path)
    draw_and_save(mel, str(tmp_path / "ok.png"), needlog=False)
    assert (tmp_path / "ok.png").exists()
