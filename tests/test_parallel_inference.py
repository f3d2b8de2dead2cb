"""Data-parallel chunked inference == sequential restore_inmem (8-device
virtual CPU mesh)."""

import numpy as np
import pytest

from voicefixer_tpu.config import tiny_test_config
from voicefixer_tpu.parallel.inference import restore_wavs
from voicefixer_tpu.parallel.mesh import make_mesh
from voicefixer_tpu.pipeline.restore import VoiceFixer


@pytest.fixture(scope="module")
def vf():
    return VoiceFixer.random(0, config=tiny_test_config())


def test_restore_wavs_matches_sequential(vf):
    rng = np.random.default_rng(0)
    seg = vf.config.pipeline.seg_length
    wavs = [rng.standard_normal(seg + 4410).astype(np.float32) * 0.1,
            rng.standard_normal(11025).astype(np.float32) * 0.1,
            rng.standard_normal(2 * seg).astype(np.float32) * 0.1]
    mesh = make_mesh(n_data=8, n_model=1)
    outs = restore_wavs(vf, wavs, mode=0, mesh=mesh)
    for wav, out in zip(wavs, outs):
        ref = vf.restore_inmem(wav, mode=0)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_restore_wavs_mode1(vf):
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(22050).astype(np.float32) * 0.1]
    outs = restore_wavs(vf, wavs, mode=1, mesh=make_mesh(n_data=4, n_model=1))
    ref = vf.restore_inmem(wavs[0], mode=1)
    np.testing.assert_allclose(outs[0], ref, atol=1e-5)


def test_restore_wavs_rejects_mode2(vf):
    with pytest.raises(ValueError):
        restore_wavs(vf, [np.zeros(100, np.float32)], mode=2)
