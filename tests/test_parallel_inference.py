"""Data-parallel chunked inference == sequential restore_inmem, and
tensor-parallel (n_model=2) inference == single-device output (8-device
virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicefixer_tpu.config import small_tp_config, tiny_test_config
from voicefixer_tpu.parallel.inference import restore_wavs
from voicefixer_tpu.parallel.mesh import make_mesh, shard_batch
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


def test_tp_inference_matches_single_device():
    """n_model=2 GSPMD inference == single-device output (VERDICT r1 #3).

    Uses small_tp_config so the "model" axis actually shards kernels
    (channels >= 64); channel-out sharding splits only the output axis of
    each conv's contraction, so results should agree to float rounding."""
    cfg = small_tp_config()
    vf = VoiceFixer.random(3, config=cfg)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    vf_tp = VoiceFixer.random(3, config=cfg, mesh=mesh)

    # params actually got sharded over the model axis
    specs = jax.tree.leaves(jax.tree.map(
        lambda p: "model" in str(getattr(p, "sharding", "")),
        vf_tp.vocoder_params))
    assert any(specs), "no vocoder kernel was model-sharded"

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 4410)) * 0.1).astype(np.float32)
    ref, peaks_ref = vf._jit_batch(vf.params, vf.vocoder_params,
                                   jnp.asarray(wav), training=False, rng=None)
    sharded = shard_batch(mesh, jnp.asarray(wav))
    out, peaks = vf_tp._jit_batch(vf_tp.params, vf_tp.vocoder_params,
                                  sharded, training=False, rng=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(peaks), np.asarray(peaks_ref),
                               rtol=1e-5, atol=2e-5)


def test_tp_restore_inmem_matches_single_device():
    """The full facade path (chunking, trims) under a TP mesh."""
    cfg = small_tp_config()
    vf = VoiceFixer.random(4, config=cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    vf_tp = VoiceFixer.random(4, config=cfg, mesh=mesh)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(66150) * 0.1).astype(np.float32)  # 1.5 s
    ref = vf.restore_inmem(wav, mode=0)
    out = vf_tp.restore_inmem(wav, mode=0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=2e-5)
