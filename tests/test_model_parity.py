"""End-to-end model parity vs the reference torch modules with shared
(randomly initialized) weights: denoiser, ResUNet, full analysis Generator,
and the vocoder Generator. This is the strongest numerical acceptance
available without the Zenodo checkpoints (zero-egress environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_loader import get_reference_module
from voicefixer_tpu.config import VoiceFixerConfig
from voicefixer_tpu.models import analysis as vanalysis
from voicefixer_tpu.models import denoiser as vdenoiser
from voicefixer_tpu.models import resunet as vresunet
from voicefixer_tpu.models import vocoder as vvocoder
from voicefixer_tpu.utils import weights as W

CFG = VoiceFixerConfig()


def _randomize_bn_stats(module):
    """Give BN layers non-trivial running stats so eval-mode parity actually
    exercises them."""
    gen = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) * 0.5
                    + 0.75)


def _state_np(module):
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref_generator():
    """Reference analysis Generator (denoiser + unet), eval mode."""
    model_mod = get_reference_module("restorer.model")
    torch.manual_seed(0)
    gen = model_mod.Generator(128, 1025, 2)
    _randomize_bn_stats(gen)
    gen.eval()
    return gen


def test_denoiser_parity(ref_generator):
    sd = _state_np(ref_generator)
    params = W.convert_denoiser(sd, "denoiser.")
    rng = np.random.default_rng(0)
    mel = rng.random((2, 40, 128)).astype(np.float32) * 5
    with torch.no_grad():
        ref = ref_generator.denoiser(
            torch.from_numpy(mel[:, None])).numpy()[:, 0]
    got = np.asarray(vdenoiser.apply(params, jnp.asarray(mel), CFG.denoiser))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_resunet_parity(ref_generator):
    sd = _state_np(ref_generator)
    params = W.convert_resunet(sd, "unet.")
    rng = np.random.default_rng(1)
    x = (rng.random((1, 101, 128, 2)).astype(np.float32) - 0.5) * 4
    with torch.no_grad():
        ref = ref_generator.unet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))["mel"].numpy()
    got = np.asarray(vresunet.apply(params, jnp.asarray(x), CFG.unet))
    assert got.shape == ref.transpose(0, 2, 3, 1).shape
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), atol=2e-4)


def test_analysis_generator_parity(ref_generator):
    """Full Generator.forward: mask, log, unet, sum (model.py:103-120)."""
    sd = _state_np(ref_generator)
    params = {"denoiser": W.convert_denoiser(sd, "denoiser."),
              "unet": W.convert_resunet(sd, "unet.")}
    rng = np.random.default_rng(2)
    mel = rng.random((1, 65, 128)).astype(np.float32) * 3
    with torch.no_grad():
        ref = ref_generator(None, torch.from_numpy(mel[:, None]))
    out = vanalysis.apply(params, jnp.asarray(mel), CFG)
    np.testing.assert_allclose(np.asarray(out["clean"]),
                               ref["clean"].numpy()[:, 0], atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["mel"]),
                               ref["mel"].numpy()[:, 0], atol=5e-4)


@pytest.fixture(scope="module")
def ref_vocoder():
    cfgmod = get_reference_module("vocoder.config")
    cfgmod.Config.refresh(44100)
    genmod = get_reference_module("vocoder.model.generator")
    torch.manual_seed(1)
    model = genmod.Generator(128)
    model.eval()
    return model


def test_vocoder_parity(ref_vocoder):
    sd = _state_np(ref_vocoder)
    params = W.convert_vocoder(sd)
    rng = np.random.default_rng(3)
    mel = (rng.random((1, 10, 128)).astype(np.float32) - 0.5) * 8
    with torch.no_grad():
        ref = ref_vocoder(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    got = np.asarray(vvocoder.apply(params, jnp.asarray(mel), CFG.vocoder))
    assert got.shape == (1, 4410, 1)  # 441x upsampling
    np.testing.assert_allclose(got[..., 0], ref[:, 0], atol=5e-5)


def test_vocoder_weight_norm_fold(ref_vocoder):
    """resolve_weight must fold parametrized weight-norm tensors to the same
    effective kernels torch computes."""
    sd = _state_np(ref_vocoder)
    with torch.no_grad():
        eff = ref_vocoder.condnet[0].weight.detach().numpy()
    folded = W.resolve_weight(sd, "condnet.0")
    np.testing.assert_allclose(folded, eff, atol=1e-6)


def test_analysis_mode2_runs(ref_generator):
    """Mode-2 (training=True) path: BN batch stats + live dropout with an
    explicit PRNG — deterministic given a seed."""
    sd = _state_np(ref_generator)
    params = {"denoiser": W.convert_denoiser(sd, "denoiser."),
              "unet": W.convert_resunet(sd, "unet.")}
    rng = np.random.default_rng(4)
    mel = rng.random((1, 64, 128)).astype(np.float32)
    out1 = vanalysis.apply(params, jnp.asarray(mel), CFG, training=True,
                           rng=jax.random.PRNGKey(0))
    out2 = vanalysis.apply(params, jnp.asarray(mel), CFG, training=True,
                           rng=jax.random.PRNGKey(0))
    out3 = vanalysis.apply(params, jnp.asarray(mel), CFG, training=True,
                           rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out1["mel"]),
                               np.asarray(out2["mel"]))
    assert not np.allclose(np.asarray(out1["mel"]), np.asarray(out3["mel"]))
