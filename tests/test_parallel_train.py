"""Sharded training-step and mesh tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.test_pipeline import tiny_config
from voicefixer_tpu.models import analysis
from voicefixer_tpu.parallel.mesh import make_mesh, shard_batch
from voicefixer_tpu.parallel.sharding import param_specs, shard_params
from voicefixer_tpu.train import (TrainState, init_train_state,
                                  make_train_step)
from voicefixer_tpu.train.losses import analysis_loss
from voicefixer_tpu.train.step import place_train_state


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_param_specs_policy():
    from voicefixer_tpu.config import small_tp_config
    cfg = tiny_config()
    params = analysis.init(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params, n_model=2, min_channels=64)
    # GRU weights replicated
    assert specs["denoiser"]["gru7"]["gru"]["l0"]["w_ih"] == P()
    # the WHOLE denoiser is replicated: its FC widths are the mel axis,
    # which is a spatial axis for the downstream U-Net (parallel/sharding.py)
    assert specs["denoiser"]["fc1"]["w"] == P()
    # BN stats replicated
    assert specs["unet"]["enc1"]["block1"]["bn1"]["gamma"] == P()
    # wide U-Net conv kernels DO shard channel-out
    cfg2 = small_tp_config()
    params2 = analysis.init(jax.random.PRNGKey(0), cfg2)
    specs2 = param_specs(params2, n_model=2, min_channels=64)
    assert specs2["unet"]["enc2"]["block1"]["conv1"]["w"] == \
        P(None, None, None, "model")


def test_analysis_loss_finite():
    cfg = tiny_config()
    params = analysis.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav_n = jnp.asarray(rng.standard_normal((2, 4410)), dtype=jnp.float32)
    wav_c = jnp.asarray(rng.standard_normal((2, 4410)), dtype=jnp.float32)
    loss, metrics = analysis_loss(params, wav_n, wav_c, cfg,
                                  rng=jax.random.PRNGKey(1))
    assert jnp.isfinite(loss)
    assert metrics["targ_loss"] >= 0 and metrics["mel_loss"] >= 0


def test_train_step_unsharded_decreases_loss():
    cfg = tiny_config()
    params = analysis.init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params)
    step = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(1)
    wav_c = jnp.asarray(rng.standard_normal((2, 4410)) * 0.1,
                        dtype=jnp.float32)
    wav_n = wav_c + jnp.asarray(rng.standard_normal((2, 4410)) * 0.05,
                                dtype=jnp.float32)
    losses = []
    for i in range(5):
        state, metrics = step(state, wav_n, wav_c, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()


@pytest.fixture(scope="module")
def unsharded_reference():
    """One unsharded train step on a fixed batch, computed once and shared
    by both sharded-parity parametrizations (the step compile is the cost)."""
    cfg = tiny_config()
    params = analysis.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    wav_c = jnp.asarray(rng.standard_normal((8, 4410)) * 0.1,
                        dtype=jnp.float32)
    wav_n = wav_c + jnp.asarray(rng.standard_normal((8, 4410)) * 0.05,
                                dtype=jnp.float32)
    key = jax.random.PRNGKey(9)
    ref_state = init_train_state(params)
    ref_step = make_train_step(cfg, donate=False)
    ref_state, ref_metrics = ref_step(ref_state, wav_n, wav_c, key)
    return cfg, params, wav_n, wav_c, key, ref_state, ref_metrics


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_train_step_sharded_matches_unsharded(n_data, n_model,
                                              unsharded_reference):
    """dp/tp-sharded step == single-device step (GSPMD correctness)."""
    (cfg, params, wav_n, wav_c, key,
     ref_state, ref_metrics) = unsharded_reference

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    state = place_train_state(init_train_state(params), mesh)
    step = make_train_step(cfg, mesh=mesh, donate=False)
    wn, wc = shard_batch(mesh, (wav_n, wav_c))
    state, metrics = step(state, wn, wc, key)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    # a sharded param matches the reference update
    a = np.asarray(state.params["denoiser"]["fc1"]["w"])
    b = np.asarray(ref_state.params["denoiser"]["fc1"]["w"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_shard_params_places_on_mesh():
    from voicefixer_tpu.config import small_tp_config
    cfg = small_tp_config()
    params = analysis.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(params, mesh)
    # wide U-Net kernel sharded channel-out on the device mesh
    w = sharded["unet"]["enc2"]["block1"]["conv1"]["w"]
    assert w.sharding.spec == P(None, None, None, "model")
    # denoiser stays replicated (mel-axis widths; parallel/sharding.py)
    assert sharded["denoiser"]["fc1"]["w"].sharding.spec == P()
