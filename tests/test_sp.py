"""Sequence-parallel vocoder (parallel/sp.py) == single-device synthesis.

Runs on the 8-virtual-device CPU mesh from conftest. The SP path shards the
generator's time axis over the "model" axis with ppermute halo exchange and
traced signal-bound masks; these tests pin it to models.vocoder.apply /
vocoder_facade.synthesize bit-for-tolerance, including non-divisible frame
counts (divisibility padding + bounds masking) and multi-hop halos (halo
larger than one shard).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicefixer_tpu.config import DEFAULT_CONFIG
from voicefixer_tpu.models import vocoder
from voicefixer_tpu.parallel.mesh import make_mesh
from voicefixer_tpu.parallel.sp import apply_sp, exchange_halo, synthesize_sp


def small_vcfg(depth=4):
    return dataclasses.replace(
        DEFAULT_CONFIG.vocoder, channels=32, cond_channels=16,
        resstack_depth=(depth,) * 4)


@pytest.mark.parametrize("n_model", [2, 4])
@pytest.mark.parametrize("t_mel", [48, 50])  # 50 does not divide 4
def test_apply_sp_matches_single_device(n_model, t_mel):
    cfg = small_vcfg()
    params = vocoder.init(jax.random.PRNGKey(0), cfg)
    mel = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                  (2, t_mel, cfg.in_channels), jnp.float32)
    ref = vocoder.apply(params, mel, cfg)
    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    got = apply_sp(params, mel, cfg, mesh)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_apply_sp_multi_hop_halo():
    """A stack whose receptive reach exceeds one shard forces multi-hop
    ppermute halo collection (k >= 2)."""
    cfg = small_vcfg(depth=6)  # reach = sum(3^i + 1) = 370 rows
    params = vocoder.init(jax.random.PRNGKey(2), cfg)
    t_mel = 16  # stage-0 shard = 16*7/8 = 14 rows << 370-row halo
    mel = 0.5 * jax.random.normal(jax.random.PRNGKey(3),
                                  (1, t_mel, cfg.in_channels), jnp.float32)
    ref = vocoder.apply(params, mel, cfg)
    got = apply_sp(params, mel, cfg, make_mesh(n_data=1, n_model=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_synthesize_sp_matches_facade():
    from voicefixer_tpu.pipeline import vocoder_facade

    cfg = small_vcfg()
    params = vocoder.init(jax.random.PRNGKey(4), cfg)
    mel = jnp.abs(jax.random.normal(jax.random.PRNGKey(5),
                                    (1, 41, cfg.in_channels), jnp.float32))
    ref = vocoder_facade.synthesize(params, mel, cfg)
    got = synthesize_sp(params, mel, cfg, make_mesh(n_data=2, n_model=4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_exchange_halo_zeros_at_edges():
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from voicefixer_tpu.parallel.sp import shard_map

    mesh = make_mesh(n_data=1, n_model=4)
    x = jnp.arange(4 * 8 * 4, dtype=jnp.float32).reshape(1, 32, 4)

    body = partial(exchange_halo, h=12, axis="model")  # multi-hop: 12 > 8
    got = shard_map(body, mesh=mesh, in_specs=P(None, "model", None),
                    out_specs=P(None, "model", None), check_rep=False)(x)
    got = np.asarray(got).reshape(1, 4, 8 + 24, 4)  # 8 local + 2*12 halo
    xp = np.pad(np.asarray(x), ((0, 0), (12, 12), (0, 0)))
    for d in range(4):
        np.testing.assert_array_equal(got[0, d], xp[0, d * 8: d * 8 + 32])
