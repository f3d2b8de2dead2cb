"""Load-time BN folding (VERDICT r1 #10): eval-mode batch norm pre-folded to
one multiply-add, with gamma/beta/mean/var retained for the mode-2
batch-stats path."""

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import tiny_test_config
from voicefixer_tpu.models import analysis
from voicefixer_tpu.ops.conv import batch_norm, fold_bn_eval


def _bn_params(key, c):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"gamma": jax.random.normal(k1, (c,)) * 0.3 + 1.0,
            "beta": jax.random.normal(k2, (c,)) * 0.2,
            "mean": jax.random.normal(k3, (c,)) * 0.1,
            "var": jax.random.uniform(k4, (c,), minval=0.5, maxval=1.5)}


def test_folded_bn_matches_raw_eval():
    p = _bn_params(jax.random.PRNGKey(0), 16)
    pf = fold_bn_eval(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 16))
    np.testing.assert_allclose(np.asarray(batch_norm(x, pf)),
                               np.asarray(batch_norm(x, p)),
                               atol=1e-6, rtol=1e-6)


def test_folded_bn_training_path_unaffected():
    p = _bn_params(jax.random.PRNGKey(2), 8)
    pf = fold_bn_eval(p)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 8))
    np.testing.assert_allclose(
        np.asarray(batch_norm(x, pf, training=True)),
        np.asarray(batch_norm(x, p, training=True)))


def test_full_analysis_folded_parity():
    """fold_bn_eval over the whole analysis pytree (denoiser GRU-BN included)
    must leave eval outputs unchanged and mode-2 outputs identical."""
    cfg = tiny_test_config()
    params = analysis.init(jax.random.PRNGKey(4), cfg)
    folded = fold_bn_eval(params)
    mel = jax.random.uniform(jax.random.PRNGKey(5), (1, 33, 128)) * 3

    out_raw = analysis.apply(params, mel, cfg)
    out_fold = analysis.apply(folded, mel, cfg)
    np.testing.assert_allclose(np.asarray(out_fold["mel"]),
                               np.asarray(out_raw["mel"]),
                               atol=2e-6, rtol=1e-5)

    rng = jax.random.PRNGKey(6)
    t_raw = analysis.apply(params, mel, cfg, training=True, rng=rng)
    t_fold = analysis.apply(folded, mel, cfg, training=True, rng=rng)
    np.testing.assert_allclose(np.asarray(t_fold["mel"]),
                               np.asarray(t_raw["mel"]))
