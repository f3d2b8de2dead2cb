"""Mel-domain denoiser mask net.

Reference: /root/reference/voicefixer/restorer/model.py:69-99 — an
nn.Sequential of BatchNorm2d(1)/Linear/ReLU/Dropout/BN_GRU blocks ending in a
Sigmoid, producing a [0,1] mask multiplied onto the *linear* mel spectrogram
(model.py:105-106).

TPU design: activations are [B, T, F]; the BatchNorm2d(1) layers normalize
the whole tensor with scalar stats (single channel). Linear layers are
batched matmuls over the feature axis; the two BN_GRU blocks are
2-layer bidirectional GRUs (ops.gru) whose input projections are hoisted
MXU matmuls. Dropout is live only in mode-2 (training=True) with an explicit
PRNG key — deterministic given a seed, unlike the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voicefixer_tpu.config import DenoiserConfig
from voicefixer_tpu.ops import gru as vgru
from voicefixer_tpu.ops.conv import batch_norm


def _bn_scalar(x: jnp.ndarray, params: dict, training: bool) -> jnp.ndarray:
    """BatchNorm2d(1) on [B, T, F]: a single 'channel' covering everything."""
    if training:
        mean = jnp.mean(x)
        var = jnp.var(x)
    else:
        mean, var = params["mean"][0], params["var"][0]
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * (inv * params["gamma"][0]) + params["beta"][0]


def _dropout(x: jnp.ndarray, rate: float, training: bool, rng) -> jnp.ndarray:
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def apply(params: dict, mel: jnp.ndarray, cfg: DenoiserConfig,
          training: bool = False, rng=None) -> jnp.ndarray:
    """mel: [B, T, n_mel] linear mel. Returns the sigmoid mask [B, T, n_mel].

    Layer indices in param names follow the reference Sequential
    (model.py:69-99) so checkpoint conversion is 1:1 auditable.
    """
    if training and rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, 3) if training else [None] * 3

    x = _bn_scalar(mel, params["bn0"], training)
    x = jnp.matmul(x, params["fc1"]["w"]) + params["fc1"]["b"]
    x = jax.nn.relu(x)
    x = _bn_scalar(x, params["bn3"], training)
    x = jnp.matmul(x, params["fc4"]["w"]) + params["fc4"]["b"]
    x = _dropout(x, cfg.dropout, training, rngs[0])
    x = jax.nn.relu(x)
    # two stacked BN_GRU blocks (model.py:77-90)
    for name in ("gru7", "gru8"):
        x = _bn_scalar(x, params[name]["bn"], training)
        x = vgru.gru(x, params[name]["gru"], cfg.gru_layers,
                     bidirectional=True)
    x = _bn_scalar(x, params["bn9"], training)
    x = jax.nn.relu(x)
    x = jnp.matmul(x, params["fc11"]["w"]) + params["fc11"]["b"]
    x = _dropout(x, cfg.dropout, training, rngs[1])
    x = _bn_scalar(x, params["bn13"], training)
    x = jax.nn.relu(x)
    x = jnp.matmul(x, params["fc15"]["w"]) + params["fc15"]["b"]
    return jax.nn.sigmoid(x)


def init(key, cfg: DenoiserConfig, dtype=jnp.float32) -> dict:
    n = cfg.n_mel
    u = cfg.base_width  # reference: 2*n_mel (restorer/model.py:69-99)
    keys = jax.random.split(key, 8)

    def bn():
        return {"gamma": jnp.ones((1,), dtype), "beta": jnp.zeros((1,), dtype),
                "mean": jnp.zeros((1,), dtype), "var": jnp.ones((1,), dtype)}

    def fc(k, i, o):
        scale = jnp.sqrt(6.0 / (i + o))  # xavier_uniform-ish
        return {"w": jax.random.uniform(k, (i, o), dtype, -scale, scale),
                "b": jnp.zeros((o,), dtype)}

    return {
        "bn0": bn(),
        "fc1": fc(keys[0], n, u),
        "bn3": bn(),
        "fc4": fc(keys[1], u, 2 * u),
        "gru7": {"bn": bn(),
                 "gru": vgru.init_gru_params(keys[2], 2 * u, u,
                                             cfg.gru_layers, True, dtype)},
        "gru8": {"bn": bn(),
                 "gru": vgru.init_gru_params(keys[3], 2 * u, u,
                                             cfg.gru_layers, True, dtype)},
        "bn9": bn(),
        "fc11": fc(keys[4], 2 * u, 2 * u),
        "bn13": bn(),
        "fc15": fc(keys[5], 2 * u, n),
    }
