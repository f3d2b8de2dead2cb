"""Torch-parity tests for conv/conv-transpose/pool/BN wrappers."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from voicefixer_tpu.ops import conv as vconv


def _t2j_conv1d_w(w):  # torch [Cout, Cin, K] -> [K, Cin, Cout]
    return jnp.asarray(w.transpose(2, 1, 0))


def _t2j_conv2d_w(w):  # torch [Cout, Cin, Kh, Kw] -> [Kh, Kw, Cin, Cout]
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def _t2j_convT1d_w(w):  # torch [Cin, Cout, K] -> [K, Cin, Cout] (unflipped)
    return jnp.asarray(w.transpose(2, 0, 1).copy())


def _t2j_convT2d_w(w):  # torch [Cin, Cout, Kh, Kw] -> [Kh, Kw, Cin, Cout]
    return jnp.asarray(w.transpose(2, 3, 0, 1).copy())


@pytest.mark.parametrize("dilation", [1, 3, 729])
def test_conv1d_dilated(dilation):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3000, 16)).astype(np.float32)
    w = rng.standard_normal((8, 16, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(8).astype(np.float32)
    pad = dilation
    ref = F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)),
                   torch.from_numpy(w), torch.from_numpy(b),
                   padding=pad, dilation=dilation).numpy().transpose(0, 2, 1)
    got = vconv.conv1d(jnp.asarray(x), _t2j_conv1d_w(w), jnp.asarray(b),
                       padding=pad, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_conv2d():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 127, 4)).astype(np.float32)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32) * 0.1
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w), padding=1).numpy().transpose(0, 2, 3, 1)
    got = vconv.conv2d(jnp.asarray(x), _t2j_conv2d_w(w), padding=(1, 1))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


@pytest.mark.parametrize("s", [7, 3])
def test_conv_transpose1d_vocoder_config(s):
    """The vocoder's UpsampleNet: k=2s, stride=s, padding=s//2+s%2,
    output_padding=s%2 (ref vocoder/model/modules.py:449-458)."""
    rng = np.random.default_rng(2)
    k, p, op = 2 * s, s // 2 + s % 2, s % 2
    x = rng.standard_normal((2, 50, 8)).astype(np.float32)
    w = rng.standard_normal((8, 4, k)).astype(np.float32) * 0.1
    b = rng.standard_normal(4).astype(np.float32)
    ref = F.conv_transpose1d(torch.from_numpy(x.transpose(0, 2, 1)),
                             torch.from_numpy(w), torch.from_numpy(b),
                             stride=s, padding=p, output_padding=op)
    ref = ref.numpy().transpose(0, 2, 1)
    got = vconv.conv_transpose1d(jnp.asarray(x), _t2j_convT1d_w(w),
                                 jnp.asarray(b), stride=s, padding=p,
                                 output_padding=op)
    assert got.shape == ref.shape == (2, 50 * s, 4)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_conv_transpose2d_unet_config():
    """DecoderBlockRes conv: k=3, stride=2, padding=0
    (ref restorer/modules.py:113-122)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 23, 3, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8, 3, 3)).astype(np.float32) * 0.1
    ref = F.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             torch.from_numpy(w), stride=2)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    got = vconv.conv_transpose2d(jnp.asarray(x), _t2j_convT2d_w(w),
                                 stride=(2, 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_avg_pool2d_odd():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 65, 127, 3)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       kernel_size=(2, 2)).numpy().transpose(0, 2, 3, 1)
    got = vconv.avg_pool2d(jnp.asarray(x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


@pytest.mark.parametrize("training", [False, True])
def test_batch_norm(training):
    rng = np.random.default_rng(5)
    c = 6
    x = rng.standard_normal((2, 10, 12, c)).astype(np.float32)
    gamma = rng.random(c).astype(np.float32) + 0.5
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.random(c).astype(np.float32) + 0.5
    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.train(training)
    with torch.no_grad():
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)
    params = {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta),
              "mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    got = vconv.batch_norm(jnp.asarray(x), params, training=training)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5)


def test_fold_batch_norm():
    rng = np.random.default_rng(6)
    c = 4
    params = {"gamma": jnp.asarray(rng.random(c).astype(np.float32) + 0.5),
              "beta": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
              "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
              "var": jnp.asarray(rng.random(c).astype(np.float32) + 0.5)}
    x = jnp.asarray(rng.standard_normal((2, 5, c)).astype(np.float32))
    scale, shift = vconv.fold_batch_norm(params)
    np.testing.assert_allclose(
        np.asarray(x * scale + shift),
        np.asarray(vconv.batch_norm(x, params)), atol=1e-6)


def test_reflection_pad1d():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1)
    ref = F.pad(torch.arange(10, dtype=torch.float32).reshape(1, 1, 10),
                (3, 3), mode="reflect").numpy().transpose(0, 2, 1)
    got = vconv.reflection_pad1d(x, 3)
    np.testing.assert_allclose(np.asarray(got), ref)


def test_conv2d_3x3_s2d_matches_conv2d():
    """Space-to-depth 3x3 conv (experimental, measured slower on-chip —
    see its docstring) must stay numerically identical to conv2d."""
    import jax
    import jax.numpy as jnp

    from voicefixer_tpu.ops.conv import conv2d, conv2d_3x3_s2d

    for (t, f, ci, co) in [(40, 15, 32, 32), (37, 13, 16, 8),
                           (48, 31, 64, 32)]:
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k[0], (2, t, f, ci), jnp.float32) * 0.3
        w = jax.random.normal(k[1], (3, 3, ci, co), jnp.float32) * 0.1
        b = jax.random.normal(k[2], (co,), jnp.float32) * 0.1
        ref = conv2d(x, w, b, padding=(1, 1))
        got = conv2d_3x3_s2d(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
