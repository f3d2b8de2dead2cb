"""Parity tests for the Pallas kernels (voicefixer_tpu/kernels/) against
their jax reference implementations in voicefixer_tpu/ops/.

Run in Pallas interpret mode so they validate on the CPU mesh used by the
test suite; on a TPU backend the same calls exercise the compiled kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicefixer_tpu.ops import gru as vgru


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, dtype=jnp.float32)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("t", [7, 256, 300])
def test_gru_kernel_matches_scan(reverse, t):
    from voicefixer_tpu.kernels.gru import gru_seq

    b, in_dim, h = 2, 64, 128
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    params = {
        "w_ih": _rand(keys[0], (3 * h, in_dim), 0.1),
        "w_hh": _rand(keys[1], (3 * h, h), 0.1),
        "b_ih": _rand(keys[2], (3 * h,), 0.1),
        "b_hh": _rand(keys[3], (3 * h,), 0.1),
    }
    x = _rand(keys[4], (b, t, in_dim))

    ref = vgru.gru_single_direction(x, params, reverse=reverse)

    x_proj = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]
    got = gru_seq(x_proj, params["w_hh"].T, params["b_hh"],
                  reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t", [7, 256, 300])
def test_gru_bidir_kernel_matches_scan(t):
    """Fused fwd+bwd recurrence == the two single-direction scans."""
    from voicefixer_tpu.kernels.gru import gru_seq_bidir

    b, in_dim, h = 2, 64, 128
    keys = jax.random.split(jax.random.PRNGKey(5), 9)
    pf = {"w_ih": _rand(keys[0], (3 * h, in_dim), 0.1),
          "w_hh": _rand(keys[1], (3 * h, h), 0.1),
          "b_ih": _rand(keys[2], (3 * h,), 0.1),
          "b_hh": _rand(keys[3], (3 * h,), 0.1)}
    pb = {"w_ih": _rand(keys[4], (3 * h, in_dim), 0.1),
          "w_hh": _rand(keys[5], (3 * h, h), 0.1),
          "b_ih": _rand(keys[6], (3 * h,), 0.1),
          "b_hh": _rand(keys[7], (3 * h,), 0.1)}
    x = _rand(keys[8], (b, t, in_dim))

    ref_f = vgru.gru_single_direction(x, pf, reverse=False)
    ref_b = vgru.gru_single_direction(x, pb, reverse=True)

    xf = jnp.einsum("bti,gi->btg", x, pf["w_ih"]) + pf["b_ih"]
    xb = jnp.einsum("bti,gi->btg", x, pb["w_ih"]) + pb["b_ih"]
    got_f, got_b = gru_seq_bidir(xf, xb, pf["w_hh"].T, pb["w_hh"].T,
                                 pf["b_hh"], pb["b_hh"], interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dil", [1, 3, 27])
@pytest.mark.parametrize("t,ch", [(300, 128), (2048, 64), (2500, 64)])
def test_res_block_matches_jax_conv(dil, t, ch):
    from voicefixer_tpu.kernels.resstack import res_block
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    w1 = _rand(keys[0], (3, ch, ch), 0.05)
    b1 = _rand(keys[1], (ch,), 0.05)
    w2 = _rand(keys[2], (3, ch, ch), 0.05)
    b2 = _rand(keys[3], (ch,), 0.05)
    x = _rand(keys[4], (2, t, ch))

    h = leaky_relu(x, 0.2)
    h = conv1d(h, w1, b1, padding=dil, dilation=dil)
    h = leaky_relu(h, 0.2)
    ref = x + conv1d(h, w2, b2, padding=1)

    got = res_block(x, w1, b1, w2, b2, dil=dil, t_tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_res_stack_matches_model_path(monkeypatch):
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.models.vocoder import _res_stack

    ch, t, depth = 64, 700, 8
    keys = jax.random.split(jax.random.PRNGKey(2), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch))
    ref, activated = _res_stack(params, x, 3, 0.2)
    assert not activated  # jax path on CPU
    got = resstack.res_stack(params, x, 3, 0.2, t_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_res_chain_matches_blocks():
    """Chained kernel == sequential single blocks, including the folded
    stage-final activation and the zero-pad masking between chained
    blocks."""
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t = 128, 700
    dils = (1, 3, 9)
    keys = jax.random.split(jax.random.PRNGKey(7), len(dils) * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(len(dils))]
    x = _rand(keys[-1], (1, t, ch))

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
    ref = leaky_relu(ref, 0.3)

    got = resstack.res_chain(
        x,
        jnp.stack([p["c1"]["w"] for p in params]),
        jnp.stack([p["c1"]["b"] for p in params]),
        jnp.stack([p["c2"]["w"] for p in params]),
        jnp.stack([p["c2"]["b"] for p in params]),
        dils=dils, slope=0.2, final_slope=0.3, t_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("t,f,ci,co", [(40, 15, 32, 32), (48, 31, 16, 32),
                                       (40, 7, 64, 64)])
def test_conv_block_kernel_matches_model(t, f, ci, co):
    """Fused ConvBlockRes kernel == the jax conv path, including the
    shortcut conv when Cin != Cout and the T/F 'same' zero edges."""
    from voicefixer_tpu.kernels import convblock
    from voicefixer_tpu.models.resunet import _conv_block_res
    from voicefixer_tpu.ops.conv import fold_bn_eval

    keys = jax.random.split(jax.random.PRNGKey(13), 8)

    def bn(c, k1, k2):
        return {"gamma": 1.0 + 0.1 * _rand(keys[k1], (c,)),
                "beta": 0.1 * _rand(keys[k2], (c,)),
                "mean": 0.05 * _rand(keys[k1], (c,)),
                "var": jnp.abs(1.0 + 0.1 * _rand(keys[k2], (c,)))}

    params = {"bn1": bn(ci, 0, 1),
              "conv1": {"w": _rand(keys[2], (3, 3, ci, co), 0.1)},
              "bn2": bn(co, 3, 4),
              "conv2": {"w": _rand(keys[5], (3, 3, co, co), 0.1)}}
    if ci != co:
        params["shortcut"] = {"w": _rand(keys[6], (1, 1, ci, co), 0.1),
                              "b": 0.1 * _rand(keys[7], (co,))}
    params = fold_bn_eval(params)
    x = _rand(keys[7], (1, t, f, ci), 0.5)

    import os
    os.environ["VF_TPU_NO_PALLAS"] = "1"
    try:
        ref = _conv_block_res(params, x, 0.01, training=False)
    finally:
        del os.environ["VF_TPU_NO_PALLAS"]
    got = convblock.conv_block_res(x, params, 0.01, tm=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_res_fold_matches_plain():
    """Time-folded C=64 path == plain conv reference, including both seam
    margins and the true signal edges (depth-4 stack keeps the receptive
    field small enough for interpret mode)."""
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t, depth = 64, 1000, 4
    dils = tuple(3 ** (i % 10) for i in range(depth))
    reach = resstack._ceil8(sum(d + 1 for d in dils)) + 8
    assert t >= 8 * reach  # the dispatch condition actually folds
    keys = jax.random.split(jax.random.PRNGKey(11), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch))

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
    ref = leaky_relu(ref, 0.3)

    got = resstack._res_fold(params, x, dils, 0.2, 0.3, t_tile=256,
                             matmul_dtype=jnp.float32, interpret=True,
                             reach=reach)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
    # the public dispatch takes the fold path for this shape
    got2 = resstack.res_stack(params, x, 3, 0.2, t_tile=256,
                              final_slope=0.3, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ch", [128, 256, 512])
def test_plan_chain_partitions(ch):
    """The DP planner must produce a contiguous partition with VMEM-feasible
    tiles; jax fallback (tile None) only for groups NO kernel (chained or
    shifted-tap) can fit."""
    from voicefixer_tpu.kernels import resstack
    dils = tuple(3 ** (i % 10) for i in range(8))
    for t_total in (21000, 1323000):
        groups = resstack.plan_chain(ch, dils, 2, 2, t_total=t_total)
        assert groups[0][0] == 0 and groups[-1][1] == len(dils)
        for (a, b, tt), (a2, _, _) in zip(groups, groups[1:]):
            assert b == a2
        for a, b, tt in groups:
            if tt is None:
                assert b - a == 1  # only singles may fall back
                assert all(resstack.chain_vmem_bytes(
                    ch, dils[a:b], t, 2, 2) > resstack.VMEM_BUDGET
                    for t in (256, 512, 1024, 2048, 4096, 8192))
                assert all(resstack.shift_vmem_bytes(ch, t, 2, 2)
                           > resstack.VMEM_BUDGET
                           for t in (256, 512, 1024, 2048, 4096, 8192))
            elif isinstance(tt, tuple):
                assert tt[0] == "shift" and b - a == 1
                assert resstack.shift_vmem_bytes(
                    ch, tt[1], 2, 2) <= resstack.VMEM_BUDGET
            else:
                assert resstack.chain_vmem_bytes(
                    ch, dils[a:b], tt, 2, 2) <= resstack.VMEM_BUDGET


@pytest.mark.parametrize("dil,t", [(729, 3000), (2187, 2500), (81, 1000)])
def test_res_shift_single_matches_jax_conv(dil, t):
    """Shifted-tap single kernel == the plain conv block, including the
    final-slope epilogue and left/right signal edges (where the row-offset
    tap reads land in the zero padding)."""
    from voicefixer_tpu.kernels.resstack import res_shift_single
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch = 128
    keys = jax.random.split(jax.random.PRNGKey(11), 5)
    w1 = _rand(keys[0], (3, ch, ch), 0.05)
    b1 = _rand(keys[1], (ch,), 0.05)
    w2 = _rand(keys[2], (3, ch, ch), 0.05)
    b2 = _rand(keys[3], (ch,), 0.05)
    x = _rand(keys[4], (2, t, ch))

    h = leaky_relu(x, 0.2)
    h = conv1d(h, w1, b1, padding=dil, dilation=dil)
    h = leaky_relu(h, 0.2)
    ref = leaky_relu(x + conv1d(h, w2, b2, padding=1), 0.3)

    got = res_shift_single(x, w1, b1, w2, b2, dil=dil, slope=0.2,
                           final_slope=0.3, t_tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_res_stack_routes_huge_dilations_through_shift(monkeypatch):
    """A full depth-8 stack at C=128/fp32 routes its huge-dilation singles
    (d >= 729) through the shifted-tap kernel and still matches the plain
    jax path end to end (the in-stack composition: chained groups feed the
    shift singles and vice versa)."""
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.models.vocoder import _res_stack

    ch, t, depth = 128, 2560, 8
    dils = tuple(3 ** (i % 10) for i in range(depth))
    groups = resstack.plan_chain(ch, dils, 4, 4, t_total=t)
    assert any(isinstance(tt, tuple) for _, _, tt in groups), groups

    keys = jax.random.split(jax.random.PRNGKey(13), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch), 0.5)

    ref, activated = _res_stack(params, x, 3, 0.2)
    assert not activated  # jax path on CPU
    got = resstack.res_stack(params, x, 3, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("scale,cin,cout", [(7, 64, 32), (3, 128, 64)])
@pytest.mark.parametrize("t", [100, 512, 700])
def test_upsample_kernel_matches_conv_transpose(scale, cin, cout, t):
    from voicefixer_tpu.kernels.upsample import upsample
    from voicefixer_tpu.ops.conv import conv_transpose1d

    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    w = _rand(keys[0], (2 * scale, cin, cout), 0.05)
    b = _rand(keys[1], (cout,), 0.05)
    x = _rand(keys[2], (2, t, cin))

    a = x + jnp.sin(x)
    ref = conv_transpose1d(a, w, b, stride=scale,
                           padding=scale // 2 + scale % 2,
                           output_padding=scale % 2)
    got = upsample(x, w, b, scale, t_tile=256, interpret=True)
    assert got.shape == ref.shape == (2, t * scale, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [44100, 20000])
def test_stft_mel_kernel_matches_ops_path(n):
    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.kernels.stft import stft_mel
    from voicefixer_tpu.ops import mel as vmel
    from voicefixer_tpu.ops import stft as vstft

    cfg = DEFAULT_CONFIG
    wav = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (2, n),
                                  dtype=jnp.float32)
    fb = jnp.asarray(vmel.melscale_fbanks(
        cfg.mel.n_stft, cfg.mel.f_min, cfg.mel.f_max, cfg.mel.n_mels,
        cfg.mel.sample_rate, norm=None), dtype=jnp.float32)

    sp = vstft.spectrogram(wav, cfg.stft, eps=cfg.stft.mag_eps)
    ref = jnp.matmul(sp, fb)

    got = stft_mel(wav, fb, cfg.stft, t_tile=128, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def _stage_reference(up, res_params, x, scale, dils, slope=0.2,
                     final_slope=0.3):
    """Plain-jax (UpsampleNet -> ResStack -> LeakyReLU) stage reference."""
    from voicefixer_tpu.ops.conv import conv1d, conv_transpose1d, leaky_relu
    a = x + jnp.sin(x)
    y = conv_transpose1d(a, up["w"], up["b"], stride=scale,
                         padding=scale // 2 + scale % 2,
                         output_padding=scale % 2)
    for p, d in zip(res_params, dils):
        h = leaky_relu(y, slope)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, slope)
        y = y + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
    return leaky_relu(y, final_slope)


def _stage_params(key, cin, cout, scale, depth):
    keys = jax.random.split(key, depth * 4 + 2)
    up = {"w": _rand(keys[-1], (2 * scale, cin, cout), 0.05),
          "b": _rand(keys[-2], (cout,), 0.05)}
    res = [{"c1": {"w": _rand(keys[4 * i], (3, cout, cout), 0.05),
                   "b": _rand(keys[4 * i + 1], (cout,), 0.05)},
            "c2": {"w": _rand(keys[4 * i + 2], (3, cout, cout), 0.05),
                   "b": _rand(keys[4 * i + 3], (cout,), 0.05)}}
           for i in range(depth)]
    return up, res


def test_up_res_stream_plain_matches_stage():
    """Fused upsample+ResStack kernel (Cout=128, no fold) == the separate
    conv_transpose + ResStack + stage-LeakyReLU reference, across tile
    boundaries and both signal edges."""
    from voicefixer_tpu.kernels.resstack import up_res_stack

    cin, cout, scale, depth = 128, 128, 3, 3
    dils = tuple(3 ** i for i in range(depth))
    up, res = _stage_params(jax.random.PRNGKey(21), cin, cout, scale, depth)
    x = _rand(jax.random.PRNGKey(22), (2, 70, cin))

    ref = _stage_reference(up, res, x, scale, dils)
    got = up_res_stack(up, res, x, scale, 3, 0.2, final_slope=0.3,
                       interpret=True)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)


def test_up_res_stream_fold_matches_stage():
    """Fused kernel in time-folded Cout=64 mode == the separate reference:
    the fold seam, both halves' masking offsets, and the upsample's
    polyphase alignment all compose."""
    from voicefixer_tpu.kernels.resstack import up_res_stack

    cin, cout, scale, depth = 128, 64, 3, 2
    dils = tuple(3 ** i for i in range(depth))
    up, res = _stage_params(jax.random.PRNGKey(23), cin, cout, scale, depth)
    # t_out = 480: even, half=240 (mult of 3), reach=24 -> off=216>0,
    # t_out >= 8*reach
    x = _rand(jax.random.PRNGKey(24), (1, 160, cin))

    ref = _stage_reference(up, res, x, scale, dils)
    got = up_res_stack(up, res, x, scale, 3, 0.2, final_slope=0.3,
                       interpret=True)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("dils", [(1, 3, 9), (1, 3, 9, 27)])
def test_res_stream_matches_blocks(dils):
    """Streaming ring-buffer kernel == sequential single blocks, including
    the lagged output alignment, the left-edge (uninitialized history)
    masking, and the folded stage-final activation."""
    from voicefixer_tpu.kernels import resstream
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t = 128, 700
    keys = jax.random.split(jax.random.PRNGKey(17), len(dils) * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(len(dils))]
    x = _rand(keys[-1], (2, t, ch))

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
    ref = leaky_relu(ref, 0.3)

    got = resstream.res_stream(
        x,
        jnp.stack([p["c1"]["w"] for p in params]),
        jnp.stack([p["c1"]["b"] for p in params]),
        jnp.stack([p["c2"]["w"] for p in params]),
        jnp.stack([p["c2"]["b"] for p in params]),
        dils=dils, slope=0.2, final_slope=0.3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_res_stream_full_depth_production_dilations():
    """The production depth-8 stack (dilations 1..2187, lag tile 3344) at a
    T spanning several tiles, via the public res_stack dispatch at C=128."""
    from voicefixer_tpu.kernels import resstack, resstream
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t, depth = 128, 7100, 8
    dils = tuple(3 ** (i % 10) for i in range(depth))
    assert resstack.stream_ok(ch, dils, t)
    keys = jax.random.split(jax.random.PRNGKey(19), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.02)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.02)}}
              for i in range(depth)]
    for i in range(depth):
        params[i]["c1"]["b"] = _rand(keys[4 * i + 1], (ch,), 0.02)
        params[i]["c2"]["b"] = _rand(keys[4 * i + 3], (ch,), 0.02)
    x = _rand(keys[-1], (1, t, ch))

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)

    got = resstack.res_stack(params, x, 3, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_res_stream_fold_matches_plain():
    """Folded C=64 + streaming kernel == plain conv reference (seam margins
    and global-position masking through the fold lanes)."""
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t, depth = 64, 2000, 4
    dils = tuple(3 ** (i % 10) for i in range(depth))
    reach = resstack._ceil8(sum(d + 1 for d in dils)) + 8
    assert t >= 8 * reach
    assert resstack.stream_ok(2 * ch, dils, t // 2 + 2 * reach)
    keys = jax.random.split(jax.random.PRNGKey(23), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.05)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.05),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.05)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch))

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
    ref = leaky_relu(ref, 0.3)

    got = resstack._res_fold(params, x, dils, 0.2, 0.3, t_tile=256,
                             matmul_dtype=jnp.float32, interpret=True,
                             reach=reach)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_res_stream_interior_fast_path_matches_conv():
    """T spanning >= 5 tiles engages the r5 interior fast path (unmasked
    body on steps whose masks are statically all-ones); the output must
    stay exact against the conv reference across the interior/edge step
    boundary."""
    from voicefixer_tpu.kernels import resstack, resstream
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu

    ch, t, depth = 128, 17000, 8
    dils = tuple(3 ** (i % 10) for i in range(depth))
    tt = resstream.stream_lag(dils)
    assert (t - tt - 8) // tt >= 2, "test shape must engage interior steps"
    keys = jax.random.split(jax.random.PRNGKey(23), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.02),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.02)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.02),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.02)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch), 0.3)

    ref = x
    for p, d in zip(params, dils):
        h = leaky_relu(ref, 0.2)
        h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d, dilation=d)
        h = leaky_relu(h, 0.2)
        ref = ref + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)

    got = resstream.res_stream(
        x,
        jnp.stack([p["c1"]["w"] for p in params]),
        jnp.stack([p["c1"]["b"] for p in params]),
        jnp.stack([p["c2"]["w"] for p in params]),
        jnp.stack([p["c2"]["b"] for p in params]),
        dils=dils, slope=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_res_stream_fold_interior_fast_path_matches_plain():
    """Fold mode (C=64 via res_stack) at a T long enough that interior
    steps run unmasked: both lane halves' results must match the plain
    jax path, including the seam region and the half-B tail (the
    positions the masks exist for)."""
    from voicefixer_tpu.kernels import resstack
    from voicefixer_tpu.models.vocoder import _res_stack

    ch, t, depth = 64, 34000, 8
    keys = jax.random.split(jax.random.PRNGKey(29), depth * 4 + 1)
    params = [{"c1": {"w": _rand(keys[4 * i], (3, ch, ch), 0.02),
                      "b": _rand(keys[4 * i + 1], (ch,), 0.02)},
               "c2": {"w": _rand(keys[4 * i + 2], (3, ch, ch), 0.02),
                      "b": _rand(keys[4 * i + 3], (ch,), 0.02)}}
              for i in range(depth)]
    x = _rand(keys[-1], (1, t, ch), 0.3)
    ref, activated = _res_stack(params, x, 3, 0.2)
    assert not activated
    got = resstack.res_stack(params, x, 3, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
