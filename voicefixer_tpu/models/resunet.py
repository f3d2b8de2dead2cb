"""6-encoder/6-decoder residual U-Net over log-mel spectrograms (65.15 M
params).

Reference: /root/reference/voicefixer/restorer/model_kqq_bn.py:6-181 and
restorer/modules.py:7-157.

TPU design: NHWC layout [B, T, F, C]; every ConvBlockRes is
bn -> leaky(0.01) -> 3x3 conv -> bn -> leaky -> 3x3 conv (+ residual), which
XLA fuses into implicit-GEMM convs on the MXU. Decoder upsampling is the
polyphase transposed conv from ops.conv (no lhs_dilation). Inference BN runs
as a single multiply-add when the params carry the (scale, shift) leaves
that ops.conv.fold_bn_eval adds at weight-load time (the BN sits before the
leaky-relu, so it cannot be folded into the conv kernels themselves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import ResUNetConfig
from voicefixer_tpu.ops.conv import (avg_pool2d, batch_norm, conv2d,
                                     conv2d_3x3_gemm, conv_transpose2d,
                                     leaky_relu)


def _conv_block_res(params: dict, x: jnp.ndarray, slope: float,
                    training: bool) -> jnp.ndarray:
    """ConvBlockRes (modules.py:7-76): two bn-lrelu-conv3x3 + residual.

    The fused Pallas kernel (kernels/convblock.py) is OPT-IN via
    VF_TPU_PALLAS_CONVBLOCK=1: r5 measured it slower than XLA's implicit-
    GEMM convs at every production level large enough to resolve through
    the dev tunnel's noise (enc1 2.92 vs 1.21 ms, enc2 0.68 vs 0.17,
    dec6 3.34 vs 1.83; folded-BN stage total 34.8 vs 21.9 ms,
    benchmarks/bench_resunet_probe.py + bench_resunet_levels.py). The r4
    dispatch had only been validated for correctness and VMEM fit — the
    headline bench of the time fed unfolded BN params, which skip this
    dispatch entirely, so the regression never showed there."""
    import os

    from voicefixer_tpu import kernels
    if kernels.use("convblock") and os.environ.get("VF_TPU_PALLAS_CONVBLOCK"):
        from voicefixer_tpu.kernels import convblock
        tm = convblock.plan_tm(params, x, training)
        if tm is not None:
            return convblock.conv_block_res(
                x, params, slope, matmul_dtype=kernels.matmul_dtype(),
                tm=tm)
    # deep levels (tiny spatial, wide channels — ineligible for the fused
    # kernel because co > 128): lax.conv fragments on the 3-15-row freq
    # axis (~2 TF/s measured at [94, 3] x 768); the im2col GEMM doesn't.
    # The spatial gate keeps the 9x tap copy off the big shallow levels.
    w1 = params["conv1"]["w"]
    t_, f_ = x.shape[1], x.shape[2]
    if (not training and w1.shape[:2] == (3, 3)
            and params["conv2"]["w"].shape[:2] == (3, 3)
            and t_ * f_ <= 20000 and x.shape[-1] >= 128):
        def c3(h, w):
            return conv2d_3x3_gemm(h, w)
    else:
        def c3(h, w):
            return conv2d(h, w, padding=(1, 1))
    origin = x
    h = batch_norm(x, params["bn1"], training)
    h = c3(leaky_relu(h, slope), params["conv1"]["w"])
    h = batch_norm(h, params["bn2"], training)
    h = c3(leaky_relu(h, slope), params["conv2"]["w"])
    if "shortcut" in params:
        return conv2d(origin, params["shortcut"]["w"],
                      params["shortcut"]["b"]) + h
    return origin + h


def _encoder_block(params: dict, x: jnp.ndarray, slope: float,
                   training: bool, n_blocks: int):
    """EncoderBlockRes (modules.py:79-104): 4 conv blocks + 2x2 avg pool
    (block count configurable; reference depth is 4)."""
    for i in range(n_blocks):
        x = _conv_block_res(params[f"block{i + 1}"], x, slope, training)
    return avg_pool2d(x), x


def _decoder_block(params: dict, x: jnp.ndarray, skip: jnp.ndarray,
                   slope: float, training: bool,
                   n_blocks: int) -> jnp.ndarray:
    """DecoderBlockRes (modules.py:107-157): bn-relu-convT(k3,s2), prune last
    time row, concat skip, 4 conv blocks."""
    h = batch_norm(x, params["bn1"], training)
    h = conv_transpose2d(jax.nn.relu(h), params["conv1"]["w"], stride=(2, 2))
    h = h[:, :-1, :, :]  # prune(both=False): drop last time row
    h = jnp.concatenate([h, skip], axis=-1)
    for i in range(n_blocks):
        h = _conv_block_res(params[f"block{i + 2}"], h, slope, training)
    return h


def apply(params: dict, x: jnp.ndarray, cfg: ResUNetConfig,
          training: bool = False) -> jnp.ndarray:
    """x: [B, T, F=128, C=2] log-mel stack. Returns [B, T, 128, 1].

    Follows UNetResComplex_100Mb.forward (model_kqq_bn.py:130-181): pad T to
    a multiple of 64 with zeros, drop the last freq bin, run the U-Net,
    zero-pad freq back and crop T.
    """
    from voicefixer_tpu.ops.precision import activation_dtype
    slope = cfg.leaky_slope
    in_dtype = x.dtype
    adt = activation_dtype()
    if not training and adt != x.dtype:
        # production precision: bf16 activations/weights halve the HBM
        # traffic of the conv stack; matmuls accumulate fp32 (MXU native).
        # Training and parity mode keep fp32 end to end.
        params = jax.tree.map(lambda p: p.astype(adt), params)
        x = x.astype(adt)
    origin_t = x.shape[1]
    pad_len = int(np.ceil(origin_t / cfg.downsample_ratio)
                  ) * cfg.downsample_ratio - origin_t
    x = jnp.pad(x, [(0, 0), (0, pad_len), (0, 0), (0, 0)])
    x = x[:, :, : x.shape[2] - 1, :]  # [B, T', 127, C]

    from voicefixer_tpu.parallel.tp import constrain_channels
    n = cfg.levels
    skips = []
    h = x
    for i in range(n):
        h, pre = _encoder_block(params[f"enc{i + 1}"], h, slope, training,
                                cfg.blocks_per_stage)
        h = constrain_channels(h)
        skips.append(pre)
    h = _conv_block_res(params["center"], h, slope, training)
    for i in range(n):
        h = constrain_channels(
            _decoder_block(params[f"dec{i + 1}"], h, skips[n - 1 - i], slope,
                           training, cfg.blocks_per_stage))
    h = _conv_block_res(params["after1"], h, slope, training)
    h = conv2d(h, params["after2"]["w"], params["after2"]["b"])
    h = jnp.pad(h, [(0, 0), (0, 0), (0, 1), (0, 0)])  # restore freq bin
    return h[:, :origin_t, :, :].astype(in_dtype)


def _channel_plan(cfg: ResUNetConfig):
    enc = [(cfg.in_channels, cfg.encoder_channels[0])]
    for i in range(1, cfg.levels):
        enc.append((cfg.encoder_channels[i - 1], cfg.encoder_channels[i]))
    # decoder (in, out) mirrors the encoder (model_kqq_bn.py:65-106):
    # outs are the encoder channels reversed, ins chain from the center block
    dec, prev = [], cfg.center_channels
    for out in reversed(cfg.encoder_channels):
        dec.append((prev, out))
        prev = out
    return enc, dec


def init(key, cfg: ResUNetConfig, dtype=jnp.float32) -> dict:
    def bn(c):
        return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    kit = iter(jax.random.split(key, 400))

    def conv_w(ci, co, k=3):
        scale = float(np.sqrt(6.0 / ((ci + co) * k * k)))
        return {"w": jax.random.uniform(next(kit), (k, k, ci, co), dtype,
                                        -scale, scale)}

    def conv_block(ci, co):
        p = {"bn1": bn(ci), "conv1": conv_w(ci, co), "bn2": bn(co),
             "conv2": conv_w(co, co)}
        if ci != co:
            s = conv_w(ci, co, 1)
            s["b"] = jnp.zeros((co,), dtype)
            p["shortcut"] = s
        return p

    enc_plan, dec_plan = _channel_plan(cfg)
    nb = cfg.blocks_per_stage
    params = {}
    for i, (ci, co) in enumerate(enc_plan):
        blocks = {"block1": conv_block(ci, co)}
        for j in range(2, nb + 1):
            blocks[f"block{j}"] = conv_block(co, co)
        params[f"enc{i + 1}"] = blocks
    params["center"] = conv_block(cfg.center_channels, cfg.center_channels)
    for i, (ci, co) in enumerate(dec_plan):
        stage = {
            "bn1": bn(ci),
            "conv1": conv_w(ci, co),  # transposed conv [3,3,ci,co]
            "block2": conv_block(2 * co, co),
        }
        for j in range(3, nb + 2):
            stage[f"block{j}"] = conv_block(co, co)
        params[f"dec{i + 1}"] = stage
    c0 = cfg.encoder_channels[0]
    params["after1"] = conv_block(c0, c0)
    a2 = conv_w(c0, 1, 1)
    a2["b"] = jnp.zeros((1,), dtype)
    params["after2"] = a2
    return params
