"""Convolution / pooling / normalization primitives with torch-parity
semantics, in TPU-native channels-last layouts.

Layouts: 1D activations are [B, W, C] (NWC), 2D are [B, H, W, C] (NHWC).
Weights are stored in XLA-native layouts ([K, Cin, Cout] / [Kh, Kw, Cin, Cout]);
`voicefixer_tpu.utils.weights` transposes from torch layouts at conversion time.

Torch-parity notes:
- ConvTranspose(k, s, p, output_padding=op) is expressed as an lhs-dilated
  conv with spatially flipped kernel and padding (k-1-p, k-1-p+op); verified
  against torch in tests/test_conv.py.
- avg_pool2d uses VALID windows (torch floor mode drops trailing rows/cols).
- batch_norm supports both inference (running stats) and training (batch
  stats) because the reference's "mode 2" runs BN in train mode
  (/root/reference/voicefixer/base.py:114-115).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from voicefixer_tpu.ops.precision import get_precision


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """x: [B, W, Cin]; w: [K, Cin, Cout]; symmetric int padding like torch."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=get_precision(),
    )
    if b is not None:
        y = y + b
    return y


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride=(1, 1), padding=(0, 0), dilation=(1, 1)) -> jnp.ndarray:
    """x: [B, H, W, Cin]; w: [Kh, Kw, Cin, Cout]."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision(),
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride: int = 1,
                     padding: int = 0, output_padding: int = 0) -> jnp.ndarray:
    """Torch ConvTranspose1d semantics via POLYPHASE decomposition.

    x: [B, T, Cin]; w: [K, Cin, Cout] in torch kernel order (NOT flipped —
    w[k] = torch_weight[:, :, k]). Output length = (T-1)*s - 2p + K + op.

    Rationale: the naive formulation (lhs-dilated conv) inserts s-1 zeros
    between samples, wasting (s-1)/s of the MACs and — empirically — hangs
    or miscompiles on the axon TPU backend for stride 3. The polyphase form
    z[q*s+rho] = sum_d x[q-d] @ W[rho + d*s] is D = ceil(K/s) dense batched
    matmuls that tile straight onto the MXU with zero wasted work.
    """
    k, cin, cout = w.shape
    s = stride
    t = x.shape[1]
    d_taps = -(-k // s)  # ceil(K/s)
    # Wp[rho, d] = W[rho + d*s], zero-padded beyond K
    wp = jnp.zeros((s, d_taps, cin, cout), dtype=w.dtype)
    for rho in range(s):
        for d in range(d_taps):
            kk = rho + d * s
            if kk < k:
                wp = wp.at[rho, d].set(w[kk])
    q_len = t + d_taps - 1
    z = None
    for d in range(d_taps):
        # x[q - d] for q in [0, q_len): pad d zeros front, d_taps-1-d back
        xd = jnp.pad(x, [(0, 0), (d, d_taps - 1 - d), (0, 0)])
        zd = jnp.einsum("btc,rco->btro", xd, wp[:, d],
                        precision=get_precision())
        z = zd if z is None else z + zd
    z = z.reshape(z.shape[0], q_len * s, cout)  # z[j] = z[q*s + rho]
    out_len = (t - 1) * s - 2 * padding + k + output_padding
    if padding + out_len > q_len * s:
        z = jnp.pad(z, [(0, 0), (0, padding + out_len - q_len * s), (0, 0)])
    y = z[:, padding: padding + out_len, :]
    if b is not None:
        y = y + b
    return y


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride=(1, 1),
                     padding=(0, 0), output_padding=(0, 0)) -> jnp.ndarray:
    """Torch ConvTranspose2d semantics via 2D polyphase decomposition
    (see conv_transpose1d). x: [B, H, W, Cin]; w: [Kh, Kw, Cin, Cout] in
    torch kernel order (not flipped)."""
    kh, kw, cin, cout = w.shape
    sh, sw = stride
    bsz, h, wd, _ = x.shape
    dh_taps = -(-kh // sh)
    dw_taps = -(-kw // sw)
    wp = jnp.zeros((sh, sw, dh_taps, dw_taps, cin, cout), dtype=w.dtype)
    for rh in range(sh):
        for rw in range(sw):
            for dh in range(dh_taps):
                for dw in range(dw_taps):
                    ih, iw = rh + dh * sh, rw + dw * sw
                    if ih < kh and iw < kw:
                        wp = wp.at[rh, rw, dh, dw].set(w[ih, iw])
    qh_len = h + dh_taps - 1
    qw_len = wd + dw_taps - 1
    z = None
    for dh in range(dh_taps):
        for dw in range(dw_taps):
            xd = jnp.pad(x, [(0, 0), (dh, dh_taps - 1 - dh),
                             (dw, dw_taps - 1 - dw), (0, 0)])
            zd = jnp.einsum("bhwc,rsco->bhwrso", xd, wp[:, :, dh, dw],
                            precision=get_precision())
            z = zd if z is None else z + zd
    # [B, qh, qw, sh, sw, Cout] -> [B, qh*sh, qw*sw, Cout]
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(
        bsz, qh_len * sh, qw_len * sw, cout)
    out_h = (h - 1) * sh - 2 * padding[0] + kh + output_padding[0]
    out_w = (wd - 1) * sw - 2 * padding[1] + kw + output_padding[1]
    pad_h = max(0, padding[0] + out_h - qh_len * sh)
    pad_w = max(0, padding[1] + out_w - qw_len * sw)
    if pad_h or pad_w:
        z = jnp.pad(z, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
    y = z[:, padding[0]: padding[0] + out_h,
          padding[1]: padding[1] + out_w, :]
    if b is not None:
        y = y + b
    return y


def conv2d_3x3_gemm(x: jnp.ndarray, w: jnp.ndarray,
                    b: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 'same' conv as one im2col GEMM: concat the 9 shifted taps along
    channels and contract K = 9*Cin in a single matmul.

    Same math as conv2d(x, w, b, padding=(1, 1)). Exists for the U-Net's
    DEEP levels — tiny spatial extents with wide channels (e.g. [94, 3] x
    768 -> 384, restorer/model_kqq_bn.py decoder head), where
    lax.conv_general_dilated's NHWC tiling fragments on the 3-15-row freq
    axis and measures ~2 TF/s on v5e, while this single [T*F, 9C] x
    [9C, Co] GEMM tiles straight onto the MXU. The 9x activation copy is
    noise at those shapes; callers gate on spatial size."""
    bsz, t, f, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x9 = jnp.concatenate([xp[:, dt: dt + t, df: df + f, :]
                          for dt in range(3) for df in range(3)], axis=-1)
    y = jnp.einsum("btfk,kc->btfc", x9, w.reshape(9 * ci, co),
                   precision=get_precision(),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def conv2d_3x3_s2d(x: jnp.ndarray, w: jnp.ndarray,
                   b: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 'same' conv via SPACE-TO-DEPTH packing: same math as
    conv2d(x, w, padding=(1, 1)), restructured for narrow channels.

    The U-Net's shallow levels (C in {32, 64}) starve the MXU's output
    lanes: a conv with co = 32 fills 32 of 128 result columns, capping any
    direct or im2col formulation at 25% MXU density (measured r5: enc1
    ~9-12 TF/s under both lax.conv and conv2d_3x3_gemm). Packing a 2x2
    spatial block into channels makes the OUTPUT 2*2*co = 128 wide; each
    packed output position then needs a 4x4 original-resolution input
    footprint, gathered as 16 stride-2 shifted slices into K = 16*ci. The
    [rows, 16ci] x [16ci, 4co] GEMM carries 9*4*ci*co useful MACs per row
    out of 16*ci*4*co issued — 56% density, ~2.2x the ceiling of the
    unpacked forms. Pure XLA: slices + one einsum + reshapes.

    MEASURED NEGATIVE RESULT (r5, benchmarks/bench_shallow_conv.py on
    v5e): the 16 stride-2 shifted slices + lane concat cost far more than
    the MXU density buys back — 13.8 ms vs lax.conv's 0.85 ms at the enc1
    shape. Kept as the documented record of the experiment (with a parity
    test); production routing stays on lax.conv for the shallow levels.
    A VMEM-local gather (Pallas) could revisit this, but the r5 convblock
    kernel measurements argue XLA's native conv is already strong here.
    """
    bsz, t, f, ci = x.shape
    co = w.shape[-1]
    t2, f2 = -(-t // 2), -(-f // 2)
    # index shift: padded row 0 is original row -1; tails cover the 4x4
    # footprint of the last packed position (original rows up to 2*t2+2)
    xp = jnp.pad(x, ((0, 0), (1, 2 * t2 + 2 - t), (1, 2 * f2 + 2 - f),
                     (0, 0)))
    cols = [xp[:, sy: sy + 2 * t2: 2, sx: sx + 2 * f2: 2, :]
            for sy in range(4) for sx in range(4)]
    x16 = jnp.concatenate(cols, axis=-1)  # [B, t2, f2, 16*ci]

    # W' block (sy, sx) -> (qy, qx): original tap (dy, dx) = (sy-1-qy,
    # sx-1-qx) when it lands in the 3x3 kernel; rest stays zero
    wb = jnp.zeros((4, 4, ci, 2, 2, co), w.dtype)
    for sy in range(4):
        for qy in range(2):
            dy = sy - 1 - qy
            if not -1 <= dy <= 1:
                continue
            for sx in range(4):
                for qx in range(2):
                    dx = sx - 1 - qx
                    if not -1 <= dx <= 1:
                        continue
                    wb = wb.at[sy, sx, :, qy, qx, :].set(w[dy + 1, dx + 1])
    wmat = wb.reshape(16 * ci, 4 * co)

    y = jnp.einsum("btfk,kc->btfc", x16, wmat,
                   precision=get_precision(),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(bsz, t2, f2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(bsz, 2 * t2, 2 * f2, co)[:, :t, :f, :]
    if b is not None:
        y = y + b
    return y


def avg_pool2d(x: jnp.ndarray, window=(2, 2)) -> jnp.ndarray:
    """torch F.avg_pool2d(kernel=window) on NHWC (floor mode == VALID)."""
    y = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, window[0], window[1], 1),
        padding="VALID",
    )
    return y / (window[0] * window[1])


def batch_norm(x: jnp.ndarray, params: dict, training: bool = False,
               eps: float = 1e-5) -> jnp.ndarray:
    """Channel-last batch norm. params: gamma/beta/mean/var each [C].

    training=True uses per-batch statistics over all non-channel axes
    (biased variance, like torch's normalization in train mode) — this is the
    reference's mode-2 behavior. Running stats are NOT updated (inference-only
    framework; stochastic mode-2 parity does not require updates within a
    single forward).
    """
    if training:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
    elif "scale" in params:
        # pre-folded eval affine (fold_bn_eval at weight-load time)
        return x * params["scale"] + params["shift"]
    else:
        mean, var = params["mean"], params["var"]
    inv = lax.rsqrt(var + eps)
    return (x - mean) * (inv * params["gamma"]) + params["beta"]


def fold_batch_norm(params: dict, eps: float = 1e-5):
    """Return (scale, shift) so that bn(x) == x*scale + shift in eval mode."""
    inv = 1.0 / jnp.sqrt(params["var"] + eps)
    scale = params["gamma"] * inv
    shift = params["beta"] - params["mean"] * scale
    return scale, shift


def fold_bn_eval(params, eps: float = 1e-5):
    """Add precomputed eval-mode (scale, shift) leaves to every BN dict in a
    params pytree, done once at weight-load time. batch_norm(training=False)
    then runs a single fused multiply-add instead of re-deriving
    rsqrt(var+eps)*gamma per call; gamma/beta/mean/var are kept so the
    mode-2 (training=True, batch-stats) path is unaffected."""
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if all(k in node for k in ("gamma", "beta", "mean", "var")):
                out["scale"], out["shift"] = fold_batch_norm(node, eps)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def reflection_pad1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """nn.ReflectionPad1d on NWC layout (pads the W axis)."""
    return jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)
