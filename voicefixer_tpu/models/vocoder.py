"""TFGAN-style 441x upsampling neural vocoder generator (33.88 M params).

Reference: /root/reference/voicefixer/vocoder/model/generator.py:12-145 and
vocoder/model/modules.py:433-609. Only the *executed* inference path is
implemented: condnet (5x conv k3 + ELU), pre-conv k7, four
(UpsampleNet -> ResStack(depth 8) -> leaky 0.2) stages with scales
(7, 7, 3, 3), post-conv k7, tanh.

Deliberate non-replications (all dead at inference):
- UpsampleNet's skip_conv branch is computed then DISCARDED by the reference
  (modules.py:506-517, no_skip=True); we never compute it.
- SineGen / smoothing / WaveNet / shift-scale paths are gated off by Config
  (use_sine=False etc.) and are not ported.

TPU design: NWC layout [B, T, C]; the transposed convs use the polyphase
formulation (ops.conv) — s dense matmuls instead of an lhs-dilated conv —
and the dilated ResStack convs are standard rhs-dilated convs that XLA maps
to implicit GEMM. All weight-norm parametrizations are folded into plain
kernels at conversion time (utils/weights.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voicefixer_tpu.config import VocoderConfig
from voicefixer_tpu.ops.conv import (conv1d, conv_transpose1d, elu,
                                     leaky_relu, reflection_pad1d)
from voicefixer_tpu.ops.precision import activation_dtype, get_precision


def _res_stack(params: list, x: jnp.ndarray, kernel: int, slope: float,
               final_slope: float | None = None, mask_bounds=None):
    """ResStack (modules.py:531-595): depth-8 dilated residual conv pairs,
    dilations 3^(i%10). Returns (out, activated): when the fused kernel path
    folds the stage-final LeakyReLU(final_slope) into its epilogue
    (generator.py:94), activated is True and the caller skips it.

    mask_bounds: optional TRACED [lo, hi) signal window in array rows —
    sequence-parallel shards (parallel.sp) treat positions outside it as
    the convs' zero 'same' padding at every block."""
    from voicefixer_tpu import kernels
    ch = x.shape[-1]
    if (kernel == 3 and kernels.use("resstack")
            and (ch % 128 == 0 or ch < 128)):
        # <128 channels are zero-padded to a full lane inside the kernel;
        # non-multiples above 128 (only in test configs) take the conv path
        from voicefixer_tpu.kernels.resstack import res_stack
        return res_stack(params, x, kernel, slope,
                         final_slope=final_slope,
                         matmul_dtype=kernels.matmul_dtype(),
                         mask_bounds=mask_bounds), \
            final_slope is not None

    def bounds_mask(v):
        if mask_bounds is None:
            return v
        pos = jnp.arange(v.shape[1])[None, :, None]
        return jnp.where((pos >= mask_bounds[0]) & (pos < mask_bounds[1]),
                         v, 0.0)

    for i, layer in enumerate(params):
        dil = 3 ** (i % 10)
        pad = (kernel * dil - dil) // 2
        h = leaky_relu(bounds_mask(x), slope)
        h = conv1d(h, layer["c1"]["w"], layer["c1"]["b"], padding=pad,
                   dilation=dil)
        h = leaky_relu(bounds_mask(h), slope)
        h = conv1d(h, layer["c2"]["w"], layer["c2"]["b"],
                   padding=(kernel - 1) // 2)
        x = bounds_mask(x + h)
    return x, False


def _upsample(params: dict, x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """UpsampleNet effective path (modules.py:501-517 with org=False,
    no_skip=True): x + sin(x), then ConvTranspose1d(k=2s, stride=s,
    p=s//2+s%2, op=s%2)."""
    from voicefixer_tpu import kernels
    cin, cout = params["w"].shape[1], params["w"].shape[2]
    if (kernels.use("upsample") and cin % 128 == 0
            and (cout % 128 == 0 or cout < 128)):
        from voicefixer_tpu.kernels.upsample import upsample
        return upsample(x, params["w"], params["b"], scale,
                        matmul_dtype=kernels.matmul_dtype())
    x = x + jnp.sin(x)
    return conv_transpose1d(x, params["w"], params["b"], stride=scale,
                            padding=scale // 2 + scale % 2,
                            output_padding=scale % 2)


def _post_conv(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Output projection: reflection pad 3 + conv k7 C->1 + tanh
    (generator.py:95-99).

    A 1-output-channel conv is lane-starved on the MXU (the [8,128] result
    tile carries one useful column), and lax.conv also materializes the
    reflection-padded copy of the full-rate signal. Expressed instead as a
    single [T, C] x [C, K] matmul of per-tap partial sums S (ONE MXU pass
    over x, the narrow side only K=7 wide) followed by a diagonal
    shift-and-add over the k-times-smaller S: y[t] = sum_j S[t+j-pad, j].
    Reflection padding commutes with S (it is a row reordering and S is
    row-linear in x), so padding the small S replaces padding full-rate x.
    Measured r4 (T=1.33 M): 1.73 ms (7 shifted einsums) -> 0.81 ms."""
    w, b = params["w"], params["b"]  # [K, C, 1], [1]
    k = w.shape[0]
    pad = (k - 1) // 2
    t = x.shape[1]
    s = jnp.einsum("btc,ck->btk", x, w[..., 0].T.astype(x.dtype),
                   precision=get_precision(),
                   preferred_element_type=jnp.float32)
    sp = reflection_pad1d(s, pad)
    y = None
    for j in range(k):
        yj = sp[:, j: j + t, j]
        y = yj if y is None else y + yj
    return jnp.tanh(y + b[0])[..., None]


def apply(params: dict, mel: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    """mel: [B, T, n_mels] (normalized, +-4 domain, tail-padded).
    Returns waveform [B, T*441, 1] in [-1, 1].

    In production precision (ops.precision DEFAULT) the streaming
    activations are stored bf16 — the late stages are HBM-bandwidth-bound,
    so storage dtype sets throughput; matmuls still accumulate fp32. Parity
    mode (HIGHEST) keeps everything fp32."""
    from voicefixer_tpu.parallel.tp import constrain_channels
    adt = activation_dtype()
    if adt != mel.dtype:
        params = jax.tree.map(lambda p: p.astype(adt), params)
    x = mel.astype(adt)
    # condnet: 5x (conv k3 pad1 + ELU) (generator.py:33-54)
    for layer in params["condnet"]:
        x = constrain_channels(elu(conv1d(x, layer["w"], layer["b"],
                                          padding=1)))
    # pre conv: reflection pad 3 + k7 (generator.py:74-76)
    x = conv1d(reflection_pad1d(x, 3), params["pre"]["w"], params["pre"]["b"])
    x = constrain_channels(leaky_relu(x, cfg.leaky_slope_act))
    for i, stage in enumerate(params["stages"]):
        fused = _up_res_stage(stage, x, cfg.upsample_scales[i],
                              cfg.resstack_kernel[i], cfg)
        if fused is not None:
            x = constrain_channels(fused)
            continue
        x = constrain_channels(
            _upsample(stage["up"], x, cfg.upsample_scales[i]))
        x, activated = _res_stack(stage["res"], x, cfg.resstack_kernel[i],
                                  cfg.leaky_slope_res,
                                  final_slope=cfg.leaky_slope_act)
        if not activated:
            x = leaky_relu(x, cfg.leaky_slope_act)
        x = constrain_channels(x)
    return _post_conv(params["post"], x).astype(mel.dtype)


def _up_res_stage(stage: dict, x: jnp.ndarray, scale: int, kernel: int,
                  cfg: VocoderConfig):
    """Dispatch one (UpsampleNet, ResStack, LeakyReLU) stage to the fused
    streaming kernel (kernels.resstack.up_res_stack) when eligible; None
    falls back to the separate paths. The fused kernel keeps the full-rate
    upsampled signal out of HBM entirely — measured r4 motivation: the
    standalone up3 kernel + the C=64 fold glue cost ~7.5 ms of the 30 s
    chunk's 69.6 ms against <1.5 ms of roofline."""
    from voicefixer_tpu import kernels
    if not (kernels.use("resstack") and kernels.use("upsample")):
        return None
    from voicefixer_tpu.kernels.resstack import up_res_stack
    return up_res_stack(stage["up"], stage["res"], x, scale, kernel,
                        cfg.leaky_slope_res,
                        final_slope=cfg.leaky_slope_act,
                        matmul_dtype=kernels.matmul_dtype())


def init(key, cfg: VocoderConfig, dtype=jnp.float32) -> dict:
    kit = iter(jax.random.split(key, 200))

    def conv(ci, co, k):
        scale = float(np.sqrt(1.0 / (ci * k)))
        return {"w": jax.random.uniform(next(kit), (k, ci, co), dtype,
                                        -scale, scale),
                "b": jnp.zeros((co,), dtype)}

    ch = cfg.channels
    params = {
        "condnet": [conv(cfg.in_channels if i == 0 else cfg.cond_channels,
                         cfg.cond_channels, 3) for i in range(5)],
        "pre": conv(cfg.cond_channels, ch, 7),
        "stages": [],
        "post": conv(ch // 16, cfg.out_channels, 7),
    }
    for i, s in enumerate(cfg.upsample_scales):
        ci, co = ch // (2 ** i), ch // (2 ** (i + 1))
        stage = {
            "up": conv(ci, co, 2 * s),
            "res": [{"c1": conv(co, co, cfg.resstack_kernel[i]),
                     "c2": conv(co, co, cfg.resstack_kernel[i])}
                    for _ in range(cfg.resstack_depth[i])],
        }
        params["stages"].append(stage)
    return params
