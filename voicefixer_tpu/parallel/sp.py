"""Sequence-parallel vocoder synthesis: the generator's TIME axis sharded
over the mesh's "model" axis, with halo exchange via `lax.ppermute` inside
one `shard_map`.

Why sequence instead of channel parallelism for this model: the vocoder is
narrow (64-512 channels) and LONG (1.3 M samples per 30 s chunk), so
channel-sharded convs would psum a full-rate [T, C] activation per conv —
more ICI bytes than the FLOPs they save — and a channel-sharded array
cannot enter the fused Pallas kernels, which are single-device programs.
Time sharding gives each chip T/n of every stage's work, communicates only
receptive-field halos (a few thousand rows per boundary per stage), and
each shard runs the SAME fused kernels as a single chip. This is the
device-side realization of the SURVEY §5 long-form north star — the
sequence dimension is shardable because everything is convolutional with
finite reach (reference chunking: /root/reference/voicefixer/base.py
:117-138; vocoder: /root/reference/voicefixer/vocoder/model/generator.py
:72-100, which has no parallelism at all).

Exactness, piece by piece:
- Interior shard boundaries: every stage computes on [halo | local | halo]
  and keeps the center; the halo covers the stage's receptive reach, so
  the center equals the unsharded computation.
- Global edges: `ppermute` fills absent-neighbor halos with ZEROS —
  exactly the zero 'same' padding the reference convs assume beyond the
  signal.
- The divisibility pad: the condnet output is zero-padded so the time axis
  divides the axis size. Those rows are NOT silence to the generator
  (biases propagate), so every ResStack receives a TRACED [lo, hi) signal
  window (mask_bounds) and treats outside positions as conv zero padding
  at every block — the same masking the kernels already do for their own
  tile padding, now with shard-dependent bounds.
- The final k7 output conv's REFLECTION padding is the one non-local op;
  its effect is confined to the outermost 3 samples per side of the GLOBAL
  waveform, which are recomputed exactly outside the shard_map from
  returned edge slices.

tests/test_sp.py pins apply_sp == models.vocoder.apply on a CPU mesh.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw.pop("check_rep", None)
        return _shard_map(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

from voicefixer_tpu.config import VocoderConfig

_IN_SHARD_MAP: contextvars.ContextVar = contextvars.ContextVar(
    "vf_sp_in_shard_map", default=False)


def in_shard_map() -> bool:
    """True while tracing a shard_map body whose arrays are shard-local —
    the Pallas kernels are safe (and wanted) there even under a
    model-parallel mesh (kernels.enabled consults this)."""
    return _IN_SHARD_MAP.get()


@contextlib.contextmanager
def shard_local():
    token = _IN_SHARD_MAP.set(True)
    try:
        yield
    finally:
        _IN_SHARD_MAP.reset(token)


def exchange_halo(x: jnp.ndarray, h: int, axis: str) -> jnp.ndarray:
    """[B, T_loc, C] -> [B, T_loc + 2h, C] with h rows from each neighbor
    along `axis`, multi-hop when the halo exceeds one shard (h > T_loc).
    Mesh-edge devices receive ZEROS (ppermute fills absent sources)."""
    n = lax.axis_size(axis)
    t_loc = x.shape[1]
    if n == 1 or h == 0:
        return jnp.pad(x, ((0, 0), (h, h), (0, 0)))
    k = -(-h // t_loc)  # hops needed to cover the halo
    lperm = [(i, i + 1) for i in range(n - 1)]
    rperm = [(i + 1, i) for i in range(n - 1)]
    lblocks, rblocks = [], []
    lcur = rcur = x
    for _ in range(k):
        lcur = lax.ppermute(lcur, axis, lperm)   # from left neighbor
        rcur = lax.ppermute(rcur, axis, rperm)   # from right neighbor
        lblocks.insert(0, lcur)
        rblocks.append(rcur)
    lcat = jnp.concatenate(lblocks, axis=1)      # global [o - k*T_loc, o)
    rcat = jnp.concatenate(rblocks, axis=1)      # global [o + T_loc, ...)
    return jnp.concatenate(
        [lcat[:, k * t_loc - h:, :], x, rcat[:, :h, :]], axis=1)


def _upsample_local(params: dict, x: jnp.ndarray, scale: int,
                    axis: str) -> jnp.ndarray:
    """UpsampleNet on a time shard: with a 1-row halo each side, the local
    output rows are z[p : p + s*T_loc] of the polyphase form
      z[(m + q0)*s + rho] = a_ext[m] @ W[rho] + a_ext[m-1] @ W[rho + s]
    — torch ConvTranspose1d(k=2s, stride s, padding p=s//2+s%2,
    output_padding s%2) semantics per ops.conv.conv_transpose1d. Beyond-
    signal rows are zeros (masked by the previous stage), and x + sin(x)
    keeps them zero, matching the transposed conv's implicit zero taps."""
    w, b = params["w"], params["b"]  # [2s, Cin, Cout]
    k, cin, cout = w.shape
    s = scale
    pad = s // 2 + s % 2
    xe = exchange_halo(x, 1, axis)
    a = xe + jnp.sin(xe)
    t_loc = x.shape[1]
    from voicefixer_tpu.ops.precision import get_precision
    z = (jnp.einsum("btc,rco->btro", a[:, 1:], w[:s],
                    precision=get_precision())
         + jnp.einsum("btc,rco->btro", a[:, :-1], w[s:],
                      precision=get_precision()))
    z = z.reshape(x.shape[0], (t_loc + 1) * s, cout)
    return z[:, pad: pad + s * t_loc, :] + b


def apply_sp(params: dict, mel: jnp.ndarray, cfg: VocoderConfig,
             mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Sequence-parallel twin of models.vocoder.apply: mel [B, T, n_mels]
    (normalized, +-4 domain, tail-padded) -> wav [B, T*441, 1], numerically
    matching the single-device path.

    The cheap global-context prologue (condnet + reflection-padded pre
    conv, <2% of the FLOPs) runs replicated; the four (upsample, resstack)
    stages and the output conv run time-sharded over `axis` inside one
    shard_map, exchanging receptive-field halos between stages."""
    from voicefixer_tpu.models.vocoder import _res_stack
    from voicefixer_tpu.ops.conv import (conv1d, elu, leaky_relu,
                                         reflection_pad1d)
    from voicefixer_tpu.ops.precision import activation_dtype, get_precision

    n = mesh.shape[axis]
    adt = activation_dtype()
    if adt != mel.dtype:
        params = jax.tree.map(lambda p: p.astype(adt), params)
    x = mel.astype(adt)
    for layer in params["condnet"]:
        x = elu(conv1d(x, layer["w"], layer["b"], padding=1))
    x = conv1d(reflection_pad1d(x, 3), params["pre"]["w"],
               params["pre"]["b"])
    x = leaky_relu(x, cfg.leaky_slope_act)

    t0 = x.shape[1]
    t0p = -(-t0 // n) * n
    x = jnp.pad(x, ((0, 0), (0, t0p - t0), (0, 0)))
    t_loc0 = t0p // n
    up_total = 1
    for s in cfg.upsample_scales:
        up_total *= s
    w_post = params["post"]["w"]
    pad_post = (w_post.shape[0] - 1) // 2
    # signal-end offset inside the LAST shard at the full rate (static)
    end_off = t0 * up_total - (n - 1) * t_loc0 * up_total

    def body(xl, stages, post):
        with shard_local():
            idx = lax.axis_index(axis)
            t_loc, rate = t_loc0, 1
            for i, stage in enumerate(stages):
                xl = _upsample_local(stage["up"], xl,
                                     cfg.upsample_scales[i], axis)
                t_loc *= cfg.upsample_scales[i]
                rate *= cfg.upsample_scales[i]
                dils = tuple(3 ** (j % 10) for j in range(len(stage["res"])))
                reach = sum(d + 1 for d in dils)
                h = -(-reach // 8) * 8
                xe = exchange_halo(xl, h, axis)
                # signal window [0, t0*rate) in ext-array coordinates
                lo = h - idx * t_loc
                bounds = jnp.stack([lo, lo + t0 * rate])
                y, activated = _res_stack(stage["res"], xe,
                                          cfg.resstack_kernel[i],
                                          cfg.leaky_slope_res,
                                          final_slope=cfg.leaky_slope_act,
                                          mask_bounds=bounds)
                if not activated:
                    y = leaky_relu(y, cfg.leaky_slope_act)
                    # re-apply the signal window: the jax path's final
                    # activation ran on masked y, zeros stay zero
                xl = y[:, h: h + t_loc, :]
            # output conv with a zero halo; reflection handled by caller
            xe = exchange_halo(xl, pad_post, axis)
            t = xl.shape[1]
            y = None
            for j in range(w_post.shape[0]):
                yj = jnp.einsum("btc,c->bt", xe[:, j: j + t, :],
                                post["w"][j, :, 0],
                                precision=get_precision())
                y = yj if y is None else y + yj
            wav = jnp.tanh(y + post["b"][0])[..., None]
            head = xl[:, :8, :]
            tail = xl[:, end_off - 8: end_off, :]
        return wav, head, tail

    wav, heads, tails = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None),
                   P(None, axis, None)),
        check_rep=False,
    )(x, stage_params_list(params), params["post"])

    wav = wav[:, : t0 * up_total, :]

    # exact reflection-pad patch-up for the outermost pad_post samples of
    # the global waveform (reference: generator.py:95-99 ReflectionPad(3))
    def patch(edge, left: bool):
        xp = reflection_pad1d(edge, pad_post)
        seg = (xp[:, : 3 * pad_post, :] if left
               else xp[:, -3 * pad_post:, :])
        y = None
        for j in range(w_post.shape[0]):
            yj = jnp.einsum("btc,c->bt", seg[:, j: j + pad_post, :],
                            w_post[j, :, 0], precision=get_precision())
            y = yj if y is None else y + yj
        return jnp.tanh(y + params["post"]["b"][0])[..., None]

    head = heads[:, :8, :]          # shard 0's true head rows
    tail = tails[:, -8:, :]         # shard n-1's true signal-end rows
    wav = wav.at[:, :pad_post, :].set(patch(head, True))
    wav = wav.at[:, t0 * up_total - pad_post:, :].set(patch(tail, False))
    return wav.astype(mel.dtype)


def stage_params_list(params: dict) -> list:
    return [{"up": s["up"], "res": s["res"]} for s in params["stages"]]


def synthesize_sp(params: dict, mel: jnp.ndarray, cfg: VocoderConfig,
                  mesh: Mesh, divide_weight: bool = True,
                  axis: str = "model") -> jnp.ndarray:
    """Sequence-parallel twin of pipeline.vocoder_facade.synthesize
    (vocoder/base.py:42-56 semantics): linear analysis-convention mel
    [B, T, 128] -> wav [B, S, 1]."""
    from voicefixer_tpu.config import mel_weight_curve
    from voicefixer_tpu.ops.norm import vocoder_normalize_mel
    from voicefixer_tpu.pipeline.vocoder_facade import pad_tail

    if divide_weight:
        w = jnp.asarray(mel_weight_curve(cfg.num_mels), dtype=mel.dtype)
        mel = mel / w
    mel = vocoder_normalize_mel(mel, cfg)
    mel = pad_tail(mel, -cfg.max_abs_value)
    return apply_sp(params, mel, cfg, mesh, axis=axis)
