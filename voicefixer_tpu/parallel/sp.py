"""Sequence-parallel vocoder synthesis: the generator's TIME axis sharded
over the mesh's "model" axis, with halo exchange via `lax.ppermute` inside
one `shard_map`.

Why sequence instead of channel parallelism for this model: the vocoder is
narrow (64-512 channels) and LONG (1.3 M samples per 30 s chunk), so
channel-sharded convs would psum a full-rate [T, C] activation per conv —
more ICI bytes than the FLOPs they save — and a channel-sharded array
cannot enter the fused Pallas kernels, which are single-device programs.
Time sharding gives each chip T/n of every stage's work, communicates only
receptive-field halos (a few thousand frames per boundary), and each shard
runs the SAME fused kernels as a single chip. This is the device-side
realization of the SURVEY §5 long-form north star: the sequence dimension
is shardable because everything is convolutional with finite reach
(reference chunking: /root/reference/voicefixer/base.py:117-138; vocoder:
/root/reference/voicefixer/vocoder/model/generator.py:72-100).

Exactness: each stage computes on [halo | local | halo] and keeps the
center. `ppermute` fills the mesh-edge halos with ZEROS — exactly the
zero padding the reference convs assume beyond the signal — and interior
halos with the neighbor's real rows, so the kept center equals the
unsharded computation (tests/test_sp.py pins this on a CPU mesh). The only
non-local op is the final k7 output conv's REFLECTION padding, whose
global-edge effect is confined to the outermost 3 samples per side; those
are recomputed exactly outside the shard_map from returned edge slices.

The Pallas kernels stay enabled inside the shard_map body (in_shard_map()
below tells kernels.enabled() that arrays are shard-local), which is what
makes model-axis parallelism keep the fused path.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from voicefixer_tpu.config import VocoderConfig

_IN_SHARD_MAP: contextvars.ContextVar = contextvars.ContextVar(
    "vf_sp_in_shard_map", default=False)


def in_shard_map() -> bool:
    """True while tracing a shard_map body whose arrays are shard-local —
    the Pallas kernels are safe (and wanted) there even under a
    model-parallel mesh."""
    return _IN_SHARD_MAP.get()


@contextlib.contextmanager
def _shard_local():
    token = _IN_SHARD_MAP.set(True)
    try:
        yield
    finally:
        _IN_SHARD_MAP.reset(token)


def exchange_halo(x: jnp.ndarray, h: int, axis: str) -> jnp.ndarray:
    """[B, T_loc, C] -> [B, T_loc + 2h, C] with h rows from each neighbor
    along `axis`. Mesh-edge devices receive ZEROS (ppermute semantics for
    absent sources) — identical to the zero padding the convs assume
    beyond the global signal."""
    n = lax.axis_size(axis)
    if n == 1 or h == 0:
        return jnp.pad(x, ((0, 0), (h, h), (0, 0)))
    left = lax.ppermute(x[:, -h:, :], axis,
                        [(i, i + 1) for i in range(n - 1)])
    right = lax.ppermute(x[:, :h, :], axis,
                         [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([left, x, right], axis=1)


def _upsample_local(params: dict, x: jnp.ndarray, scale: int,
                    axis: str) -> jnp.ndarray:
    """UpsampleNet on a time shard: with a 1-row halo each side, the local
    polyphase output rows [p : p + s*T_loc] of
      z[(q+1)*s + rho] = a_ext[q+1] @ W[rho] + a_ext[q] @ W[rho + s]
    equal the global output rows [d*s*T_loc, (d+1)*s*T_loc)
    (ops.conv.conv_transpose1d's polyphase identity with k = 2s,
    p = s//2 + s%2; the reference's torch ConvTranspose1d semantics)."""
    w, b = params["w"], params["b"]  # [2s, Cin, Cout]
    k, cin, cout = w.shape
    s = scale
    pad = s // 2 + s % 2
    xe = exchange_halo(x, 1, axis)
    a = xe + jnp.sin(xe)
    t_loc = x.shape[1]
    from voicefixer_tpu.ops.precision import get_precision
    # z_rel[m, rho] covers polyphase groups q = d*T_loc - 1 + m, m in
    # [1, T_loc + 2); local output = z[global j + p], j' in [0, s*T_loc)
    # -> z_rel index j' + p relative to group m = 1.
    wlo = w[:s].reshape(s, cin, cout)   # taps rho (multiply a[q])
    whi = w[s:].reshape(s, cin, cout)   # taps rho + s (multiply a[q-1])
    z = (jnp.einsum("btc,rco->btro", a[:, 1:], wlo,
                    precision=get_precision())
         + jnp.einsum("btc,rco->btro", a[:, :-1], whi,
                      precision=get_precision()))
    z = z.reshape(x.shape[0], (t_loc + 1) * s, cout)
    return z[:, pad: pad + s * t_loc, :] + b


def _res_stack_local(params: list, x: jnp.ndarray, kernel: int,
                     slope: float, final_slope: float, axis: str):
    """Full ResStack on a time shard: exchange the stack's whole receptive
    reach once, run the fused kernels (or jax convs on CPU) on the extended
    array, keep the center. Inside the ext array the kernels' "zero outside
    my array" masking matches the global zero padding at mesh edges and is
    confined to the discarded halo in the interior."""
    from voicefixer_tpu.models.vocoder import _res_stack
    dils = tuple(3 ** (i % 10) for i in range(len(params)))
    reach = sum(d + 1 for d in dils)
    h = -(-reach // 8) * 8  # 8-aligned halo (Mosaic sublane tiling)
    xe = exchange_halo(x, h, axis)
    y, activated = _res_stack(params, xe, kernel, slope,
                              final_slope=final_slope)
    if not activated:
        from voicefixer_tpu.ops.conv import leaky_relu
        y = leaky_relu(y, final_slope)
    return y[:, h: h + x.shape[1], :]


def _post_conv_local(params: dict, x: jnp.ndarray, axis: str):
    """Output projection on a time shard (k7 conv C->1 + tanh), computed
    with a zero halo; the reflection-pad difference is confined to the
    outermost pad (=3) samples of the GLOBAL waveform, which the caller
    patches from the returned edge slices."""
    w, b = params["w"], params["b"]  # [K, C, 1], [1]
    k = w.shape[0]
    pad = (k - 1) // 2
    xe = exchange_halo(x, pad, axis)
    t = x.shape[1]
    from voicefixer_tpu.ops.precision import get_precision
    y = None
    for j in range(k):
        yj = jnp.einsum("btc,c->bt", xe[:, j: j + t, :], w[j, :, 0],
                        precision=get_precision())
        y = yj if y is None else y + yj
    return jnp.tanh(y + b[0])[..., None]


def apply_sp(params: dict, mel: jnp.ndarray, cfg: VocoderConfig,
             mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Sequence-parallel twin of models.vocoder.apply: mel [B, T, n_mels]
    (normalized, tail-padded) -> wav [B, T*441, 1], numerically matching
    the single-device path (tests/test_sp.py).

    The cheap global-context prologue (condnet + reflection-padded pre
    conv, <2% of the FLOPs) runs replicated; the four (upsample, resstack)
    stages and the output conv run time-sharded over `axis` inside one
    shard_map, exchanging receptive-field halos between stages.
    """
    from voicefixer_tpu.models.vocoder import _res_stack  # noqa: F401
    from voicefixer_tpu.ops.conv import (conv1d, elu, leaky_relu,
                                         reflection_pad1d)
    from voicefixer_tpu.ops.precision import activation_dtype

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
    t_pad = -(-t0 // n) * n - t0
    # trailing zero frames make T divide the axis; the extra synthesized
    # tail is cut after the shard_map (zero frames are NOT silent through
    # the generator, so the pad must be sliced off, not blended)
    x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))

    stage_params = [
        {"up": s["up"], "res": s["res"]} for s in params["stages"]
    ]

    def body(xl, stages, post):
        with _shard_local():
            for i, stage in enumerate(stages):
                xl = _upsample_local(stage["up"], xl,
                                     cfg.upsample_scales[i], axis)
                xl = _res_stack_local(stage["res"], xl,
                                      cfg.resstack_kernel[i],
                                      cfg.leaky_slope_res,
                                      cfg.leaky_slope_act, axis)
            wav = _post_conv_local(post, xl, axis)
            # edge rows for the caller's reflection-pad patch-up
            head = lax.dynamic_slice_in_dim(xl, 0, 8, 1)
            tail = lax.dynamic_slice_in_dim(xl, xl.shape[1] - 8, 8, 1)
        return wav, head, tail

    wav, heads, tails = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None),
                   P(None, axis, None)),
        check_rep=False,
    )(x, stage_params, params["post"])

    # exact reflection-pad patch-up for the outermost `pad` samples of the
    # global waveform (shard 0's head rows and shard n-1's tail rows)
    w, b = params["post"]["w"], params["post"]["b"]
    k = w.shape[0]
    pad = (k - 1) // 2
    from voicefixer_tpu.ops.precision import get_precision

    def patch(edge, left: bool):
        # edge: [B, 8, C] true boundary rows of the full-rate signal
        xp = reflection_pad1d(edge, pad)
        seg = xp[:, :2 * pad + k - 1] if left else xp[:, -(2 * pad + k - 1):]
        y = None
        for j in range(k):
            yj = jnp.einsum("btc,c->bt", seg[:, j: j + pad, :], w[j, :, 0],
                            precision=get_precision())
            y = yj if y is None else y + yj
        return jnp.tanh(y + b[0])[..., None]

    head = heads[:, :8, :]
    tail = tails[:, -8:, :]
    total = x.shape[1] * int(jnp.prod(jnp.asarray(cfg.upsample_scales)))
    wav = wav.at[:, :pad, :].set(patch(head, True))
    wav = wav.at[:, total - pad:, :].set(patch(tail, False))

    # cut the synthesized tail that came from the divisibility pad
    return wav[:, : t0 * total // x.shape[1], :].astype(mel.dtype)
