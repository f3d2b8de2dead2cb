"""Fused UpsampleNet stage: y = ConvTranspose1d(x + sin(x), k=2s, stride=s,
p=s//2+s%2, op=s%2).

Reference: /root/reference/voicefixer/vocoder/model/modules.py:449-517
(effective path — the discarded skip_conv branch is not computed).

With k = 2s every output sample is the sum of exactly two polyphase taps:
    z[q*s + rho] = a[q] @ W[rho] + a[q-1] @ W[rho + s],   a = x + sin(x)
    y = z[p : p + s*T]
The kernel DMAs a time tile plus a 1-sample halo from HBM, computes both tap
banks as one [TT+2, Cin] x [Cin, 2s*Cout] MXU matmul, does the polyphase
overlap-add and the p-shift in VMEM, and writes only the final [TT*s, Cout]
tile — the jax path (ops.conv.conv_transpose1d) materializes the full
pre-shift z in HBM and slices it.

Weight layout fed to the kernel: [Cin, 2s*Cout] where column block rho*Cout
holds torch_w[rho] (tap order, not flipped), blocked over Cout when the
bank exceeds the VMEM budget (stage 1: 1024 x 14 x 512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up_kernel(x_hbm, w_ref, b_ref, out_ref, x_s, sem, *, t_tile: int,
               scale: int, pad: int, co_blk: int, acc_dtype):
    t_idx = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(t_idx * t_tile, t_tile + 16), :],
        x_s, sem)
    copy.start()
    copy.wait()

    # fp32 for the VPU transcendental; activation dtype only governs
    # HBM storage / DMA traffic.
    x = x_s[:].astype(jnp.float32)     # [TT+16, Cin], x[l] = t0 - 8 + l
    a = x + jnp.sin(x)
    co = co_blk
    # fp32 operands must request HIGHEST or the MXU silently truncates to
    # one bf16 pass (jnp.dot's default precision).
    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    z2 = jnp.dot(a.astype(acc_dtype), w_ref[0], precision=prec,
                 preferred_element_type=jnp.float32)  # [TT+16, 2s*Cout_blk]
    lo = z2[:, :scale * co]
    hi = z2[:, scale * co:]
    # s*Cout chunk for polyphase group q = t0 + m, m in [0, TT+8):
    # z[m] = a[q] @ W_lo + a[q-1] @ W_hi = lo[m+8] + hi[m+7]. The 8-sample
    # margins keep every sublane slice shape a multiple of Mosaic tiling;
    # only m in [0, TT+1) is consumed after the p-shift below.
    z = lo[8:t_tile + 16] + hi[7:t_tile + 15]        # [TT+8, s*Cout_blk]
    z = z.reshape((t_tile + 8) * scale, co)
    out_ref[0, :, :] = (z[pad:pad + t_tile * scale] +
                        b_ref[0]).astype(out_ref.dtype)


def _pack_weights(w: jnp.ndarray, co_blk: int):
    """[2s, Cin, Cout] torch tap order -> [n_co, Cin, 2s*co_blk] where the
    column layout per block is [tap0 | tap1 | ... | tap_{2s-1}] and the lo
    half (taps 0..s-1) / hi half (taps s..2s-1) are contiguous so
    z.reshape interleaves polyphase branches correctly."""
    k, cin, cout = w.shape
    n_co = cout // co_blk
    # [2s, Cin, n_co, co_blk] -> [n_co, Cin, 2s, co_blk]
    wb = w.reshape(k, cin, n_co, co_blk).transpose(2, 1, 0, 3)
    return wb.reshape(n_co, cin, k * co_blk)


VMEM_BUDGET = 12 * 1024 * 1024


def plan(cin: int, cout: int, scale: int, t_tile: int):
    """(t_tile, co_blk) fitting the VMEM budget, or None when even the
    minimum (tile 128, 128-lane Cout block) cannot fit — wide-channel
    stages fall back to the jax polyphase path. Footprint: x scratch +
    sin value (L*Cin), z2 + z, triple-buffered out, double-buffered
    weight bank."""
    co_blk = cout
    t_tile = max(128, t_tile)
    while True:
        length = t_tile + 16
        need = 4 * (2 * length * cin
                    + length * 2 * scale * co_blk           # z2
                    + (t_tile + 8) * scale * co_blk         # z
                    + 3 * t_tile * scale * co_blk           # out
                    + 2 * cin * 2 * scale * co_blk)         # weights
        if need <= VMEM_BUDGET:
            return t_tile, co_blk
        if co_blk > 128 and co_blk % 2 == 0:
            co_blk //= 2
        elif t_tile > 128:
            t_tile //= 2
        else:
            return None


@functools.partial(jax.jit, static_argnames=("scale", "t_tile",
                                             "matmul_dtype", "interpret"))
def upsample(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, scale: int,
             t_tile: int = 2048, matmul_dtype=jnp.float32,
             interpret: bool = False) -> jnp.ndarray:
    """x: [B, T, Cin]; w: [2s, Cin, Cout] torch tap order; returns
    [B, T*s, Cout] (torch output length (T-1)s - 2p + 2s + op = T*s)."""
    bsz, t_total, cin = x.shape
    k, _, cout = w.shape
    assert k == 2 * scale
    pad = scale // 2 + scale % 2
    if cout < 128 and not interpret:
        # Mosaic lane tiling needs a 128-wide minor dim; zero-padded output
        # channels are exact (zero weights/bias) and sliced off below.
        pc = 128 - cout
        out = upsample(x, jnp.pad(w, ((0, 0), (0, 0), (0, pc))),
                       jnp.pad(b, (0, pc)), scale, t_tile=t_tile,
                       matmul_dtype=matmul_dtype, interpret=interpret)
        return out[..., :cout]

    planned = plan(cin, cout, scale, t_tile) if not interpret else \
        (min(t_tile, max(8, t_total)), cout)
    if planned is None:
        from voicefixer_tpu.ops.conv import conv_transpose1d
        a = x + jnp.sin(x)
        return conv_transpose1d(a, w, b, stride=scale, padding=pad,
                                output_padding=scale % 2)
    t_tile, co_blk = planned

    t_tile = min(t_tile, max(8, t_total))
    t_tile = -(-t_tile // 8) * 8  # Mosaic sublane tiling
    n_blk = pl.cdiv(t_total, t_tile)
    t_pad = n_blk * t_tile
    # 8-sample halo each side (only 1 is semantically needed; the rest is
    # Mosaic tiling margin). Padded zeros stay zero through x+sin(x),
    # matching the transposed conv's implicit zero taps.
    x_p = jnp.pad(x, ((0, 0), (8, 8 + t_pad - t_total), (0, 0)))

    co_blk = min(co_blk, cout)
    n_co = cout // co_blk
    wk = _pack_weights(w.astype(matmul_dtype), co_blk)
    bk = b.reshape(n_co, 1, co_blk)

    kernel = functools.partial(_up_kernel, t_tile=t_tile, scale=scale,
                               pad=pad, co_blk=co_blk, acc_dtype=matmul_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk, n_co),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, cin, k * co_blk), lambda i, j, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, co_blk), lambda i, j, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile * scale, co_blk),
                               lambda i, j, c: (i, j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad * scale, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_p, wk, bk)
    return out[:, :t_total * scale, :]
