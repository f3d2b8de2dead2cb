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
               scale: int, pad: int, co_blk: int, acc_dtype,
               double_buffer: bool):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(2)  # innermost: time tiles
    n_blk = pl.num_programs(2)

    def copy_in(b, t, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * t_tile, t_tile + 16), :],
            x_s.at[slot], sem.at[slot])

    if double_buffer:
        # double-buffered input stream: prefetch tile t+1 while computing t
        # (restarts per (batch, co-block) sweep — co blocks exist only on
        # the tiny stage-0 shape)
        slot = jax.lax.rem(t_idx, 2)

        @pl.when(t_idx == 0)
        def _():
            copy_in(b_idx, 0, 0).start()

        @pl.when(t_idx + 1 < n_blk)
        def _():
            copy_in(b_idx, t_idx + 1, 1 - slot).start()

        copy_in(b_idx, t_idx, slot).wait()
    else:
        # interpret mode: pl.when branches cannot hold DMA primitives on
        # the CPU interpreter — use a blocking copy.
        slot = 0
        copy_in(b_idx, t_idx, 0).start()
        copy_in(b_idx, t_idx, 0).wait()

    # fp32 for the VPU transcendental; activation dtype only governs
    # HBM storage / DMA traffic.
    x = x_s[slot].astype(jnp.float32)  # [TT+16, Cin], x[l] = t0 - 8 + l
    a = (x + jnp.sin(x)).astype(acc_dtype)
    co = co_blk
    # fp32 operands must request HIGHEST or the MXU silently truncates to
    # one bf16 pass (jnp.dot's default precision).
    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # Polyphase group q = t0 + m needs a[q] (lo taps) and a[q-1] (hi taps):
    # two matmuls on shifted views of the NARROW input (Cin lanes) — far
    # less VPU relayout than shifting/reshaping the s*Cout-wide product
    # (round-2 measurement: 7.9 ms for stage 3 vs ~1 ms of compute+traffic).
    # Two dots rather than one lane-concat K=2Cin dot: Mosaic's concatenate
    # cannot merge operands with different sublane offsets.
    cin_dim = a.shape[1]
    z = (jnp.dot(a[8: t_tile + 8], w_ref[0, :cin_dim], precision=prec,
                 preferred_element_type=jnp.float32)
         + jnp.dot(a[7: t_tile + 7], w_ref[0, cin_dim:], precision=prec,
                   preferred_element_type=jnp.float32))  # [TT, s*Cout_blk]
    # z's row-major [m, (rho, co)] bytes ARE the interleaved time series
    # [(m*s + rho), co]: the kernel writes it untouched and the caller's
    # reshape is a free metadata change — no in-VMEM interleave at all.
    out_ref[0, 0, :, :] = (z + b_ref[0]).astype(out_ref.dtype)


def _pack_weights(w: jnp.ndarray, co_blk: int):
    """[2s, Cin, Cout] torch tap order -> [n_co, 2*Cin, s*co_blk]: rows
    0:Cin hold the lo taps (0..s-1, multiplying a[q]), rows Cin:2Cin the hi
    taps (s..2s-1, multiplying a[q-1]); columns are [phase0 | ... |
    phase_{s-1}] per co block, matching the kernel's K=2Cin matmul and its
    per-phase lane slices."""
    k, cin, cout = w.shape
    s = k // 2
    n_co = cout // co_blk
    # [2s, Cin, n_co, co_blk] -> [n_co, 2(lo/hi), Cin, s, co_blk]
    wb = w.reshape(2, s, cin, n_co, co_blk).transpose(3, 0, 2, 1, 4)
    return wb.reshape(n_co, 2 * cin, s * co_blk)


VMEM_BUDGET = 12 * 1024 * 1024


def plan(cin: int, cout: int, scale: int, t_tile: int,
         isz: int = 2, wsz: int = 2):
    """(t_tile, co_blk) fitting the VMEM budget, or None when even the
    minimum (tile 128, 128-lane Cout block) cannot fit — wide-channel
    stages fall back to the jax polyphase path.

    Footprint at TRUE dtype sizes (isz = activation bytes, wsz = matmul
    bytes): double-buffered x scratch, the fp32 cast + activated copy,
    fp32 z, triple-buffered out, ONE resident weight bank (its index map
    is grid-constant, so Pallas keeps a single copy). The r4 model
    charged everything at 4 bytes and double-counted the weights, which
    at the production stage-1 shape (1024x14x512 -> wait, 512->256 x7)
    forced (tile 256, co_blk 128, n_co 2): TWO full input sweeps plus an
    XLA lane concat of two full-rate halves. Preferring a full-Cout
    block over a larger tile (the co_blk > 128 test runs FIRST) keeps
    n_co == 1 for every production stage."""
    t_cap = max(128, t_tile)

    def fits(tt, co_blk):
        length = tt + 16
        return (2 * length * cin * isz                    # x_s double buffer
                + length * cin * 4                        # fp32 cast
                + length * cin * wsz                      # activated a
                + tt * scale * co_blk * 4                 # fp32 z
                + 3 * tt * scale * co_blk * isz           # out (pipelined)
                + 2 * cin * scale * co_blk * wsz          # weight bank
                ) <= VMEM_BUDGET
    co_blk = cout
    while co_blk >= 128 or co_blk == cout:
        tt = t_cap
        while tt >= 128:
            if fits(tt, co_blk):
                return tt, co_blk
            tt //= 2
        if co_blk > 128 and co_blk % 2 == 0:
            co_blk //= 2
        else:
            return None
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

    planned = plan(cin, cout, scale, t_tile,
                   isz=jnp.dtype(x.dtype).itemsize,
                   wsz=jnp.dtype(matmul_dtype).itemsize) \
        if not interpret else (min(t_tile, max(8, t_total)), cout)
    if planned is None:
        from voicefixer_tpu.ops.conv import conv_transpose1d
        a = x + jnp.sin(x)
        return conv_transpose1d(a, w, b, stride=scale, padding=pad,
                                output_padding=scale % 2)
    t_tile, co_blk = planned

    t_tile = min(t_tile, max(8, t_total))
    t_tile = -(-t_tile // 8) * 8  # Mosaic sublane tiling
    # +1: the p-shift makes the last out_len samples reach polyphase group
    # q = t_total (a zero-padded x row), so the grid must cover it
    n_blk = pl.cdiv(t_total + 1, t_tile)
    t_pad = n_blk * t_tile
    # 8-sample halo each side (only 1 is semantically needed; the rest is
    # Mosaic tiling margin). Padded zeros stay zero through x+sin(x),
    # matching the transposed conv's implicit zero taps.
    x_p = jnp.pad(x, ((0, 0), (8, 8 + t_pad - t_total), (0, 0)))

    co_blk = min(co_blk, cout)
    n_co = cout // co_blk
    wk = _pack_weights(w.astype(matmul_dtype), co_blk)
    # bias per output column (rho-major, co within): tile co block s times
    bk = jnp.tile(b.reshape(n_co, 1, co_blk), (1, 1, scale))

    kernel = functools.partial(_up_kernel, t_tile=t_tile, scale=scale,
                               pad=pad, co_blk=co_blk, acc_dtype=matmul_dtype,
                               double_buffer=not interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_co, n_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2 * cin, scale * co_blk),
                         lambda i, c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, scale * co_blk), lambda i, c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t_tile, scale * co_blk),
                               lambda i, c, j: (i, c, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_co, t_pad, scale * co_blk),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p, wk, bk)
    # [B, n_co, t_pad, s*co_blk] rows are already the interleaved series per
    # co block: the reshape is free (row-major identical); the co-block
    # interleave transpose only exists when n_co > 1 (stage 0, tiny T).
    out = out.reshape(bsz, n_co, t_pad * scale, co_blk)
    out = out[:, 0] if n_co == 1 else jnp.concatenate(
        [out[:, c] for c in range(n_co)], axis=-1)
    out_len = (t_total - 1) * scale - 2 * pad + k + (scale % 2)
    return out[:, pad: pad + out_len, :]
