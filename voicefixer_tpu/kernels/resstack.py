"""Fused dilated residual block: y = x + C2(lrelu(C1(lrelu(x)))).

Reference semantics: /root/reference/voicefixer/vocoder/model/modules.py
:550-595 (ResStack layer i): conv k3 dilation 3^(i%10) 'same' zero padding,
then conv k3 dilation 1, leaky-relu 0.2 before each conv, residual add.

The jax path (models/vocoder._res_stack) emits two lax convs per layer; each
is its own HBM round trip for x/h/y. This kernel does the whole block in one
pass: a time tile plus a (d+1)-sample halo is DMA'd from HBM into VMEM, both
convs run as stacked [T, 3C] x [3C, C] MXU matmuls on-chip, and only the
final y tile is written back. For the vocoder's late stages (C=64..128,
T up to 1.3 M samples per 30 s chunk) the op is HBM-bandwidth-bound, so the
~(2d/TT) halo recompute buys a ~2x traffic reduction.

Zero 'same' padding is reproduced by zero-padding x outside [0, T) (leaky
relu preserves 0) and masking h to exactly 0 there before the second conv —
conv zero-padding pads the conv *input*, not the bias-shifted output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                  x_s, sem, *, t_tile: int, halo: int, dil: int,
                  t_total: int, slope: float, acc_dtype,
                  double_buffer: bool):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)
    length = t_tile + 2 * halo

    def copy_in(blk, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(blk * t_tile, length), :],
            x_s.at[slot], sem.at[slot])

    if double_buffer:
        # Double-buffered input stream: slot j%2 was prefetched by the
        # previous grid step (slot 0 is started here on step 0); this step
        # starts the prefetch of block j+1 into the other slot before
        # computing, hiding the HBM->VMEM latency behind the matmuls.
        slot = jax.lax.rem(t_idx, 2)

        @pl.when(t_idx == 0)
        def _():
            copy_in(0, 0).start()

        @pl.when(t_idx + 1 < n_blk)
        def _():
            copy_in(t_idx + 1, 1 - slot).start()

        copy_in(t_idx, slot).wait()
    else:
        # interpret mode: pl.when branches cannot contain program_id/DMA
        # primitives on the CPU interpreter — use a blocking copy.
        slot = 0
        copy_in(t_idx, 0).start()
        copy_in(t_idx, 0).wait()

    ch = x_s.shape[2]
    # VPU elementwise math runs fp32 (Mosaic lacks bf16 compare on v5e);
    # the activation dtype only governs HBM storage / DMA traffic.
    x = x_s[slot].astype(jnp.float32)              # [L, C]
    a = jnp.where(x > 0, x, slope * x)             # leaky_relu
    # First conv (k=3, dilation d) over the extended range
    # [t0-8, t0+TT+8): the 8-sample margins keep every sublane slice shape
    # a multiple of Mosaic's tiling; the second conv only consumes the
    # inner [t0-1, t0+TT+1). Mosaic cannot concat sublane-shifted slices,
    # so the stacked [TTh, 3C] matmul is three shifted dots summed (same
    # MXU work).
    tth = t_tile + 16

    # fp32 operands must request HIGHEST or the MXU silently truncates to
    # one bf16 pass (jnp.dot's default precision); bf16 operands take the
    # native single pass either way.
    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def conv3(src, w_ref, shift):
        acc = None
        for j in range(3):
            s0 = halo - 8 + (j - 1) * shift
            sl = src[s0: s0 + tth]
            d = jnp.dot(sl.astype(acc_dtype), w_ref[pl.ds(j * ch, ch), :],
                        preferred_element_type=jnp.float32, precision=prec)
            acc = d if acc is None else acc + d
        return acc

    h = conv3(a, w1_ref, dil) + b1_ref[:]          # h[l] = t0 - 8 + l
    # Mask h to zero outside the real signal range (conv 'same' zero pad).
    p = t_idx * t_tile - 8 + jax.lax.broadcasted_iota(
        jnp.int32, (tth, 1), 0)
    h = jnp.where((p >= 0) & (p < t_total), h, 0.0)
    h = jnp.where(h > 0, h, slope * h)
    y = None
    for j in range(3):
        d = jnp.dot(h[7 + j:7 + j + t_tile].astype(acc_dtype),
                    w2_ref[pl.ds(j * ch, ch), :],
                    preferred_element_type=jnp.float32, precision=prec)
        y = d if y is None else y + d
    y = y + b2_ref[:]
    out_ref[0, :, :] = (x[halo:halo + t_tile] + y).astype(out_ref.dtype)


def _stack_w(w):
    """[3, Cin, Cout] torch-tap-order conv weight -> [3*Cin, Cout] for the
    concatenated-slices matmul (tap j multiplies x[t + (j-1)*d])."""
    k, ci, co = w.shape
    return w.reshape(k * ci, co)


VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB limit


def plan_tile(ch: int, dil: int, t_tile: int, itemsize: int = 4
              ) -> int | None:
    """Largest tile <= t_tile whose VMEM footprint fits, or None if even the
    smallest sensible tile cannot fit (wide channels x huge dilation — the
    jax conv path handles those layers). Footprint model: double-buffered
    x stream (2 x L*C, activation itemsize) + fp32 lrelu value (L*C),
    h + activated h (TTh*C, fp32 accumulators), y + double-buffered out
    (3*TT*C), two stacked weight banks (activation itemsize)."""
    halo = -(-(dil + 8) // 8) * 8
    while t_tile >= 256:
        length = t_tile + 2 * halo
        tth = t_tile + 16
        need = (itemsize * (2 * length * ch + 2 * 3 * ch * ch
                            + 2 * t_tile * ch)
                + 4 * (length * ch + 2 * tth * ch + t_tile * ch))
        if need <= VMEM_BUDGET:
            return t_tile
        t_tile //= 2
    return None


@functools.partial(jax.jit, static_argnames=("dil", "slope", "t_tile",
                                             "matmul_dtype", "interpret"))
def res_block(x: jnp.ndarray, w1, b1, w2, b2, dil: int,
              slope: float = 0.2, t_tile: int = 2048,
              matmul_dtype=jnp.float32, interpret: bool = False):
    """x: [B, T, C]; w1/w2: [3, C, C] (taps, in, out); returns [B, T, C]."""
    bsz, t_total, ch = x.shape
    if ch < 128:
        # Mosaic lane tiling needs a 128-wide minor dim; zero-padded
        # channels stay exactly zero through both convs + residual.
        pc = 128 - ch
        out = res_block(
            jnp.pad(x, ((0, 0), (0, 0), (0, pc))),
            jnp.pad(w1, ((0, 0), (0, pc), (0, pc))),
            jnp.pad(b1, (0, pc)),
            jnp.pad(w2, ((0, 0), (0, pc), (0, pc))),
            jnp.pad(b2, (0, pc)),
            dil=dil, slope=slope, t_tile=t_tile,
            matmul_dtype=matmul_dtype, interpret=interpret)
        return out[..., :ch]
    # dil for conv1's taps + >=8-sample margin, rounded so the DMA slice
    # length TT + 2*halo stays a multiple of Mosaic's sublane tiling
    halo = -(-(dil + 8) // 8) * 8
    if not interpret:
        # re-plan against the actual (possibly lane-padded) channel count —
        # the caller may have planned with the pre-padding width
        planned = plan_tile(ch, dil, t_tile, x.dtype.itemsize)
        if planned is None:
            raise ValueError(
                f"res_block cannot fit VMEM for C={ch}, dil={dil}; "
                "caller should use the jax conv path (plan_tile -> None)")
        t_tile = planned
    t_tile = min(t_tile, max(8, t_total))
    t_tile = -(-t_tile // 8) * 8  # Mosaic sublane tiling
    n_blk = pl.cdiv(t_total, t_tile)
    t_pad = n_blk * t_tile
    x_p = jnp.pad(x, ((0, 0), (halo, halo + t_pad - t_total), (0, 0)))

    kernel = functools.partial(
        _block_kernel, t_tile=t_tile, halo=halo, dil=dil, t_total=t_total,
        slope=slope, acc_dtype=matmul_dtype, double_buffer=not interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3 * ch, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * ch, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, ch), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + 2 * halo, ch), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p,
      _stack_w(w1).astype(matmul_dtype), b1.reshape(1, ch),
      _stack_w(w2).astype(matmul_dtype), b2.reshape(1, ch))
    return out[:, :t_total, :]


def res_stack(params: list, x: jnp.ndarray, kernel: int, slope: float,
              t_tile: int = 8192, matmul_dtype=jnp.float32,
              interpret: bool = False) -> jnp.ndarray:
    """Full depth-8 ResStack via the fused block kernel, falling back to the
    jax conv path for layers whose (channels, dilation) cannot fit VMEM
    (e.g. C=512 with dil >= 729). Drop-in for models.vocoder._res_stack
    (k=3 only — the production config).

    Channels < 128 (the vocoder's final stage, C=64, also the longest
    signal) are lane-padded to 128 ONCE for the whole stack — zero-padded
    channels stay exactly zero through leaky-relu/conv/residual, and doing
    it per-block would add two full-rate HBM copies per layer."""
    assert kernel == 3, "fused kernel supports k=3 (production config)"
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu
    ch_orig = x.shape[-1]
    pc = 128 - ch_orig if ch_orig < 128 else 0
    if pc:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pc)))
    ch = x.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    for i, layer in enumerate(params):
        dil = 3 ** (i % 10)
        w1, b1 = layer["c1"]["w"], layer["c1"]["b"]
        w2, b2 = layer["c2"]["w"], layer["c2"]["b"]
        tile = plan_tile(ch, dil, t_tile, itemsize)
        if tile is None and not interpret:
            # wide-channel, huge-dilation layers (pc == 0 there): plain convs
            h = leaky_relu(x, slope)
            h = conv1d(h, w1, b1, padding=dil, dilation=dil)
            h = leaky_relu(h, slope)
            x = x + conv1d(h, w2, b2, padding=1)
            continue
        if pc:
            w1 = jnp.pad(w1, ((0, 0), (0, pc), (0, pc)))
            w2 = jnp.pad(w2, ((0, 0), (0, pc), (0, pc)))
            b1 = jnp.pad(b1, (0, pc))
            b2 = jnp.pad(b2, (0, pc))
        x = res_block(x, w1, b1, w2, b2, dil=dil,
                      slope=slope, t_tile=tile or t_tile,
                      matmul_dtype=matmul_dtype, interpret=interpret)
    return x[..., :ch_orig] if pc else x
