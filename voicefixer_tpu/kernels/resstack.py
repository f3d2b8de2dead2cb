"""Fused dilated residual chains: n consecutive ResStack blocks per kernel.

Reference semantics: /root/reference/voicefixer/vocoder/model/modules.py
:550-595 (ResStack layer i): y = x + C2(lrelu(C1(lrelu(x)))), C1 = conv k3
dilation 3^(i%10) 'same' zero padding, C2 = conv k3 dilation 1.

Round-1 ran one pallas_call per block: 16 full-rate HBM transfers per
depth-8 stack, plus per-call launch overhead, dominated the vocoder
(VERDICT r1 weak-1). This version chains consecutive blocks inside ONE
pallas_call: a time tile plus a Σ(dil_i+8)-sample halo is DMA'd into VMEM
once, every chained block computes over a shrinking valid width (block i
needs E[i] = E[i+1] + dil_i + 8 extra samples per side, 8-aligned for
Mosaic sublane tiling), intermediates are written back into the stream
buffer, and only the final tile leaves VMEM. Traffic for a depth-8 stack
drops from 16 to ~2×#groups transfers; the recompute overhead is the halo
ratio, which the planner bounds by requiring tile >= halo for chains.

VMEM buffers hold the activation dtype (bf16 in production): that is what
allows 4-8x larger tiles than round 1, which amortizes per-tile fixed costs
and caps the read amplification of the dilation-2187 blocks.

Zero 'same' padding is reproduced by masking both the first conv's output
h and each block's output y to exactly 0 outside [0, T): conv zero-padding
pads the conv *input*, and the next chained block consumes y as its input.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB limit
LANE = 128


def _ceil8(v: int) -> int:
    return -(-v // 8) * 8


def chain_extents(dils) -> tuple:
    """Per-boundary one-sided extents E[0..n]: E[n] = 0 (the output tile is
    exact), E[i] = ceil8(E[i+1] + d_i + 8) — block i's first conv reaches
    d_i beyond the 8-sample Mosaic margin of its h slab."""
    e = [0]
    for d in reversed(list(dils)):
        e.append(_ceil8(e[-1] + d + 8))
    return tuple(reversed(e))


def chain_vmem_bytes(ch: int, dils, t_tile: int, isz: int, wsz: int) -> int:
    """Upper-bound VMEM footprint model for one chained tile: the
    double-buffered input stream + pipelined output (activation dtype),
    the stacked weight banks, and the widest block's transient values
    (lrelu'd input `a`, fp32 conv1 slab h, its matmul-dtype cast, fp32 y)."""
    e = chain_extents(dils)
    stream = 2 * (t_tile + 2 * e[0]) * ch * isz
    out = 2 * t_tile * ch * isz
    wts = len(dils) * 2 * (3 * ch * ch + ch) * wsz
    peak = 0
    for i in range(len(dils)):
        a = (t_tile + 2 * e[i]) * ch * wsz
        h = (t_tile + 2 * e[i + 1] + 16) * ch * 4
        hb = (t_tile + 2 * e[i + 1] + 16) * ch * wsz
        y = (t_tile + 2 * e[i + 1]) * ch * 4
        peak = max(peak, a + h + hb + y)
    return stream + out + wts + peak


# achieved (not peak) rates to plan against, measured on v5e through this
# kernel: ~120 TFLOP/s bf16 MXU, ~600 GB/s effective HBM stream
_PLAN_FLOPS = 120e12
_PLAN_BW = 600e9
_PLAN_LAUNCH_S = 2e-5  # per-pallas_call fixed cost


def _group_cost(ch: int, sub, tt: int, isz: int) -> float:
    """Roofline seconds-per-sample for one chained tile: chaining trades
    HBM round trips between blocks for halo *recompute* (each chained block
    computes over tile + 2E[k+1] extra samples), so the planner charges the
    widened compute against the saved traffic."""
    e = chain_extents(sub)
    bytes_tile = (2 * tt + 2 * e[0]) * ch * isz
    flops_tile = sum((tt + 2 * e[k + 1] + 16) * 12 * ch * ch
                     for k in range(len(sub)))
    return max(flops_tile / _PLAN_FLOPS, bytes_tile / _PLAN_BW) / tt


def _shift_cost(ch: int, tt: int, isz: int) -> float:
    """Roofline seconds-per-sample for the shifted-tap single kernel: three
    tile-sized tap reads plus the output write — no d-sized halo read, no
    compute amplification beyond the 16-row slab margin."""
    bytes_tile = (3 * (tt + 24) + tt) * ch * isz
    flops_tile = (tt + 16) * 12 * ch * ch
    return max(flops_tile / _PLAN_FLOPS, bytes_tile / _PLAN_BW) / tt


def plan_chain(ch: int, dils, isz: int, wsz: int, t_cap: int = 8192,
               t_total: int = 200_000, allow_shift: bool = True) -> list:
    """Partition a dilation run into chained kernel groups by dynamic
    programming over a roofline cost model: small dilations chain (their
    halo recompute is cheap and the saved inter-block HBM round trips
    dominate), huge dilations run as singles (a single block has NO compute
    amplification — its halo is only extra input reads). Singles
    additionally compete with the shifted-tap kernel (res_shift_single,
    entry ("shift", tt)), whose three row-offset tile reads beat the
    contiguous halo read once the dilation rivals the tile — and which
    FITS VMEM where the halo design cannot (C=512 at dil 2187, the one
    remaining XLA-conv fallback until r5). Groups no kernel can fit fall
    back to the jax conv path, costed at ~4x the roofline so it is only
    picked when forced.

    Returns [(start, end, tile), ...] covering range(len(dils)), where
    tile is an int (chained), ("shift", tt), or None (jax fallback).
    allow_shift=False restricts singles to chained tiles (fold mode — the
    shift kernel has no fold_offset masking).
    """
    n = len(dils)
    fallback_cps = 4.0 * max(12 * ch * ch / _PLAN_FLOPS,
                             4 * ch * isz / _PLAN_BW)

    def options(i, j):
        """Best (tile, cost/sample) for group [i, j), or None if no fit."""
        sub = dils[i:j]
        # per-call fixed cost (launch + weight-bank DMA), amortized per
        # sample at tile size tt
        fixed = _PLAN_LAUNCH_S + len(sub) * 6 * ch * ch * wsz / _PLAN_BW
        best = None
        tt = t_cap
        while tt >= 256:
            if chain_vmem_bytes(ch, sub, tt, isz, wsz) <= VMEM_BUDGET:
                c = _group_cost(ch, sub, tt, isz) + fixed / tt
                if best is None or c < best[1]:
                    best = (tt, c)
            tt //= 2
        if allow_shift and j == i + 1:
            tt = t_cap
            while tt >= 256:
                if shift_vmem_bytes(ch, tt, isz, wsz) <= VMEM_BUDGET:
                    c = _shift_cost(ch, tt, isz) + fixed / tt
                    if best is None or c < best[1]:
                        best = (("shift", tt), c)
                tt //= 2
        return best

    INF = float("inf")
    best_cost = [INF] * (n + 1)
    best_cut = [None] * (n + 1)
    best_cost[n] = 0.0
    for i in reversed(range(n)):
        for j in range(i + 1, n + 1):
            opt = options(i, j)
            if opt is None:
                if j == i + 1:  # single that can't fit: jax fallback
                    c = fallback_cps + best_cost[j]
                    if c < best_cost[i]:
                        best_cost[i] = c
                        best_cut[i] = (j, None)
                continue
            c = opt[1] + best_cost[j]
            if c < best_cost[i]:
                best_cost[i] = c
                best_cut[i] = (j, opt[0])
    groups = []
    i = 0
    while i < n:
        j, tt = best_cut[i]
        groups.append((i, j, tt))
        i = j
    return groups


def _chain_kernel(*refs, t_tile: int, ext: tuple, dils: tuple,
                  t_total: int, slope: float, final_slope,
                  acc_dtype, double_buffer: bool,
                  fold_offset: int | None = None, fold_ch: int = 64,
                  dyn_bounds: bool = False):
    if dyn_bounds:
        (x_hbm, bounds_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
         x_s, sem) = refs
    else:
        (x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, x_s, sem) = refs
        bounds_ref = None
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)
    e0 = ext[0]
    length = t_tile + 2 * e0
    ch = x_s.shape[2]

    def copy_in(blk, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(blk * t_tile, length), :],
            x_s.at[slot], sem.at[slot])

    if double_buffer:
        slot = jax.lax.rem(t_idx, 2)

        @pl.when(t_idx == 0)
        def _():
            copy_in(0, 0).start()

        @pl.when(t_idx + 1 < n_blk)
        def _():
            copy_in(t_idx + 1, 1 - slot).start()

        copy_in(t_idx, slot).wait()
    else:
        # interpret mode: pl.when branches cannot hold DMA primitives on the
        # CPU interpreter — use a blocking copy.
        slot = 0
        copy_in(t_idx, 0).start()
        copy_in(t_idx, 0).wait()

    # fp32 operands must request HIGHEST or the MXU silently truncates to
    # one bf16 pass; bf16 operands take the native single pass either way.
    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def sig_mask(rows, row0, val):
        """Zero `val` outside the true signal [0, t_total): conv 'same'
        zero padding pads the conv INPUT, and chained blocks consume the
        previous output as input. In fold mode (res_fold) the lane halves
        carry two different time windows, so the global position differs
        per lane half by fold_offset."""
        pos = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        if fold_offset is not None:
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, val.shape[-1]),
                                            1)
            pos = pos + jnp.where(lane >= fold_ch, fold_offset, 0)
        ok = (pos >= 0) & (pos < t_total)
        if bounds_ref is not None:
            # traced signal bounds (sequence-parallel shards: the true
            # signal window within the halo'd local array)
            ok = ok & (pos >= bounds_ref[0]) & (pos < bounds_ref[1])
        return jnp.where(ok, val, 0.0)

    for i, dil in enumerate(dils):
        ein, eout = ext[i], ext[i + 1]
        # lrelu'd input over this block's full reach, stored at matmul dtype
        # (VPU math in fp32; Mosaic fuses the cast chain into registers)
        xin = x_s[slot, pl.ds(e0 - ein, t_tile + 2 * ein), :]
        x32 = xin.astype(jnp.float32)
        a = jnp.where(x32 > 0, x32, slope * x32).astype(acc_dtype)

        # conv1 (k3 dilation d) over the h slab [-eout-8, t_tile+eout+8)
        wh = t_tile + 2 * eout + 16
        h = None
        for j in range(3):
            s0 = ein - eout - 8 + (j - 1) * dil
            d = jnp.dot(a[s0: s0 + wh], w1_ref[i, pl.ds(j * ch, ch), :],
                        preferred_element_type=jnp.float32, precision=prec)
            h = d if h is None else h + d
        h = sig_mask(wh, t_idx * t_tile - eout - 8, h + b1_ref[i])
        h = jnp.where(h > 0, h, slope * h).astype(acc_dtype)

        # conv2 (k3 dilation 1) + residual over [-eout, t_tile+eout)
        wy = t_tile + 2 * eout
        y = None
        for j in range(3):
            d = jnp.dot(h[7 + j: 7 + j + wy], w2_ref[i, pl.ds(j * ch, ch), :],
                        preferred_element_type=jnp.float32, precision=prec)
            y = d if y is None else y + d
        y = y + b2_ref[i] + x_s[slot, pl.ds(e0 - eout, wy), :].astype(
            jnp.float32)
        # the next block zero-pads ITS conv input too
        y = sig_mask(wy, t_idx * t_tile - eout, y)

        if i + 1 < len(dils):
            x_s[slot, pl.ds(e0 - eout, wy), :] = y.astype(x_s.dtype)
        else:
            if final_slope is not None:
                # stage-final activation folded into the epilogue
                # (generator.py:94: LeakyReLU(0.2) after every ResStack)
                y = jnp.where(y > 0, y, final_slope * y)
            out_ref[0, :, :] = y.astype(out_ref.dtype)


def _stack_w(ws, dtype):
    """[n, 3, Cin, Cout] torch-tap-order conv weights -> [n, 3*Cin, Cout]
    for the shifted-slices matmul (tap j multiplies x[t + (j-1)*d])."""
    n, k, ci, co = ws.shape
    return ws.reshape(n, k * ci, co).astype(dtype)


@functools.partial(jax.jit, static_argnames=(
    "dils", "slope", "final_slope", "t_tile", "matmul_dtype", "interpret",
    "mask_t_total", "fold_offset", "fold_ch"))
def res_chain(x: jnp.ndarray, w1s, b1s, w2s, b2s, dils: tuple,
              slope: float = 0.2, final_slope=None, t_tile: int = 4096,
              matmul_dtype=jnp.float32, interpret: bool = False,
              mask_t_total: int | None = None,
              fold_offset: int | None = None, fold_ch: int = 64,
              mask_bounds=None):
    """Run len(dils) consecutive ResStack blocks in one kernel.

    x: [B, T, C] with C a multiple of 128 (callers lane-pad smaller C);
    w1s/w2s: [n, 3, C, C] (block, tap, in, out); b1s/b2s: [n, C].

    fold_offset/mask_t_total: time-folded mode (res_fold) — lanes >=
    fold_ch carry a second time window offset by fold_offset, and the
    zero-'same' masking tests positions against the GLOBAL signal length
    mask_t_total rather than the folded array length.

    mask_bounds: optional TRACED [lo, hi) int32 pair further narrowing the
    signal window (sequence-parallel shards pass their true signal range
    within the halo'd local array).
    """
    bsz, t_total, ch = x.shape
    assert ch % LANE == 0, "res_chain needs lane-padded channels"
    ext = chain_extents(dils)
    e0 = ext[0]
    t_tile = min(t_tile, max(8, _ceil8(t_total)))
    n_blk = pl.cdiv(t_total, t_tile)
    t_pad = n_blk * t_tile
    x_p = jnp.pad(x, ((0, 0), (e0, e0 + t_pad - t_total), (0, 0)))

    kernel = functools.partial(
        _chain_kernel, t_tile=t_tile, ext=ext, dils=tuple(dils),
        t_total=t_total if mask_t_total is None else mask_t_total,
        slope=slope, final_slope=final_slope,
        acc_dtype=matmul_dtype, double_buffer=not interpret,
        fold_offset=fold_offset, fold_ch=fold_ch,
        dyn_bounds=mask_bounds is not None)
    n = len(dils)
    wspec = [
        pl.BlockSpec((n, 3 * ch, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 3 * ch, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bspec = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
             if mask_bounds is not None else [])
    bargs = ([jnp.asarray(mask_bounds, jnp.int32)]
             if mask_bounds is not None else [])
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + bspec + wspec,
        out_specs=pl.BlockSpec((1, t_tile, ch), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + 2 * e0, ch), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p, *bargs, _stack_w(w1s, matmul_dtype), b1s.reshape(n, 1, ch),
      _stack_w(w2s, matmul_dtype), b2s.reshape(n, 1, ch))
    return out[:, :t_total, :]


def shift_vmem_bytes(ch: int, tt: int, isz: int, wsz: int) -> int:
    """VMEM footprint model for the shifted-tap single kernel: three
    double-buffered tap reads, the weight bank, one live activated tap,
    fp32 h, its activated cast, fp32 y, and the pipelined output."""
    taps = 2 * 3 * (tt + 24) * ch * isz
    wts = 2 * (3 * ch * ch + ch) * wsz
    a = (tt + 16) * ch * wsz
    h = (tt + 16) * ch * 4
    hb = (tt + 16) * ch * wsz
    y = tt * ch * 4
    out = 2 * tt * ch * isz
    return taps + wts + a + h + hb + y + out


def _shift_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                  tap_s, sem, *, tt: int, d: int, pad_left: int,
                  t_total: int, slope: float, final_slope,
                  acc_dtype, double_buffer: bool):
    """One huge-dilation ResStack block via three ROW-OFFSET DMA reads per
    tile instead of one contiguous (tt + 2d)-row halo read: tap j of the
    dilated conv reads x[t0 - 8 + (j-1)d : t0 + tt + 8 + (j-1)d], so input
    traffic is ~3x the tile regardless of dilation — the chained kernel's
    halo read is (tt + 2(d+8))/tt-fold, which at d = 2187 forces 256-row
    tiles and 6-9x read amplification (or, at C = 512, does not fit VMEM
    at all and fell back to XLA conv until r5)."""
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)
    ch = tap_s.shape[-1]
    # 8-aligned read starts: residue is static per tap (tile starts and
    # pad_left are 8-aligned)
    res = [((j - 1) * d) % 8 for j in range(3)]

    def copy_in(blk, slot):
        copies = []
        for j in range(3):
            start = pad_left + blk * tt - 8 + (j - 1) * d - res[j]
            copies.append(pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(start, tt + 24), :],
                tap_s.at[slot, j], sem.at[slot, j]))
        return copies

    if double_buffer:
        slot = jax.lax.rem(t_idx, 2)

        @pl.when(t_idx == 0)
        def _():
            for c in copy_in(0, 0):
                c.start()

        @pl.when(t_idx + 1 < n_blk)
        def _():
            for c in copy_in(t_idx + 1, 1 - slot):
                c.start()

        for c in copy_in(t_idx, slot):
            c.wait()
    else:
        slot = 0
        for c in copy_in(t_idx, 0):
            c.start()
        for c in copy_in(t_idx, 0):
            c.wait()

    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def sig_mask(rows, row0, val):
        pos = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        return jnp.where((pos >= 0) & (pos < t_total), val, 0.0)

    # conv1 (k3 dilation d): h rows cover [t0 - 8, t0 + tt + 8); tap j of
    # h row r lives at buffer row res[j] + r. HBM zero padding + lrelu(0)=0
    # keep out-of-signal taps exactly zero, so taps need no masking; the
    # activated tap is computed INSIDE the loop so only one (tt+16)-row
    # slice is ever live.
    wh = tt + 16
    h = None
    for j in range(3):
        x32 = tap_s[slot, j, pl.ds(res[j], wh), :].astype(jnp.float32)
        a = jnp.where(x32 > 0, x32, slope * x32).astype(acc_dtype)
        dot = jnp.dot(a, w1_ref[pl.ds(j * ch, ch), :],
                      preferred_element_type=jnp.float32, precision=prec)
        h = dot if h is None else h + dot
    h = sig_mask(wh, t_idx * tt - 8, h + b1_ref[0])
    hb = jnp.where(h > 0, h, slope * h).astype(acc_dtype)

    # conv2 (k3 dilation 1) + residual over [t0, t0 + tt); the residual
    # x[t0 + r] is tap 1's buffer row r + 8 (its residue is 0)
    y = None
    for j in range(3):
        dot = jnp.dot(hb[7 + j: 7 + j + tt], w2_ref[pl.ds(j * ch, ch), :],
                      preferred_element_type=jnp.float32, precision=prec)
        y = dot if y is None else y + dot
    y = y + b2_ref[0] + tap_s[slot, 1, pl.ds(8, tt), :].astype(jnp.float32)
    y = sig_mask(tt, t_idx * tt, y)
    if final_slope is not None:
        y = jnp.where(y > 0, y, final_slope * y)
    out_ref[0, :, :] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "dil", "slope", "final_slope", "t_tile", "matmul_dtype", "interpret"))
def res_shift_single(x: jnp.ndarray, w1, b1, w2, b2, dil: int,
                     slope: float = 0.2, final_slope=None,
                     t_tile: int = 1024, matmul_dtype=jnp.float32,
                     interpret: bool = False):
    """Single ResStack block y = x + C2(lrelu(C1(lrelu(x)))) with the
    shifted-tap DMA layout (see _shift_kernel). x: [B, T, C] with C a
    multiple of 128; w1/w2: [3, C, C]. Built for the huge-dilation singles
    (d >= 729) where the contiguous-halo designs pay d-sized reads per
    tile; reads here are tile-sized at row offsets +-d."""
    bsz, t_total, ch = x.shape
    assert ch % LANE == 0, "res_shift_single needs lane-padded channels"
    tt = min(t_tile, max(8, _ceil8(t_total)))
    n_blk = pl.cdiv(t_total, tt)
    t_pad = n_blk * tt
    padl = _ceil8(dil + 16)
    x_p = jnp.pad(x, ((0, 0), (padl, padl + t_pad - t_total), (0, 0)))

    kernel = functools.partial(
        _shift_kernel, tt=tt, d=dil, pad_left=padl, t_total=t_total,
        slope=slope, final_slope=final_slope, acc_dtype=matmul_dtype,
        double_buffer=not interpret)
    wspec = [
        pl.BlockSpec((3 * ch, ch), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * ch, ch), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + wspec,
        out_specs=pl.BlockSpec((1, tt, ch), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, tt + 24, ch), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x_p, w1.reshape(3 * ch, ch).astype(matmul_dtype), b1.reshape(1, ch),
      w2.reshape(3 * ch, ch).astype(matmul_dtype), b2.reshape(1, ch))
    return out[:, :t_total, :]


def res_block(x: jnp.ndarray, w1, b1, w2, b2, dil: int,
              slope: float = 0.2, t_tile: int = 4096,
              matmul_dtype=jnp.float32, interpret: bool = False):
    """Single fused block: y = x + C2(lrelu(C1(lrelu(x)))). x: [B, T, C];
    w1/w2: [3, C, C]. Channels < 128 are lane-padded (zero-padded channels
    stay exactly zero through lrelu/conv/residual)."""
    ch = x.shape[-1]
    pc = (-ch) % LANE
    if pc:
        out = res_chain(
            jnp.pad(x, ((0, 0), (0, 0), (0, pc))),
            jnp.pad(w1, ((0, 0), (0, pc), (0, pc)))[None],
            jnp.pad(b1, (0, pc))[None],
            jnp.pad(w2, ((0, 0), (0, pc), (0, pc)))[None],
            jnp.pad(b2, (0, pc))[None],
            dils=(dil,), slope=slope, t_tile=t_tile,
            matmul_dtype=matmul_dtype, interpret=interpret)
        return out[..., :ch]
    return res_chain(x, w1[None], b1[None], w2[None], b2[None], dils=(dil,),
                     slope=slope, t_tile=t_tile, matmul_dtype=matmul_dtype,
                     interpret=interpret)


def _bdiag(w, ci: int, co: int):
    """[..., ci, co] -> [..., 2ci, 2co] block-diagonal (two independent
    channel groups through one dense MXU pass)."""
    z = jnp.zeros(w.shape[:-2] + (2 * ci, 2 * co), w.dtype)
    return z.at[..., :ci, :co].set(w).at[..., ci:, co:].set(w)


def stream_ok(ch: int, dils, t_total: int, isz: int = 2, wsz: int = 2,
              interpret: bool = False) -> bool:
    """Route to the streaming ring-buffer kernel (kernels.resstream)?
    Only for exactly-one-lane channel counts (at C>=256 the chained planner
    already runs near roofline and streaming's weight bank alone blows
    VMEM), for signals long enough that the lag-sized tile amortizes, and
    when the dtype-dependent footprint fits — the fp32 parity path at
    C=128 needs ~30 MB and must stay on the chained planner (found by the
    r3 CLI drive: the bf16 bench compiled, the fp32 CLI OOM'd VMEM)."""
    import os
    if os.environ.get("VF_TPU_NO_PALLAS_RESSTREAM"):
        return False
    from voicefixer_tpu.kernels.resstream import (VMEM_BUDGET_STREAM,
                                                  stream_lag,
                                                  stream_vmem_bytes)
    if ch != LANE or t_total < 2 * stream_lag(dils):
        return False
    return interpret or (stream_vmem_bytes(ch, dils, isz, wsz)
                         <= VMEM_BUDGET_STREAM)


def _res_fold(params: list, x: jnp.ndarray, dils: tuple, slope: float,
              final_slope, t_tile: int, matmul_dtype, interpret: bool,
              reach: int) -> jnp.ndarray:
    """Time-folded stack for C = LANE/2 (the vocoder's final stage, C=64 at
    T up to 1.3 M): instead of zero-padding channels to a full lane (which
    wastes half the MXU output columns AND half the rows), the signal is
    split into two halves laid side by side in the lane dimension —
    lanes 0:64 carry x[0 : T/2 + reach], lanes 64:128 carry
    x[T/2 - reach : T] — with block-diagonal weights, halving the row count
    at full lane width. Each half keeps a `reach`-sample margin covering the
    receptive field of the WHOLE stack (sum of every block's conv reach), so
    seam garbage never creeps into the kept samples; the kernel's zero-
    'same' masking tests GLOBAL positions per lane half (fold_offset)."""
    b, t, ch = x.shape
    half = t // 2
    off = half - reach
    la = jnp.pad(x[:, : half + reach, :], ((0, 0), (0, reach), (0, 0)))
    lb = jnp.pad(x[:, off:, :], ((0, 0), (0, reach), (0, 0)))
    xf = jnp.concatenate([la, lb], axis=-1)

    if stream_ok(2 * ch, dils, xf.shape[1], jnp.dtype(x.dtype).itemsize,
                 jnp.dtype(matmul_dtype).itemsize, interpret):
        from voicefixer_tpu.kernels.resstream import res_stream
        xf = res_stream(
            xf,
            jnp.stack([_bdiag(p["c1"]["w"], ch, ch) for p in params]),
            jnp.stack([jnp.concatenate([p["c1"]["b"]] * 2)
                       for p in params]),
            jnp.stack([_bdiag(p["c2"]["w"], ch, ch) for p in params]),
            jnp.stack([jnp.concatenate([p["c2"]["b"]] * 2)
                       for p in params]),
            dils=dils, slope=slope, final_slope=final_slope,
            matmul_dtype=matmul_dtype, interpret=interpret,
            mask_t_total=t, fold_offset=off, fold_ch=ch)
        return jnp.concatenate(
            [xf[:, :half, :ch], xf[:, reach: reach + half, ch:]], axis=1)

    isz = jnp.dtype(x.dtype).itemsize
    wsz = jnp.dtype(matmul_dtype).itemsize
    groups = plan_chain(2 * ch, dils, isz, wsz, t_cap=t_tile,
                        t_total=xf.shape[1], allow_shift=False)
    for gi, (i0, i1, tt) in enumerate(groups):
        sub = params[i0:i1]
        last = gi == len(groups) - 1
        w1s = jnp.stack([_bdiag(p["c1"]["w"], ch, ch) for p in sub])
        w2s = jnp.stack([_bdiag(p["c2"]["w"], ch, ch) for p in sub])
        b1s = jnp.stack([jnp.concatenate([p["c1"]["b"]] * 2) for p in sub])
        b2s = jnp.stack([jnp.concatenate([p["c2"]["b"]] * 2) for p in sub])
        xf = res_chain(xf, w1s, b1s, w2s, b2s, dils=dils[i0:i1], slope=slope,
                       final_slope=final_slope if last else None,
                       t_tile=tt, matmul_dtype=matmul_dtype,
                       interpret=interpret, mask_t_total=t,
                       fold_offset=off, fold_ch=ch)
    return jnp.concatenate(
        [xf[:, :half, :ch], xf[:, reach: reach + half, ch:]], axis=1)


def up_res_stack(up_params: dict, res_params: list, x_src: jnp.ndarray,
                 scale: int, kernel: int, slope: float,
                 final_slope=None, matmul_dtype=jnp.float32,
                 interpret: bool = False):
    """Fused (UpsampleNet -> ResStack -> stage LeakyReLU) through ONE
    streaming kernel (kernels.resstream.up_res_stream): the full-rate
    upsampled signal never exists in HBM. Returns the [B, T_in*scale, Cout]
    stage output, or None when the stage pair is ineligible (the caller
    falls back to the separate upsample + res_stack path).

    Eligible: k=3 stacks, Cin % 128 == 0, Cout in {128, 64}; Cout == 64
    takes the time-folded layout (same math as _res_fold) and needs the
    fold split/offset polyphase-aligned — off % scale == 0, guaranteed for
    the production pipeline where T/2 is a multiple of 441."""
    if kernel != 3:
        return None
    from voicefixer_tpu.kernels.resstream import up_res_stream, up_stream_ok
    w_up = up_params["w"]
    k, cin, cout = w_up.shape
    if k != 2 * scale:
        return None
    bsz, t_in, _ = x_src.shape
    t_out = t_in * scale
    dils = tuple(3 ** (i % 10) for i in range(len(res_params)))
    isz = jnp.dtype(x_src.dtype).itemsize
    wsz = jnp.dtype(matmul_dtype).itemsize

    if cout == LANE:
        if not up_stream_ok(cin, cout, scale, dils, t_out, isz, wsz,
                            interpret):
            return None
        out = up_res_stream(
            x_src, w_up, up_params["b"],
            jnp.stack([p["c1"]["w"] for p in res_params]),
            jnp.stack([p["c1"]["b"] for p in res_params]),
            jnp.stack([p["c2"]["w"] for p in res_params]),
            jnp.stack([p["c2"]["b"] for p in res_params]),
            dils=dils, scale=scale, t_out=t_out,
            slope=slope, final_slope=final_slope,
            matmul_dtype=matmul_dtype, interpret=interpret)
        return out

    if cout * 2 == LANE:
        # the fold split and reach are aligned to 8*scale so both lane
        # halves' source DMAs share ONE sublane residue — Mosaic cannot
        # concatenate values with mismatched sublane offsets (and the
        # split needs polyphase alignment anyway). The halves may be
        # slightly unequal; position masking covers the difference.
        align = 8 * scale
        reach = -(-(sum(d + 1 for d in dils) + 8) // align) * align
        len_a = (t_out // 2) // align * align  # lane-A keeps [0, len_a)
        off = len_a - reach                    # lane-B carries x[off:]
        len_b = t_out - len_a                  # lane-B keeps [reach, ...)
        if len_a <= 0 or off <= 0 or t_out < 8 * reach:
            return None
        t_arr = max(len_a + reach, t_out - off)
        if not up_stream_ok(cin, cout, scale, dils, t_arr, isz, wsz,
                            interpret):
            return None
        xf = up_res_stream(
            x_src, w_up, up_params["b"],
            jnp.stack([_bdiag(p["c1"]["w"], cout, cout)
                       for p in res_params]),
            jnp.stack([jnp.concatenate([p["c1"]["b"]] * 2)
                       for p in res_params]),
            jnp.stack([_bdiag(p["c2"]["w"], cout, cout)
                       for p in res_params]),
            jnp.stack([jnp.concatenate([p["c2"]["b"]] * 2)
                       for p in res_params]),
            dils=dils, scale=scale, t_out=t_out,
            fold=(len_a, off, reach),
            slope=slope, final_slope=final_slope,
            matmul_dtype=matmul_dtype, interpret=interpret)
        return jnp.concatenate(
            [xf[:, :len_a, :cout], xf[:, reach: reach + len_b, cout:]],
            axis=1)
    return None


def res_stack(params: list, x: jnp.ndarray, kernel: int, slope: float,
              t_tile: int = 8192, matmul_dtype=jnp.float32,
              final_slope=None, interpret: bool = False,
              mask_bounds=None) -> jnp.ndarray:
    """Full ResStack via chained kernels, grouped by plan_chain; layers whose
    (channels, dilation) cannot fit VMEM at all (C=512 with dil >= 729) take
    the jax conv path. Drop-in for models.vocoder._res_stack (k=3 only — the
    production config). final_slope, when set, folds the stage-final
    LeakyReLU into the last chain's epilogue.

    C = 64 at long T takes the time-folded path (_res_fold); other channels
    < 128 are lane-padded to 128 ONCE for the whole stack — zero-padded
    channels stay exactly zero through leaky-relu/conv/residual.

    mask_bounds: optional TRACED [lo, hi) signal window (sequence-parallel
    shards); the fold path is skipped when set — fold's own offset masking
    assumes the array starts at signal position 0."""
    assert kernel == 3, "fused kernel supports k=3 (production config)"
    from voicefixer_tpu.ops.conv import conv1d, leaky_relu
    ch_orig = x.shape[-1]
    dils_all = tuple(3 ** (i % 10) for i in range(len(params)))
    if (ch_orig * 2 == LANE and x.shape[1] % 2 == 0
            and mask_bounds is None):
        reach = _ceil8(sum(d + 1 for d in dils_all)) + 8
        if x.shape[1] >= 8 * reach:
            isz = jnp.dtype(x.dtype).itemsize
            wsz = jnp.dtype(matmul_dtype).itemsize
            folded_groups = plan_chain(
                LANE, dils_all, isz, wsz, t_cap=t_tile,
                t_total=x.shape[1] // 2 + 2 * reach, allow_shift=False)
            if all(tt is not None for _, _, tt in folded_groups):
                return _res_fold(params, x, dils_all, slope, final_slope,
                                 t_tile, matmul_dtype, interpret, reach)
    pc = (-ch_orig) % LANE
    if pc:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pc)))
    ch = x.shape[-1]
    isz = jnp.dtype(x.dtype).itemsize
    wsz = jnp.dtype(matmul_dtype).itemsize
    dils = tuple(3 ** (i % 10) for i in range(len(params)))

    if stream_ok(ch, dils, x.shape[1], isz, wsz, interpret):
        from voicefixer_tpu.kernels.resstream import res_stream

        def padw(w):
            return jnp.pad(w, ((0, 0), (0, pc), (0, pc))) if pc else w

        def padb(b):
            return jnp.pad(b, (0, pc)) if pc else b

        out = res_stream(
            x,
            jnp.stack([padw(p["c1"]["w"]) for p in params]),
            jnp.stack([padb(p["c1"]["b"]) for p in params]),
            jnp.stack([padw(p["c2"]["w"]) for p in params]),
            jnp.stack([padb(p["c2"]["b"]) for p in params]),
            dils=dils, slope=slope, final_slope=final_slope,
            matmul_dtype=matmul_dtype, interpret=interpret,
            mask_bounds=mask_bounds)
        return out[..., :ch_orig] if pc else out

    groups = plan_chain(ch, dils, isz, wsz, t_cap=t_tile,
                        t_total=x.shape[1],
                        # the shift kernel has no dynamic-bounds masking;
                        # sequence-parallel shards stay on chain/XLA paths
                        allow_shift=mask_bounds is None)

    def bank(sub, key1, key2):
        ws = jnp.stack([jnp.pad(p[key1][key2], ((0, 0), (0, pc), (0, pc)))
                        if pc and p[key1][key2].ndim == 3 else p[key1][key2]
                        for p in sub])
        return ws

    def bounds_mask(v):
        """Zero rows outside the traced [lo, hi) window — matches the
        kernels' dynamic-bounds masking for the jax fallback blocks."""
        if mask_bounds is None:
            return v
        pos = jnp.arange(v.shape[1])[None, :, None]
        return jnp.where((pos >= mask_bounds[0]) & (pos < mask_bounds[1]),
                         v, 0.0)

    for gi, (i0, i1, tt) in enumerate(groups):
        sub = params[i0:i1]
        last = gi == len(groups) - 1
        if isinstance(tt, tuple):
            # shifted-tap single (huge dilation): three row-offset tile
            # reads instead of a d-sized contiguous halo
            p = sub[0]

            def pw(w):
                return jnp.pad(w, ((0, 0), (0, pc), (0, pc))) if pc else w

            x = res_shift_single(
                x, pw(p["c1"]["w"]),
                jnp.pad(p["c1"]["b"], (0, pc)) if pc else p["c1"]["b"],
                pw(p["c2"]["w"]),
                jnp.pad(p["c2"]["b"], (0, pc)) if pc else p["c2"]["b"],
                dil=dils[i0], slope=slope,
                final_slope=final_slope if last else None,
                t_tile=tt[1], matmul_dtype=matmul_dtype,
                interpret=interpret)
            continue
        if tt is None:
            # wide-channel, huge-dilation layer: plain convs (pc == 0 there)
            for k, p in enumerate(sub):
                d = dils[i0 + k]
                h = leaky_relu(bounds_mask(x), slope)
                h = conv1d(h, p["c1"]["w"], p["c1"]["b"], padding=d,
                           dilation=d)
                h = leaky_relu(bounds_mask(h), slope)
                x = x + conv1d(h, p["c2"]["w"], p["c2"]["b"], padding=1)
                x = bounds_mask(x)
            if last and final_slope is not None:
                x = leaky_relu(x, final_slope)
            continue
        w1s = bank(sub, "c1", "w")
        w2s = bank(sub, "c2", "w")
        b1s = jnp.stack([jnp.pad(p["c1"]["b"], (0, pc)) if pc
                         else p["c1"]["b"] for p in sub])
        b2s = jnp.stack([jnp.pad(p["c2"]["b"], (0, pc)) if pc
                         else p["c2"]["b"] for p in sub])
        x = res_chain(x, w1s, b1s, w2s, b2s, dils=dils[i0:i1], slope=slope,
                      final_slope=final_slope if last else None,
                      t_tile=tt, matmul_dtype=matmul_dtype,
                      interpret=interpret, mask_bounds=mask_bounds)
    return x[..., :ch_orig] if pc else x
