"""Streaming full-stack ResStack kernel: every block of the dilated
residual chain in ONE pallas pass, with per-block VMEM history rings
instead of halo recompute.

Reference semantics: /root/reference/voicefixer/vocoder/model/modules.py
:550-595 (ResStack layer i): y = x + C2(lrelu(C1(lrelu(x)))), C1 = conv k3
dilation 3^(i%10) 'same' zero padding, C2 = conv k3 dilation 1.

Why a second kernel next to kernels.resstack (the chained/halo design):
the chain planner must SPLIT the depth-8 stack into ~4 groups because a
chained tile's VMEM footprint grows with the summed dilations, so the
full-rate signal streams HBM->VMEM->HBM four times, the huge-dilation
singles re-read (tile + 2*2200)/tile = up to 3x their input, and the small
tiles multiply per-grid-step fixed costs. Measured on v5e (r3): the C=128
stage ran at 98 TF/s and the folded C=64 stage at 38 TF/s while the C=512
stage hit 143 TF/s.

This kernel instead runs all blocks per time tile at a static LAG:
block i's output trails its input by lag_i = d_i + 8 rows (its conv reach
plus an 8-row slab margin), so after the whole chain the final output
trails the input tile by T_LAG = sum(d_i + 8) rows. Choosing the tile
length EQUAL to T_LAG makes step j's final output exactly output tile j-1
— the out BlockSpec just lags the grid by one step. Each block keeps the
last (2*d_i + 16) rows of its input in a VMEM ring ("history"); per step it
assembles [history | fresh] into a slab, computes its tile of output with
NO recompute and NO extra HBM traffic, and hands the tile to the next
block through a ping-pong VMEM buffer. The input is read once and the
output written once — HBM traffic is the semantic minimum.

Zero-'same' conv padding falls out of position masking: every value is
masked against its GLOBAL row position (uninitialized history at the left
edge, zero padding, and the flush step's stale DMA buffer are all outside
[0, t_total) and multiply to zero). The time-folded C=64 mode of
kernels.resstack (lane halves carrying two time windows) is supported via
the same fold_offset masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def stream_lag(dils, align: int = 8) -> int:
    """Total output lag = tile length: sum of per-block lags (d_i + 8).
    All production dilations are odd and the depth is even, so the sum is
    8-aligned; odd test configs get rounded up via the last block's lag.
    The up-fused variant passes align = lcm(8, scale) so every tile start
    is polyphase-group aligned."""
    lag = sum(d + 8 for d in dils)
    return -(-lag // align) * align


# the model underestimates Mosaic's real stack by ~10% (measured r3:
# estimate 14.7M -> actual ~15.1M at bf16/C=128), so the budget leaves
# headroom under the 16 MB hardware limit
VMEM_BUDGET_STREAM = 15_500_000

# whole-slab activation (one lrelu pass shared by all three conv1 taps) is
# used while the slab is at most this many rows beyond the tile; larger
# slabs (huge-dilation blocks) activate per tap slice to bound the
# transient's VMEM cost — per-tap costs 3*(tt+16) activated rows vs
# s_rows once, so the cutover only wastes VPU where s_rows > 3*(tt+16)
# anyway, which never happens for the production dilation ladders
ACT_SLAB_EXTRA = 2048


def _trans_bytes(ch: int, tt: int, hist_rows_i: int, wsz: int) -> int:
    """Peak per-block transients: the activated slab (or one tap slice),
    fp32 h, the (conservatively fold-width, acc-dtype) row mask, activated
    h, fp32 y."""
    wh = tt + 16
    s_rows = tt + hist_rows_i
    act_rows = s_rows if s_rows <= tt + ACT_SLAB_EXTRA else wh
    return (act_rows * ch * wsz + wh * ch * 4 + wh * ch * wsz
            + wh * ch * wsz + tt * ch * 4)


def stream_vmem_bytes(ch: int, dils, isz: int, wsz: int) -> int:
    """VMEM footprint model for the streaming kernel: persistent buffers
    (dma double buffer, inter-block tile, shared slab, history rings,
    double-buffered out block), the stacked weight banks, and the per-block
    transients (_trans_bytes)."""
    tt = stream_lag(dils)
    hist_rows = [2 * d + 16 for d in dils]
    hist_rows[-1] += tt - sum(d + 8 for d in dils)
    buffers = ((2 * tt + (tt + max(hist_rows)) + sum(hist_rows)
                + 2 * tt) * ch * isz)
    weights = len(dils) * 2 * (3 * ch * ch + ch) * wsz
    trans = max(_trans_bytes(ch, tt, hr, wsz) for hr in hist_rows)
    return buffers + weights + trans


def _stream_kernel(*refs, tt: int,
                   dils: tuple, lags: tuple, hist_off: tuple,
                   t_total: int, t_arr: int, slope: float, final_slope,
                   acc_dtype, double_buffer: bool,
                   fold_offset: int | None, fold_ch: int,
                   dyn_bounds: bool,
                   up_scale: int | None = None, up_pad: int = 0,
                   up_lead: int = 0, up_halves: tuple = (0,)):
    """When up_scale is set, the kernel's input x_hbm is the PRE-UPSAMPLE
    signal [B, T_in(padded), Cin], already activated by the caller
    (a = x + sin(x)), and a fused transposed-conv stage (kernels.upsample
    math: z[q*s + rho] = a[q] @ W_lo[rho] + a[q-1] @ W_hi[rho];
    out[n] = z[n + up_pad]) produces each fresh tile in VMEM — the
    full-rate upsampled signal never exists in HBM, which also kills the
    fold-mode pad/concat glue (each lane half's tile is upsampled straight
    from its own source window, up_halves holding the per-half global row
    offsets)."""
    n_up = len(up_halves) if up_scale else 0
    if dyn_bounds:
        (x_hbm, bounds_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         *up_refs, out_ref, dma_s, slab_s, hist_s, sem) = refs
    else:
        (x_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
         *up_refs, out_ref, dma_s, slab_s, hist_s, sem) = refs
        bounds_ref = None
    wup_ref, bup_ref = (up_refs[0], up_refs[1]) if up_scale else (None, None)
    b_idx = pl.program_id(0)
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)
    ch = slab_s.shape[1]

    # x_hbm is padded beyond the last input tile, so every step can copy
    # unconditionally — the flush step reads zeros, which position masking
    # discards anyway.
    if up_scale:
        # Mosaic requires DMA row starts AND extents 8-aligned. The first
        # needed source row is q_start = const_h + j*(tt/s) with
        # const_h = lead + off_h/s - 1 (off_h, tt multiples of s; tt/s a
        # multiple of 8 by the lcm(8, s) tile alignment): round const_h
        # down to the tiling and keep the static residue `extra_h` to
        # offset reads inside the buffer.
        g_need = tt // up_scale + 2  # groups q0-1 .. q0 + tt/s
        g_in = -(-(g_need + 7) // 8) * 8

        def copy_in(j, slot):
            copies = []
            for h, off_h in enumerate(up_halves):
                const_h = up_lead + off_h // up_scale - 1
                start8 = const_h - const_h % 8 + j * (tt // up_scale)
                copies.append(pltpu.make_async_copy(
                    x_hbm.at[b_idx, pl.ds(start8, g_in), :],
                    dma_s.at[slot, h], sem.at[slot]))
            return copies
    else:
        def copy_in(j, slot):
            return [pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(j * tt, tt), :],
                dma_s.at[slot], sem.at[slot])]

    if double_buffer:
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            for c in copy_in(0, 0):
                c.start()

        @pl.when(step + 1 < n_steps)
        def _():
            for c in copy_in(step + 1, 1 - slot):
                c.start()

        for c in copy_in(step, slot):
            c.wait()
    else:
        # interpret mode: pl.when branches cannot hold DMA primitives on
        # the CPU interpreter — use a blocking copy.
        slot = 0
        for c in copy_in(step, 0):
            c.start()
        for c in copy_in(step, 0):
            c.wait()

    # Zero-invariant: every out-of-signal slab row is EXACTLY zero, so the
    # conv taps need no per-value masking (the r3 kernel's dominant VPU
    # cost — lrelu + a 7-op position mask recomputed per tap slice made the
    # C<=128 stages VPU-bound at ~35 TF/s while the MXU sat idle). The
    # invariant holds by induction: history rings start zeroed here, the
    # fresh input tile is masked once where it can carry out-of-signal
    # values, and every block's y is masked before it re-enters the chain.
    @pl.when(step == 0)
    def _():
        hist_s[...] = jnp.zeros_like(hist_s)

    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # measurement-only ablations (numerically WRONG output; trace-time
    # static): "nomask" skips every position-mask build+multiply,
    # "noact" additionally replaces both leaky-relu passes with identity —
    # benchmarks/bench_res3_ablate.py uses these to attribute the fold
    # kernel's gap over its MXU floor to specific VPU passes
    import os as _os
    _ablate = _os.environ.get("VF_TPU_STREAM_ABLATE", "")
    _skip_mask = _ablate in ("nomask", "noact")
    _skip_act = _ablate == "noact"

    # mask dtype: 0/1 (and the -1..1 fold combination) are exact in bf16,
    # and the acc-width mask halves the fold-mode transient's VMEM cost
    mdt = acc_dtype
    if fold_offset is not None:
        lane_hi = (jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
                   >= fold_ch).astype(mdt)

    def row_mask(rows, row0):
        """0/1 mask for `rows` array rows starting at global array row
        row0: the r3 per-value ok test ((arow in [0, t_arr)) & (pos in
        [0, t_total)) & traced bounds) computed once per ROW on a (rows, 1)
        iota — the array-row test kills the streaming artifacts the zero
        invariant doesn't cover (bias-fed h rows at the left edge / flush
        step), the position test is the conv zero-'same' padding. Fold mode
        combines the two lane halves' row masks with one fused broadcast
        instead of a full-width lane iota + where chain. Applied by a
        single multiply (mask values are exactly 0/1). Kept per-block: an
        r5 experiment that hoisted a step-wide (2tt+16, 1) half-mask pair
        OOM'd VMEM on the real chip (the hoisted masks materialize at full
        lane width and outlive every block's peak; Mosaic's scoped-vmem
        allocator reported 16.28M vs the 16M limit at the d=2187 block),
        and a mask-free measurement showed no reliable win to chase."""
        arow = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

        def half(off):
            pos = arow + off
            ok = (arow >= 0) & (arow < t_arr) & (pos >= 0) & (pos < t_total)
            if bounds_ref is not None:
                # traced signal bounds in array coordinates (sequence-
                # parallel shards: the true signal window within the
                # halo'd local array)
                ok = ok & (pos >= bounds_ref[0]) & (pos < bounds_ref[1])
            return ok.astype(mdt)

        ma = half(0)
        if fold_offset is None:
            return ma
        return ma + lane_hi * (half(fold_offset) - ma)

    if up_scale:
        # fused upsample: produce this step's fresh [tt, ch] tile from the
        # slow-rate source. Out row r (global off_h + base + r) = z row
        # (global + up_pad); with off_h and tt multiples of s the first
        # group is q0 = (off_h + base)/s and the in-tile shift is static:
        # up_pad % s. Source zero padding makes a = x + sin(x) exactly zero
        # outside the signal, so no masking is needed here — downstream
        # position masks handle the tail rows.
        g_out = tt // up_scale + 1
        shift = up_pad % up_scale
        cin = dma_s.shape[-1]
        # source slices, halves lane-concatenated: [g_out+1, n_up*cin].
        # The caller pre-applies a = x + sin(x) at the slow rate (one cheap
        # XLA pass) — in-kernel fp32 sin on every step's source window was
        # a measured multi-ms VPU sink for zero fusion benefit.
        avs = []
        for h in range(n_up):
            extra_h = (up_lead + up_halves[h] // up_scale - 1) % 8
            avs.append(dma_s[slot, h, extra_h: extra_h + g_out + 1].astype(
                acc_dtype))
        a = avs[0] if n_up == 1 else jnp.concatenate(avs, axis=-1)
        kk = n_up * cin
        # one K-concatenated matmul pair produces z with columns packed
        # (phase, half, channel): its row-major reshape to [g*s, 128] IS
        # the (plain or fold-lane) fresh layout — no 64-lane shape casts,
        # which Mosaic cannot lower. The cast to the slab dtype happens
        # BEFORE the reshape: the (s*128 -> 128)-lane relayout moves half
        # the bytes that way.
        z = (jnp.dot(a[1: 1 + g_out], wup_ref[0, :kk], precision=prec,
                     preferred_element_type=jnp.float32)
             + jnp.dot(a[0: g_out], wup_ref[0, kk:], precision=prec,
                       preferred_element_type=jnp.float32)
             + bup_ref[0])  # [g_out, s*128]
        flat = z.astype(slab_s.dtype).reshape(g_out * up_scale, ch)
        fresh = flat[shift: shift + tt]

    # base position of the current input tile; each block's coordinates
    # hang off it at static offsets
    base = step * tt

    def chain(use_mask):
        """The whole block chain for this step, writing slab/hist/out refs.
        use_mask=False drops every position-mask build and multiply —
        valid (exact) on interior steps where all masks are statically
        all-ones; also the measurement-only ablation body."""
        # The fresh tile is masked once IF it can carry out-of-signal
        # values: the fused upsample's z = a@W + b_up has the bias
        # everywhere, and sequence-parallel halos hold real neighbor data.
        # The plain paths' inputs are zero-padded in HBM already
        # (res_stream pads x_p; the fold caller pads each half), so the
        # invariant holds for free there.
        need_in_mask = ((up_scale is not None) or (bounds_ref is not None)) \
            and use_mask
        if need_in_mask:
            m_in = row_mask(tt, base)
        cum = 0  # cumulative lag before block i
        for i, d in enumerate(dils):
            lag = lags[i]
            hist_rows = lag + d + 8      # covers [a - d - 8, prev newest)
            s_rows = tt + hist_rows      # slab = [history | fresh]
            h0 = hist_off[i]
            cum += lag
            a0 = base - cum              # first output row of this block

            # assemble the slab: history, then this step's fresh tile.
            # Block i > 0's fresh region was already written by block
            # i-1's epilogue (its y goes straight into this block's slab
            # slot — no inter-block buffer, no extra VMEM copy), so only
            # the history rows move here.
            slab_s[pl.ds(0, hist_rows), :] = hist_s[pl.ds(h0, hist_rows), :]
            if i == 0:
                fin = fresh if up_scale else dma_s[slot]
                if need_in_mask:
                    fin = (fin.astype(jnp.float32)
                           * m_in).astype(slab_s.dtype)
                slab_s[pl.ds(hist_rows, tt), :] = fin
            # save the next step's history BEFORE any in-place math
            hist_s[pl.ds(h0, hist_rows), :] = slab_s[pl.ds(tt, hist_rows), :]

            # conv1 (k3 dilation d): h rows cover [a0 - 8, a0 + tt + 8);
            # tap j of h row r reads slab row r + j*d (slab row 0 is
            # global a0 - d - 8). The zero invariant means taps need no
            # masking, and one lrelu pass over the slab serves all three
            # taps (per tap only for huge-dilation slabs, where the
            # activated copy's VMEM cost outweighs the saved VPU work).
            wh = tt + 16
            m = row_mask(wh, a0 - 8) if use_mask else None
            if _skip_act:
                def _tap(j, d=d):
                    return slab_s[pl.ds(j * d, wh), :].astype(acc_dtype)
            elif s_rows <= tt + ACT_SLAB_EXTRA:
                s32 = slab_s[pl.ds(0, s_rows), :].astype(jnp.float32)
                act = jnp.where(s32 > 0, s32, slope * s32).astype(acc_dtype)

                def _tap(j, d=d, act=act):
                    return act[j * d: j * d + wh]
            else:
                # huge-dilation slabs activate per tap slice; the tap is
                # computed INSIDE the dot loop (immediately before its
                # dot) so only one (tt+16)-row activated slice is ever
                # live — three simultaneous slices would put the d=2187
                # block ~1 MB over the 16 MB VMEM limit (_trans_bytes
                # charges one slice)
                def _tap(j, d=d):
                    x32 = slab_s[pl.ds(j * d, wh), :].astype(jnp.float32)
                    return jnp.where(x32 > 0, x32,
                                     slope * x32).astype(acc_dtype)
            h = None
            for j in range(3):
                dot = jnp.dot(_tap(j), w1_ref[i, pl.ds(j * ch, ch), :],
                              precision=prec,
                              preferred_element_type=jnp.float32)
                h = dot if h is None else h + dot
            # conv2's 'same' zero padding pads its INPUT lrelu(h): one
            # lrelu pass + one multiply by the 0/1 row mask (== the r3
            # select chain, since lrelu(0) == 0)
            hb = h + b1_ref[i]
            if not _skip_act:
                hb = jnp.where(hb > 0, hb, slope * hb)
            if use_mask:
                hb = hb * m
            hb = hb.astype(acc_dtype)

            # conv2 (k3 dilation 1) + residual over [a0, a0 + tt)
            y = None
            for j in range(3):
                dot = jnp.dot(hb[7 + j: 7 + j + tt],
                              w2_ref[i, pl.ds(j * ch, ch), :],
                              precision=prec,
                              preferred_element_type=jnp.float32)
                y = dot if y is None else y + dot
            y = (y + b2_ref[i]
                 + slab_s[pl.ds(d + 8, tt), :].astype(jnp.float32))
            if use_mask:
                y = y * m[8: 8 + tt]

            if i + 1 < len(dils):
                # block i+1's slab = [its history | y]: place y at its
                # fresh offset now (all of block i's slab reads are done;
                # the next iteration only fills rows [0, its hist_rows))
                nh = lags[i + 1] + dils[i + 1] + 8
                slab_s[pl.ds(nh, tt), :] = y.astype(slab_s.dtype)
            else:
                if final_slope is not None:
                    # stage-final activation folded into the epilogue
                    # (generator.py:94: LeakyReLU after every ResStack);
                    # lrelu(0) == 0 keeps the already-applied mask intact
                    y = jnp.where(y > 0, y, final_slope * y)
                out_ref[0, :, :] = y.astype(out_ref.dtype)

    # Masking runs on EVERY step. The masks are statically all-ones on
    # interior steps, and the ablations price them at ~1.6 ms of the fused
    # stage's 13.4 ms (benchmarks/bench_res3_ablate.py) — but the r5
    # attempt to branch per step (pl.when(interior) -> unmasked body,
    # else masked) measured ~2 ms SLOWER than always-masked: the branch
    # boundary defeats Mosaic's cross-step software pipelining (DMA waits
    # sit outside the branches; compute inside), costing more than the
    # mask work it saves. Single body, single schedule.
    chain(not _skip_mask)


def _stack_w(ws, dtype):
    """[n, 3, C, C] torch-tap-order conv weights -> [n, 3*C, C]."""
    n, k, ci, co = ws.shape
    return ws.reshape(n, k * ci, co).astype(dtype)


@functools.partial(jax.jit, static_argnames=(
    "dils", "slope", "final_slope", "matmul_dtype", "interpret",
    "mask_t_total", "fold_offset", "fold_ch"))
def res_stream(x: jnp.ndarray, w1s, b1s, w2s, b2s, dils: tuple,
               slope: float = 0.2, final_slope=None,
               matmul_dtype=jnp.float32, interpret: bool = False,
               mask_t_total: int | None = None,
               fold_offset: int | None = None, fold_ch: int = 64,
               mask_bounds=None):
    """Run the whole len(dils)-block ResStack in one streaming kernel.

    x: [B, T, C] with C a multiple of 128 (callers lane-pad or fold
    smaller C); w1s/w2s: [n, 3, C, C]; b1s/b2s: [n, C]. Same contract as
    kernels.resstack.res_chain over the full dilation tuple.

    mask_bounds: optional TRACED [lo, hi) int32 pair narrowing the signal
    window in array coordinates — sequence-parallel shards pass their true
    signal range so zero-'same' masking matches the unsharded computation
    (positions outside it are treated as conv zero padding at every block).
    """
    bsz, t_total, ch = x.shape
    assert ch % LANE == 0, "res_stream needs lane-padded channels"
    tt = stream_lag(dils)
    lags = [d + 8 for d in dils]
    lags[-1] += tt - sum(lags)  # absorb 8-alignment slack
    hist_rows = [lag + d + 8 for lag, d in zip(lags, dils)]
    hist_off, acc = [], 0
    for rows in hist_rows:
        hist_off.append(acc)
        acc += rows
    max_slab = tt + max(hist_rows)

    n_in = pl.cdiv(t_total, tt)
    t_pad = n_in * tt
    # one extra zero tile so the flush step's unconditional copy stays in
    # bounds (its contents are position-masked to zero regardless)
    x_p = jnp.pad(x, ((0, 0), (0, t_pad + tt - t_total), (0, 0)))

    n = len(dils)
    kernel = functools.partial(
        _stream_kernel, tt=tt, dils=tuple(dils), lags=tuple(lags),
        hist_off=tuple(hist_off),
        t_total=t_total if mask_t_total is None else mask_t_total,
        t_arr=t_total,
        slope=slope, final_slope=final_slope, acc_dtype=matmul_dtype,
        double_buffer=not interpret,
        fold_offset=fold_offset, fold_ch=fold_ch,
        dyn_bounds=mask_bounds is not None)
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
        grid=(bsz, n_in + 1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + bspec + wspec,
        # step j finalizes output tile j-1 (max keeps step 0's garbage on
        # tile 0, which step 1 then overwrites before the flush)
        out_specs=pl.BlockSpec(
            (1, tt, ch), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt, ch), x.dtype),            # dma double buffer
            pltpu.VMEM((max_slab, ch), x.dtype),         # shared slab
            pltpu.VMEM((acc, ch), x.dtype),              # history rings
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p, *bargs, _stack_w(w1s, matmul_dtype), b1s.reshape(n, 1, ch),
      _stack_w(w2s, matmul_dtype), b2s.reshape(n, 1, ch))
    return out[:, :t_total, :]


def _lcm8(s: int) -> int:
    import math
    return 8 * s // math.gcd(8, s)


def up_stream_vmem_bytes(cin: int, cout: int, scale: int, dils,
                         isz: int, wsz: int) -> int:
    """VMEM footprint model for the up-fused streaming kernel: the plain
    model minus the full-rate dma double buffer, plus the slow-rate source
    buffers, the upsample weight bank, and the up-block transients (fp32
    source copy + activated copy + fp32 z + the assembled fresh tile)."""
    ch = 128
    n_up = 2 if cout * 2 == ch else 1
    tt = stream_lag(dils, align=_lcm8(scale))
    g_in = -(-(tt // scale + 9) // 8) * 8
    base = stream_vmem_bytes(ch, dils, isz, wsz)
    base -= 2 * tt * ch * isz                      # dropped full-rate dma
    base += 2 * n_up * g_in * cin * isz            # slow-rate dma buffers
    kk = n_up * cin
    base += (2 * kk * scale * ch + scale * ch) * wsz        # up weights
    # up-block transients (fp32 source copy, activated copy, fp32 z, fresh
    # tile) die before the widest ResStack block computes, so they only
    # count where they EXCEED the block transient already in `base`
    up_trans = (n_up * g_in * cin * 4 + g_in * kk * wsz
                + (tt // scale + 1) * scale * ch * 4 + tt * ch * isz)
    hist_rows = [2 * d + 16 for d in dils]
    hist_rows[-1] += stream_lag(dils) - sum(d + 8 for d in dils)
    block_trans = max(_trans_bytes(ch, stream_lag(dils), hr, wsz)
                      for hr in hist_rows)
    return base + max(0, up_trans - block_trans)


def up_stream_ok(cin: int, cout: int, scale: int, dils, t_arr: int,
                 isz: int = 2, wsz: int = 2,
                 interpret: bool = False) -> bool:
    """Route an (UpsampleNet, ResStack) stage pair through the fused
    kernel? Needs a lane-aligned source, a 128-lane (or foldable 64-lane)
    stack, tile starts that stay polyphase-aligned, and the VMEM fit."""
    import os
    if os.environ.get("VF_TPU_NO_PALLAS_UPRES"):
        return False
    ch = 128
    if cin % ch or cout not in (ch, ch // 2):
        return False
    tt = stream_lag(dils, align=_lcm8(scale))
    if t_arr < 2 * tt:
        return False
    return interpret or (up_stream_vmem_bytes(cin, cout, scale, dils,
                                              isz, wsz)
                         <= VMEM_BUDGET_STREAM)


@functools.partial(jax.jit, static_argnames=(
    "dils", "scale", "t_out", "fold", "slope", "final_slope",
    "matmul_dtype", "interpret"))
def up_res_stream(x_src: jnp.ndarray, w_up, b_up, w1s, b1s, w2s, b2s,
                  dils: tuple, scale: int, t_out: int,
                  fold: tuple | None = None,
                  slope: float = 0.2, final_slope=None,
                  matmul_dtype=jnp.float32, interpret: bool = False):
    """Fused UpsampleNet + whole ResStack in one streaming kernel.

    x_src: [B, T_in, Cin] (Cin % 128 == 0) — the PRE-upsample activation;
    w_up: [2s, Cin, Cout] torch tap order (kernels.upsample layout);
    t_out = T_in * scale. w1s/b1s/w2s/b2s as res_stream, at the kernel's
    lane width (128): plain mode passes Cout == 128 weights; fold mode
    (fold = (half, off, reach), Cout == 64, off and tt multiples of scale)
    passes block-diagonal 128-lane weights and returns the FOLDED
    [B, half + 2*reach, 128] array — lanes 0:64 rows r carry out[r], lanes
    64:128 carry out[off + r] — for the caller to unfold. The full-rate
    upsampled signal never touches HBM (VERDICT r3 next-2: the fold-mode
    pad/concat glue and the standalone upsample kernel's padded-cout
    writes were the late-vocoder bandwidth sinks)."""
    bsz, t_in, cin = x_src.shape
    ch = 128
    k = w_up.shape[0]
    assert k == 2 * scale and cin % ch == 0
    cout = w_up.shape[2]
    align = _lcm8(scale)
    tt = stream_lag(dils, align=align)
    lags = [d + 8 for d in dils]
    lags[-1] += tt - sum(lags)
    hist_rows = [lag + d + 8 for lag, d in zip(lags, dils)]
    hist_off, acc = [], 0
    for rows in hist_rows:
        hist_off.append(acc)
        acc += rows
    max_slab = tt + max(hist_rows)

    if fold is None:
        assert cout == ch
        halves = (0,)
        t_arr = t_out
        fold_offset = None
        fold_ch = cout
    else:
        len_a, off, reach = fold
        # off must keep both halves' DMA sublane residues equal (the
        # kernel lane-concatenates the halves) and polyphase-aligned
        assert cout * 2 == ch and off == len_a - reach
        assert off % scale == 0 and (off // scale) % 8 == 0
        halves = (0, off)
        t_arr = max(len_a + reach, t_out - off)
        fold_offset = off
        fold_ch = cout

    n_in = pl.cdiv(t_arr, tt)
    t_pad = n_in * tt
    # 8-aligned DMA row extent, with room for the per-half start-alignment
    # residue (kernel: start8 = const_h - const_h % 8)
    g_in = -(-(tt // scale + 9) // 8) * 8
    # source padding: `lead` zero rows cover q0-1 at step 0; the tail
    # covers the largest flush-step read (contents are masked regardless,
    # but the DMA must stay in bounds)
    lead = 8
    need = max((lead + off_h // scale - 1) // 8 * 8
               + (n_in + 1) * (tt // scale) + g_in
               for off_h in halves)
    # pre-activate a = x + sin(x) at the slow rate (fp32 math, exactly the
    # in-kernel computation it replaces; sin(0) = 0 keeps the zero padding
    # exact) — one XLA pass here beats per-step fp32 sin on the VPU
    x32 = x_src.astype(jnp.float32)
    x_act = (x32 + jnp.sin(x32)).astype(x_src.dtype)
    x_p = jnp.pad(x_act, ((0, 0), (lead, max(0, need - t_in - lead)),
                          (0, 0)))

    # pack to [1, 2K, s*128], K = n_halves*Cin: rows 0:K lo taps
    # (multiplying a[q]), K:2K hi taps (a[q-1]); columns (phase, half,
    # channel)-major so the kernel's [g, s*128] -> [g*s, 128] row-major
    # reshape lands each phase row in the (plain or fold-lane) layout.
    # Fold mode block-diagonalizes over halves: rows 0:Cin feed lanes
    # 0:64 (half A), rows Cin:2Cin feed lanes 64:128 (half B).
    if fold is None:
        w_eff, b_eff = w_up, b_up
    else:
        w_eff = jnp.zeros((k, 2 * cin, ch), w_up.dtype)
        w_eff = w_eff.at[:, :cin, :cout].set(w_up)
        w_eff = w_eff.at[:, cin:, cout:].set(w_up)
        b_eff = jnp.concatenate([b_up, b_up])
    kk = w_eff.shape[1]
    wb = w_eff.reshape(2, scale, kk, 1, ch).transpose(3, 0, 2, 1, 4)
    wk = wb.reshape(1, 2 * kk, scale * ch).astype(matmul_dtype)
    bk = jnp.tile(b_eff.reshape(1, 1, ch), (1, 1, scale))

    n = len(dils)
    kernel = functools.partial(
        _stream_kernel, tt=tt, dils=tuple(dils), lags=tuple(lags),
        hist_off=tuple(hist_off),
        t_total=t_out, t_arr=t_arr,
        slope=slope, final_slope=final_slope, acc_dtype=matmul_dtype,
        double_buffer=not interpret,
        fold_offset=fold_offset, fold_ch=fold_ch,
        dyn_bounds=False,
        up_scale=scale, up_pad=scale // 2 + scale % 2,
        up_lead=lead, up_halves=halves)
    wspec = [
        pl.BlockSpec((n, 3 * ch, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 3 * ch, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1, ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * kk, scale * ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, scale * ch), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_in + 1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + wspec,
        out_specs=pl.BlockSpec(
            (1, tt, ch), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch), x_src.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, len(halves), g_in, cin), x_src.dtype),
            pltpu.VMEM((max_slab, ch), x_src.dtype),     # shared slab
            pltpu.VMEM((acc, ch), x_src.dtype),          # history rings
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p, _stack_w(w1s, matmul_dtype), b1s.reshape(n, 1, ch),
      _stack_w(w2s, matmul_dtype), b2s.reshape(n, 1, ch), wk, bk)
    return out[:, :t_arr, :]
