"""Fused ResUNet ConvBlockRes: bn -> lrelu -> conv3x3 -> bn -> lrelu ->
conv3x3 (+ residual / 1x1 shortcut) in ONE kernel pass.

Reference semantics: /root/reference/voicefixer/restorer/modules.py:7-76
(eval mode, running-stats BN pre-folded to (scale, shift) leaves by
ops.conv.fold_bn_eval).

Why: the U-Net's early levels run 3x3 convs at [3008, 127] with 32-64
channels. XLA's native NHWC conv achieves ~7 TFLOP/s there (v5e) — the
narrow channel dim starves the MXU lanes AND the odd freq extent fragments
its tiling. This kernel instead:

- flattens (T, F) into ONE row axis with F padded to `Fp` (a multiple of 8,
  >= F+1): the appended zero columns make every 3x3 tap a PLAIN ROW SHIFT
  of the flattened stream — x[t+dt, f+df] lives exactly Fp*dt + df rows
  away, and taps that cross the f edges read the zero columns, reproducing
  'same' zero padding along F for free;
- builds the im2col slab X9[r, (dt, df, ci)] in VMEM with 9 shifted stores
  and contracts it in a single K=9*Cin matmul per conv (K >= 288 keeps the
  MXU busy where the native conv's K=Cin did not);
- keeps the intermediate activation VMEM-resident between the two convs and
  fuses the folded BN, leaky-relu, edge masks, and the residual add.

Zero-'same' masking along T and the F pad columns is applied to the conv
INPUTS (after each bn+lrelu): bn's shift makes padding rows nonzero, so
they must be re-zeroed before each conv consumes them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024


def _ceil8(v: int) -> int:
    return -(-v // 8) * 8


def _valid_mask(rows: int, row0, fp: int, f: int, l_total: int):
    """[rows, 1] mask: True where global flat row g = row0 + r is inside
    the signal — 0 <= g < l_total and g % fp < f (the real freq columns)."""
    g = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return (g >= 0) & (g < l_total) & (jax.lax.rem(g, fp) < f)


def _block_kernel(x_hbm, s1_ref, w1_ref, s2_ref, w2_ref, sc_ref, out_ref,
                  x_s, x9_s, sem, *, tm: int, fp: int, f: int, l_total: int,
                  ci: int, co: int, slope: float, has_shortcut: bool,
                  acc_dtype, double_buffer: bool):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)
    ha = 2 * fp + 16   # input slab one-sided halo
    hb = fp + 8        # h1 slab one-sided halo
    len_a = tm + 2 * ha

    def copy_in(t, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(t * tm, len_a), :],
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
        slot = 0
        copy_in(t_idx, 0).start()
        copy_in(t_idx, 0).wait()

    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    t0 = t_idx * tm

    def conv3x3(src, src_rows, src_row0, scale, shift, w_ref, out_rows):
        """bn+lrelu+mask on `src`, then the 9-tap row-shift matmul.
        src rows cover [src_row0, src_row0 + src_rows); the output covers
        rows [src_row0 + ha_local, ...): callers align so that output row r
        reads src rows r + dt*fp + df + 7 for dt, df in {0,1,2}."""
        a = src.astype(jnp.float32) * scale + shift
        a = jnp.where(a >= 0, a, slope * a)
        a = jnp.where(_valid_mask(src_rows, src_row0, fp, f, l_total),
                      a, 0.0).astype(acc_dtype)
        cc = a.shape[-1]
        for k, (dt, df) in enumerate([(dt, df) for dt in range(3)
                                      for df in range(3)]):
            off = dt * fp + df + 7
            x9_s[0: out_rows, k * cc: (k + 1) * cc] = a[off: off + out_rows]
        return jnp.dot(x9_s[0: out_rows, 0: 9 * cc],
                       w_ref[0], precision=prec,
                       preferred_element_type=jnp.float32)

    # conv1: h1 over rows [t0 - hb, t0 + tm + hb) — a slab whose row r maps
    # to global t0 - hb + r; its taps read the input slab (base t0 - ha) at
    # r + dt*fp + df + 7 because
    # (t0 - hb + r) + (dt-1)*fp + (df-1) - (t0 - ha) = r + dt*fp + df + 7.
    rows1 = tm + 2 * hb
    h1 = conv3x3(x_s[slot], len_a, t0 - ha, s1_ref[0, 0:1, :ci],
                 s1_ref[0, 1:2, :ci], w1_ref, rows1)

    # conv2: output rows [t0, t0 + tm); reads h1 (base t0 - hb) at
    # r + dt*fp + df + 7 by the same identity (ha - hb = hb).
    h2 = conv3x3(h1, rows1, t0 - hb, s2_ref[0, 0:1, :co],
                 s2_ref[0, 1:2, :co], w2_ref, tm)
    h2 = jnp.where(_valid_mask(tm, t0, fp, f, l_total), h2, 0.0)

    origin = x_s[slot, pl.ds(ha, tm), :].astype(jnp.float32)
    if has_shortcut:
        res = jnp.dot(origin.astype(acc_dtype), sc_ref[0, :ci, :],
                      precision=prec, preferred_element_type=jnp.float32) \
            + sc_ref[0, ci:ci + 1, :]
        res = jnp.where(_valid_mask(tm, t0, fp, f, l_total), res, 0.0)
    else:
        res = origin
    out_ref[0, :, :] = (h2 + res).astype(out_ref.dtype)


def conv_block_res(x, params, slope: float, matmul_dtype=jnp.float32,
                   tm: int = 2048, interpret: bool = False):
    """Fused ConvBlockRes on NHWC input x [B, T, F, Cin] (eval mode with
    pre-folded BN). Drop-in for models.resunet._conv_block_res.

    Channels below a full lane (the 32/64-ch early U-Net levels, where
    XLA's conv runs ~7 TF/s) are zero-padded to 128 here: Mosaic rejects
    non-128 lane extents in the HBM<->VMEM copies, and padded channels stay
    exactly zero through scale/shift (zero pads), lrelu, conv (zero weight
    rows/cols), and the residual. The dense-128 matmul wastes
    (128/ci)x(128/co) MACs but still beats the lane-starved XLA conv on
    these levels (bench_resunet_levels.py)."""
    bsz, t, f, ci = x.shape
    co = params["conv1"]["w"].shape[-1]
    if ci < 128 or co < 128:
        pi, po = 128 - ci, 128 - co

        def padw(w):  # [3, 3, ci, co] -> [3, 3, 128, 128]
            return jnp.pad(w, ((0, 0), (0, 0), (0, max(pi, 0)),
                               (0, max(po, 0))))

        def padv(v, n):
            return jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, n),))

        pp = {
            "conv1": {"w": padw(params["conv1"]["w"])},
            "conv2": {"w": jnp.pad(params["conv2"]["w"],
                                   ((0, 0), (0, 0), (0, max(po, 0)),
                                    (0, max(po, 0))))},
            "bn1": {"scale": padv(params["bn1"]["scale"].reshape(1, -1),
                                  max(pi, 0))[0],
                    "shift": padv(params["bn1"]["shift"].reshape(1, -1),
                                  max(pi, 0))[0]},
            "bn2": {"scale": padv(params["bn2"]["scale"].reshape(1, -1),
                                  max(po, 0))[0],
                    "shift": padv(params["bn2"]["shift"].reshape(1, -1),
                                  max(po, 0))[0]},
        }
        if "shortcut" in params:
            pp["shortcut"] = {
                "w": jnp.pad(params["shortcut"]["w"],
                             ((0, 0), (0, 0), (0, max(pi, 0)),
                              (0, max(po, 0)))),
                "b": padv(params["shortcut"]["b"].reshape(1, -1),
                          max(po, 0))[0]}
        elif pi:
            # identity residual with ci < co is impossible in the model
            # (shortcut exists whenever ci != co); ci == co < 128 keeps
            # the identity exact through the zero-padded lanes
            pass
        out = conv_block_res(jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                                         (0, max(pi, 0)))),
                             pp, slope, matmul_dtype=matmul_dtype, tm=tm,
                             interpret=interpret)
        return out[..., :co]
    fp = _ceil8(f + 1)
    l_total = t * fp

    # flatten (T, F) -> rows; the F pad columns are the zero lanes that make
    # all taps plain row shifts (module docstring)
    xf = jnp.pad(x, ((0, 0), (0, 0), (0, fp - f), (0, 0))).reshape(
        bsz, l_total, ci)

    tm = min(tm, max(fp, _ceil8(l_total)))
    tm = (tm // fp) * fp if tm >= fp else fp
    tm = max(8, _ceil8(tm))
    ha = 2 * fp + 16
    n_blk = pl.cdiv(l_total, tm)
    l_pad = n_blk * tm
    xf = jnp.pad(xf, ((0, 0), (ha, ha + l_pad - l_total), (0, 0)))

    def fold(bn):
        return jnp.stack([jnp.asarray(bn["scale"], jnp.float32),
                          jnp.asarray(bn["shift"], jnp.float32)])[None]

    w1 = params["conv1"]["w"].reshape(9 * ci, co)[None].astype(matmul_dtype)
    w2 = params["conv2"]["w"].reshape(9 * co, co)[None].astype(matmul_dtype)
    has_shortcut = "shortcut" in params
    if has_shortcut:
        scw = params["shortcut"]["w"].reshape(ci, co)
        scb = params["shortcut"]["b"].reshape(1, co)
        sc = jnp.concatenate([scw, scb], axis=0)[None].astype(matmul_dtype)
    else:
        sc = jnp.zeros((1, ci + 1, co), matmul_dtype)

    kernel = functools.partial(
        _block_kernel, tm=tm, fp=fp, f=f, l_total=l_total, ci=ci, co=co,
        slope=slope, has_shortcut=has_shortcut, acc_dtype=matmul_dtype,
        double_buffer=not interpret)
    x9_lanes = 9 * max(ci, co)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, ci), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * ci, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * co, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci + 1, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, co), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, l_pad, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tm + 2 * ha, ci), x.dtype),
            pltpu.VMEM((tm + 2 * (fp + 8), x9_lanes), matmul_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xf, fold(params["bn1"]), w1, fold(params["bn2"]), w2, sc)
    # unflatten and drop the F pad columns
    return out[:, :l_total, :].reshape(bsz, t, fp, co)[:, :, :f, :]


def plan_tm(params, x, training: bool) -> int | None:
    """Dispatch plan: eval-mode folded BN, 3x3 convs, channels that fit the
    VMEM model, enough rows to amortize the halo. Returns the largest
    feasible time tile (rows of the flattened (T, F) stream), or None when
    the block must take the jax path.

    The VMEM model mirrors conv_block_res's actual allocations — the bf16
    production path halves both the input stream and the x9 im2col slab vs
    the fp32 parity path, which is what makes the large-fp shallow levels
    (fp = 128 at enc1/dec6) fit at all. (r4 regression fix: the old guard
    hardcoded tm = 2048 and costed x9 at 4 bytes, so NO production level
    ever dispatched to this kernel.)"""
    if training or "scale" not in params.get("bn1", {}):
        return None
    w1 = params["conv1"]["w"]
    w2 = params["conv2"]["w"]
    if w1.shape[:2] != (3, 3) or w2.shape[:2] != (3, 3):
        return None
    ci, co = w1.shape[2], w1.shape[3]
    if co > 128 or ci > 128:
        return None  # wide levels: the im2col GEMM path serves those
    if ci < 128 and ci != co and "shortcut" not in params:
        return None  # identity residual can't lane-pad across widths
    # channels below a full lane are zero-padded to 128 by the wrapper
    # (Mosaic rejects non-128 lane extents in HBM<->VMEM copies); the
    # VMEM/cost model therefore sees 128x128
    ci = co = 128
    bsz, t, f, _ = x.shape
    fp = _ceil8(f + 1)
    if t * fp < 8 * (2 * fp + 16):
        return None
    from voicefixer_tpu import kernels
    isz = jnp.dtype(x.dtype).itemsize
    wsz = jnp.dtype(kernels.matmul_dtype()).itemsize
    for tm in (2048, 1024, 512):
        if tm < fp:
            continue
        need = (2 * (tm + 2 * (2 * fp + 16)) * ci * isz      # input stream
                + (tm + 2 * (2 * fp + 16)) * ci * wsz  # conv1 activated in
                + (tm + 2 * (fp + 8)) * 9 * max(ci, co) * wsz  # x9 slab
                + (tm + 2 * (fp + 8)) * co * 4                 # fp32 h1
                + (tm + 2 * (fp + 8)) * co * wsz               # h1 act copy
                + 2 * tm * co * 4)                    # fp32 h2 + residual
        if need <= VMEM_BUDGET:
            return tm
    return None


def eligible(params, x, training: bool) -> bool:
    """True when plan_tm finds a feasible tile (kept for callers/tests that
    only need the boolean)."""
    return plan_tm(params, x, training) is not None
