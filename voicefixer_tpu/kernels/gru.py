"""VMEM-resident GRU recurrence as a Pallas kernel.

The denoiser stacks two 2-layer bidirectional GRUs (reference
/root/reference/voicefixer/restorer/model.py:77-90); with the input
projection hoisted into one big MXU matmul (ops/gru.py), the remaining
recurrence `h' = f(h, xp_t)` is the only genuinely sequential computation in
the whole pipeline. A lax.scan keeps the per-step tensors in HBM (XLA
dynamic-slices xs / dynamic-update-slices ys each step); this kernel instead
streams [T_BLK, 3H] time blocks through VMEM with the standard sequential-
grid pipeline, carries h in a VMEM scratch across blocks, and does the
[1,H]x[H,3H] recurrent matmul entirely on-chip.

Torch nn.GRU gate math (gate order r, z, n):
    r = sigmoid(xr + h @ Whr + bhr)        (b_hh folded into hp below)
    z = sigmoid(xz + h @ Whz + bhz)
    n = tanh(xn + r * (h @ Whn + bhn))
    h' = (1-z) * n + z * h
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 256


def _gru_kernel(x_ref, w_ref, b_ref, out_ref, h_scratch, *,
                hidden: int, t_total: int, t_blk: int, reverse: bool):
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    w = w_ref[:]          # [H, 3H]
    b = b_ref[:]          # [1, 3H]

    # Global start (in time) of this block. With reverse index maps the
    # blocks arrive last-to-first; within the block we also step last-to-
    # first so the recurrence sees time strictly decreasing.
    blk_start = jax.lax.select(
        jnp.bool_(reverse), (n_blk - 1 - t_idx) * t_blk, t_idx * t_blk)

    def step(i, h):
        idx = jax.lax.select(jnp.bool_(reverse), t_blk - 1 - i, i)
        t_global = blk_start + idx
        xp = x_ref[0, pl.ds(idx, 1), :]            # [1, 3H]
        # b_hh rides on the recurrent projection: the n-gate needs
        # r * (h @ Whn + bhn), so b cannot be folded into xp.
        # HIGHEST: fp32 recurrent state would silently truncate to one bf16
        # MXU pass under the default dot precision
        hp = jnp.dot(h, w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) + b  # [1, 3H]
        xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], \
            xp[:, 2 * hidden:]
        hr, hz, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], \
            hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        # Padded tail steps (t >= t_total) must not advance the state: in
        # reverse order they run BEFORE the real data.
        h_new = jnp.where(t_global < t_total, h_new, h)
        out_ref[0, pl.ds(idx, 1), :] = h_new
        return h_new

    h = jax.lax.fori_loop(0, t_blk, step, h_scratch[:])
    h_scratch[:] = h


def _gru_gates(xp, hp, h, hidden):
    xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    hr, hz, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], hp[:, 2 * hidden:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _gru_bidir_kernel(xf_ref, xb_ref, w_ref, b_ref, outf_ref, outb_ref,
                      h_scratch, *, hidden: int, t_total: int, t_blk: int,
                      acc_dtype):
    """Both directions in ONE sequential pass: step i advances the forward
    recurrence at global time (blk j, idx i) and the backward recurrence at
    the mirrored global time — the two small recurrent matmuls issue back to
    back and pipeline on the MXU, roughly halving the per-step latency that
    dominates this op."""
    t_idx = pl.program_id(1)
    n_blk = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    prec = (jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wf = w_ref[0].astype(acc_dtype)   # [H, 3H]
    wb = w_ref[1].astype(acc_dtype)
    bf = b_ref[0:1, 0, :]             # [1, 3H]
    bb = b_ref[1:2, 0, :]

    def step(i, h):
        idx_b = t_blk - 1 - i
        g_f = t_idx * t_blk + i
        g_b = (n_blk - 1 - t_idx) * t_blk + idx_b
        hf, hb = h[0:1], h[1:2]
        hpf = jnp.dot(hf.astype(acc_dtype), wf,
                      preferred_element_type=jnp.float32,
                      precision=prec) + bf
        hpb = jnp.dot(hb.astype(acc_dtype), wb,
                      preferred_element_type=jnp.float32,
                      precision=prec) + bb
        hf_new = _gru_gates(xf_ref[0, pl.ds(i, 1), :], hpf, hf, hidden)
        hb_new = _gru_gates(xb_ref[0, pl.ds(idx_b, 1), :], hpb, hb, hidden)
        # padded tail steps must not advance the state (in reverse order
        # they run BEFORE the real data)
        hf_new = jnp.where(g_f < t_total, hf_new, hf)
        hb_new = jnp.where(g_b < t_total, hb_new, hb)
        outf_ref[0, pl.ds(i, 1), :] = hf_new.astype(outf_ref.dtype)
        outb_ref[0, pl.ds(idx_b, 1), :] = hb_new.astype(outb_ref.dtype)
        return jnp.concatenate([hf_new, hb_new], axis=0)

    h_scratch[:] = jax.lax.fori_loop(0, t_blk, step, h_scratch[:])


@functools.partial(jax.jit, static_argnames=("interpret", "matmul_dtype"))
def gru_seq_bidir(xf_proj: jnp.ndarray, xb_proj: jnp.ndarray,
                  w_f: jnp.ndarray, w_b: jnp.ndarray,
                  b_f: jnp.ndarray, b_b: jnp.ndarray,
                  matmul_dtype=jnp.float32,
                  interpret: bool = False):
    """Fused forward+backward GRU recurrence over pre-projected inputs.

    xf_proj/xb_proj: [B, T, 3H] (per-direction input projections);
    w_f/w_b: [H, 3H]; b_f/b_b: [3H]. Returns (fwd [B,T,H], bwd [B,T,H]) —
    equal to gru_seq(xf_proj, w_f, b_f) and gru_seq(xb_proj, w_b, b_b,
    reverse=True). matmul_dtype=bfloat16 runs the recurrent matmul as a
    single native MXU pass (production precision); fp32 state is kept in
    VMEM scratch either way.
    """
    bsz, t_total, g = xf_proj.shape
    hidden = g // 3
    t_blk = min(T_BLK, max(8, t_total))
    t_blk = -(-t_blk // 8) * 8
    n_blk = pl.cdiv(t_total, t_blk)
    t_pad = n_blk * t_blk
    if t_pad != t_total:
        pad = ((0, 0), (0, t_pad - t_total), (0, 0))
        xf_proj = jnp.pad(xf_proj, pad)
        xb_proj = jnp.pad(xb_proj, pad)

    fwd_map = lambda i, j: (i, j, 0)
    bwd_map = lambda i, j: (i, pl.num_programs(1) - 1 - j, 0)
    kernel = functools.partial(_gru_bidir_kernel, hidden=hidden,
                               t_total=t_total, t_blk=t_blk,
                               acc_dtype=matmul_dtype)
    outf, outb = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec((1, t_blk, g), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blk, g), bwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, g), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, g), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_blk, hidden), fwd_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blk, hidden), bwd_map,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t_pad, hidden), xf_proj.dtype),
            jax.ShapeDtypeStruct((bsz, t_pad, hidden), xf_proj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, hidden), jnp.float32)],
        interpret=interpret,
    )(xf_proj, xb_proj, jnp.stack([w_f, w_b]),
      jnp.stack([b_f.reshape(1, g), b_b.reshape(1, g)]))
    return outf[:, :t_total, :], outb[:, :t_total, :]


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_seq(x_proj: jnp.ndarray, w_hh_t: jnp.ndarray, b_hh: jnp.ndarray,
            reverse: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Run the GRU recurrence over a pre-projected input.

    x_proj: [B, T, 3H] = x @ W_ih^T + b_ih. w_hh_t: [H, 3H]. b_hh: [3H].
    Returns hidden states [B, T, H]. Matches ops.gru.gru_single_direction
    (which takes the unprojected x) given the same projection.
    """
    bsz, t_total, g = x_proj.shape
    hidden = g // 3
    t_blk = min(T_BLK, max(8, t_total))
    t_blk = -(-t_blk // 8) * 8  # Mosaic sublane tiling
    n_blk = pl.cdiv(t_total, t_blk)
    t_pad = n_blk * t_blk
    if t_pad != t_total:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, t_pad - t_total), (0, 0)))

    if reverse:
        x_map = out_map = lambda i, j: (i, pl.num_programs(1) - 1 - j, 0)
    else:
        x_map = out_map = lambda i, j: (i, j, 0)

    kernel = functools.partial(_gru_kernel, hidden=hidden, t_total=t_total,
                               t_blk=t_blk, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec((1, t_blk, g), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk, hidden), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, hidden), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((1, hidden), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh_t, b_hh.reshape(1, g))
    return out[:, :t_total, :]
