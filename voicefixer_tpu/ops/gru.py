"""GRU with torch-parity gate math, as a lax.scan over time.

The reference denoiser stacks two 2-layer bidirectional GRUs
(/root/reference/voicefixer/restorer/model.py:77-90, BN_GRU at :22-62).

TPU design: the input projection x @ W_ih^T + b_ih for ALL timesteps is one
large MXU matmul hoisted out of the scan; the scan body only does the small
recurrent matmul [B, H] @ [H, 3H]. This keeps the serial portion minimal —
the GRU is the one genuinely sequential op in the whole pipeline.

Torch gate math (nn.GRU):
    r = sigmoid(x_r + h @ W_hr^T + b_hr)
    z = sigmoid(x_z + h @ W_hz^T + b_hz)
    n = tanh(x_n + r * (h @ W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
with gate order (r, z, n) in the stacked weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from voicefixer_tpu.ops.precision import get_precision


def gru_single_direction(x: jnp.ndarray, params: dict,
                         reverse: bool = False) -> jnp.ndarray:
    """x: [B, T, In]. params: w_ih [3H, In], w_hh [3H, H], b_ih/b_hh [3H].
    Returns [B, T, H]."""
    h_dim = params["w_hh"].shape[1]
    b, t, _ = x.shape
    # hoisted input projection: [B, T, 3H]
    x_proj = jnp.einsum("bti,gi->btg", x, params["w_ih"],
                        precision=get_precision()) + params["b_ih"]
    w_hh_t = params["w_hh"].T  # [H, 3H]
    b_hh = params["b_hh"]

    from voicefixer_tpu import kernels
    if kernels.use("gru") and h_dim % 128 == 0:
        # lane alignment: H and 3H must tile onto 128-wide lanes; smaller
        # hidden sizes (test configs) take the scan path
        from voicefixer_tpu.kernels.gru import gru_seq
        return gru_seq(x_proj, w_hh_t, b_hh, reverse=reverse)

    def step(h, xp):
        hp = jnp.matmul(h, w_hh_t, precision=get_precision()) + b_hh  # [B, 3H]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((b, h_dim), dtype=x.dtype)
    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 3H]
    _, ys = lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


def _proj(x, p):
    return jnp.einsum("bti,gi->btg", x, p["w_ih"],
                      precision=get_precision()) + p["b_ih"]


def gru(x: jnp.ndarray, params: dict, num_layers: int,
        bidirectional: bool) -> jnp.ndarray:
    """Multi-layer (bi)GRU, torch nn.GRU(batch_first=True) parity.

    params: {"l{i}": fwd_params, "l{i}_reverse": bwd_params, ...}.
    Returns [B, T, H * num_directions] from the last layer.

    On TPU, bidirectional layers run BOTH directions in one fused kernel
    pass (kernels.gru.gru_seq_bidir) — the recurrence is the pipeline's one
    serial op, and interleaving the two directions' steps halves its
    latency-bound wall time.
    """
    from voicefixer_tpu import kernels
    out = x
    for layer in range(num_layers):
        pf = params[f"l{layer}"]
        h_dim = pf["w_hh"].shape[1]
        if (bidirectional and kernels.use("gru") and h_dim % 128 == 0):
            from voicefixer_tpu.kernels.gru import gru_seq_bidir
            pb = params[f"l{layer}_reverse"]
            fwd, bwd = gru_seq_bidir(
                _proj(out, pf), _proj(out, pb),
                pf["w_hh"].T, pb["w_hh"].T, pf["b_hh"], pb["b_hh"],
                matmul_dtype=kernels.matmul_dtype())
            out = jnp.concatenate([fwd, bwd], axis=-1)
            continue
        fwd = gru_single_direction(out, pf, reverse=False)
        if bidirectional:
            bwd = gru_single_direction(out, params[f"l{layer}_reverse"],
                                       reverse=True)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


def init_gru_params(key, input_dim: int, hidden_dim: int, num_layers: int,
                    bidirectional: bool, dtype=jnp.float32) -> dict:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init like torch nn.GRU defaults."""
    params = {}
    num_dir = 2 if bidirectional else 1
    scale = 1.0 / jnp.sqrt(hidden_dim)
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden_dim * num_dir
        for suffix in ([""] if not bidirectional else ["", "_reverse"]):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            params[f"l{layer}{suffix}"] = {
                "w_ih": jax.random.uniform(k1, (3 * hidden_dim, in_dim),
                                           dtype, -scale, scale),
                "w_hh": jax.random.uniform(k2, (3 * hidden_dim, hidden_dim),
                                           dtype, -scale, scale),
                "b_ih": jax.random.uniform(k3, (3 * hidden_dim,),
                                           dtype, -scale, scale),
                "b_hh": jax.random.uniform(k4, (3 * hidden_dim,),
                                           dtype, -scale, scale),
            }
    return params
