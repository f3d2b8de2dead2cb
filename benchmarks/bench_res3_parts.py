#!/usr/bin/env python
"""Decompose the late-vocoder stages (res3 C=64, up3, post_conv) into
kernel vs XLA-glue costs, to target the round-4 MFU work (VERDICT r3
weak-3: res3 stuck at ~13.5 ms, attributed to the fold-mode HBM round
trips; up3/post also sit far off their bandwidth rooflines).

Pieces measured (chained-K methodology from bench_stages):
- res3_full        : current res_stack path (fold + kernel + unfold)
- res3_fold_glue   : ONLY the fold + unfold XLA passes (no kernel)
- res3_stream_only : ONLY res_stream on a pre-folded array
- up3_full         : current upsample kernel path (pads cout 64->128)
- post_current     : current 7-shifted-einsum post conv
- post_matmul      : candidate [T,64]x[64,7] matmul + diagonal-shift sum

Prints one JSON line per piece.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_stages import chained_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from voicefixer_tpu import kernels
    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.kernels.resstack import _bdiag, _ceil8
    from voicefixer_tpu.kernels.resstream import res_stream
    from voicefixer_tpu.models import vocoder
    from voicefixer_tpu.models.vocoder import _post_conv, _res_stack, \
        _upsample
    from voicefixer_tpu.ops.precision import activation_dtype, set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    cfg = DEFAULT_CONFIG.vocoder
    sr = DEFAULT_CONFIG.pipeline.sample_rate
    t0 = int(30 * sr) // 441 + 1
    t0 += t0 % 2 + 4
    t_res3 = t0 * 441  # 1,325,646 with the production pad

    adt = activation_dtype()
    mdt = kernels.matmul_dtype()
    params = vocoder.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda p: p.astype(adt), params)
    stage3 = params["stages"][3]
    res_p = stage3["res"]
    ch = 64
    dils = tuple(3 ** (i % 10) for i in range(len(res_p)))
    reach = _ceil8(sum(d + 1 for d in dils)) + 8
    half = t_res3 // 2
    off = half - reach

    def rnd(shape):
        return (jax.random.normal(jax.random.PRNGKey(1), shape,
                                  dtype=jnp.float32) * 0.1).astype(adt)

    x64 = rnd((1, t_res3, ch))

    def fold(x):
        la = jnp.pad(x[:, : half + reach, :], ((0, 0), (0, reach), (0, 0)))
        lb = jnp.pad(x[:, off:, :], ((0, 0), (0, reach), (0, 0)))
        return jnp.concatenate([la, lb], axis=-1)

    def unfold(xf):
        return jnp.concatenate(
            [xf[:, :half, :ch], xf[:, reach: reach + half, ch:]], axis=1)

    def body_full(x):
        y, act = _res_stack(res_p, x, 3, cfg.leaky_slope_res,
                            final_slope=cfg.leaky_slope_act)
        return x + 1e-3 * y

    def body_glue(x):
        return x + 1e-3 * unfold(fold(x))

    w1s = jnp.stack([_bdiag(p["c1"]["w"], ch, ch) for p in res_p])
    b1s = jnp.stack([jnp.concatenate([p["c1"]["b"]] * 2) for p in res_p])
    w2s = jnp.stack([_bdiag(p["c2"]["w"], ch, ch) for p in res_p])
    b2s = jnp.stack([jnp.concatenate([p["c2"]["b"]] * 2) for p in res_p])
    xf0 = fold(x64)

    def body_stream(xf):
        out = res_stream(xf, w1s, b1s, w2s, b2s, dils=dils,
                         slope=cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt,
                         mask_t_total=t_res3, fold_offset=off, fold_ch=ch)
        return xf + 1e-3 * out

    t_in3 = t_res3 // 3
    x128 = rnd((1, t_in3, 128))

    def body_up3(x):
        y = _upsample(stage3["up"], x, 3)
        y2 = y[:, : x.shape[1] * 3, :].reshape(x.shape[0], x.shape[1], -1)
        return x + 1e-3 * y2[..., : x.shape[-1]]

    def body_post_cur(x):
        return x + 1e-3 * _post_conv(params["post"], x).astype(x.dtype)

    def body_post_mm(x):
        from voicefixer_tpu.ops.conv import reflection_pad1d
        from voicefixer_tpu.ops.precision import get_precision
        w, b = params["post"]["w"], params["post"]["b"]
        k = w.shape[0]
        pad = (k - 1) // 2
        t = x.shape[1]
        s = jnp.einsum("btc,ck->btk", x, w[..., 0].T,
                       precision=get_precision(),
                       preferred_element_type=jnp.float32)
        sp = reflection_pad1d(s, pad)
        y = None
        for j in range(k):
            yj = sp[:, j: j + t, j]
            y = yj if y is None else y + yj
        out = jnp.tanh(y + b[0])[..., None]
        return x + 1e-3 * out.astype(x.dtype)

    def body_manual(x):
        out = res_stream(fold(x), w1s, b1s, w2s, b2s, dils=dils,
                         slope=cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt,
                         mask_t_total=t_res3, fold_offset=off, fold_ch=ch)
        return x + 1e-3 * unfold(out)

    from voicefixer_tpu.kernels.resstack import up_res_stack

    def body_fused_up3res3(x):
        y = up_res_stack(stage3["up"], res_p, x, 3, 3,
                         cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt)
        assert y is not None, "fused up3+res3 ineligible"
        y2 = y[:, : x.shape[1] * 3, :].reshape(
            x.shape[0], x.shape[1], -1)[..., : x.shape[-1]]
        return x + 1e-3 * y2

    stage2 = params["stages"][2]
    t_in2 = t_res3 // 9
    x256 = rnd((1, t_in2, 256))

    def body_fused_up2res2(x):
        y = up_res_stack(stage2["up"], stage2["res"], x, 3, 3,
                         cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt)
        assert y is not None, "fused up2+res2 ineligible"
        y2 = y[:, : x.shape[1] * 3, :].reshape(
            x.shape[0], x.shape[1], -1)[..., : x.shape[-1]]
        return x + 1e-3 * y2

    rows = [
        ("res3_full", body_full, x64),
        ("res3_manual_foldstream", body_manual, x64),
        ("res3_fold_glue", body_glue, x64),
        ("res3_stream_only", body_stream, xf0),
        ("up3_full", body_up3, x128),
        ("fused_up3res3", body_fused_up3res3, x128),
        ("fused_up2res2", body_fused_up2res2, x256),
        ("post_current", body_post_cur, x64),
        ("post_matmul", body_post_mm, x64),
    ]
    for name, body, x in rows:
        ms = chained_ms(body, x)
        print(json.dumps({"metric": name, "value": round(ms, 2),
                          "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
