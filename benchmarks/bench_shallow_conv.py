#!/usr/bin/env python
"""Probe the shallow U-Net levels' conv strategies on the chip: for the
narrow-channel block shapes (C in {32, 64}, large spatial), compare
  lax     — lax.conv_general_dilated (the r5 default for shallow levels)
  im2col  — conv2d_3x3_gemm ([T*F, 9C] x [9C, Co] GEMM; K-dim densified,
            output lanes still C/128 wasted)
Prints one JSON line per (shape, variant). Guides whether the shallow-level
gate in models/resunet.py should widen.
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

    from voicefixer_tpu.ops.conv import (conv2d, conv2d_3x3_gemm,
                                         conv2d_3x3_s2d)
    from voicefixer_tpu.ops.precision import activation_dtype, set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    adt = activation_dtype()

    # (name, [B,T,F,Ci], Co) — the shallow production block shapes
    shapes = [
        ("enc1_32", (1, 3008, 127, 32), 32),
        ("enc2_64", (1, 1504, 63, 64), 64),
        ("dec6cat_64to32", (1, 3008, 96, 64), 32),
        ("dec5cat_128to64", (1, 1504, 48, 128), 64),
    ]
    for name, shp, co in shapes:
        ci = shp[-1]
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        w = (jax.random.normal(k[0], (3, 3, ci, co), jnp.float32)
             * 0.05).astype(adt)
        x0 = (jax.random.normal(k[1], shp, jnp.float32) * 0.1).astype(adt)

        def body_lax(x, w=w, co=co):
            y = conv2d(x, w, padding=(1, 1))
            return x + 1e-3 * jnp.concatenate(
                [y] * (x.shape[-1] // co), -1)

        def body_gemm(x, w=w, co=co):
            y = conv2d_3x3_gemm(x, w)
            return x + 1e-3 * jnp.concatenate(
                [y] * (x.shape[-1] // co), -1)

        def body_s2d(x, w=w, co=co):
            y = conv2d_3x3_s2d(x, w)
            return x + 1e-3 * jnp.concatenate(
                [y] * (x.shape[-1] // co), -1)

        hw = shp[1] * shp[2]
        fl = hw * 9 * ci * co * 2
        for variant, body in (("lax", body_lax), ("im2col", body_gemm),
                              ("s2d", body_s2d)):
            # sub-ms bodies: long chains (8 vs 72 applications) lift the
            # differenced segment far above the tunnel's per-dispatch noise
            ms = chained_ms(body, x0, ks=(8, 72), reps=4)
            print(json.dumps({
                "metric": f"shallow_{name}_{variant}",
                "value": round(ms, 3), "unit": "ms",
                "tflops": round(fl / (max(ms, 1e-3) * 1e-3) / 1e12, 1)}),
                flush=True)


if __name__ == "__main__":
    main()
