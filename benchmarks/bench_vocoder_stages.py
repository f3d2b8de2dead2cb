#!/usr/bin/env python
"""Per-substage latency breakdown of the vocoder generator on the 30 s
chunk: condnet+pre, each (UpsampleNet, ResStack) pair, post conv. Guides
which kernel to attack next (the vocoder is the pipeline's dominant stage).

Methodology matches bench_stages.py: K applications chained inside one
jitted program (output feeds input via a cheap shape-preserving adapter),
K=4 vs K=8 differenced to cancel the tunnel's dispatch cost.

Prints one JSON line per substage.
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

    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.models import vocoder
    from voicefixer_tpu.models.vocoder import (_post_conv, _res_stack,
                                               _upsample)
    from voicefixer_tpu.ops.conv import conv1d, elu, leaky_relu, \
        reflection_pad1d
    from voicefixer_tpu.ops.precision import activation_dtype, set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    cfg = DEFAULT_CONFIG.vocoder
    seconds = float(os.environ.get("BENCH_CHUNK_SECONDS", "30"))
    sr = DEFAULT_CONFIG.pipeline.sample_rate
    # mel frames for a 30 s chunk (+ tail pad to even, vocoder_facade)
    t0 = int(seconds * sr) // 441 + 1
    t0 += t0 % 2 + 4

    params = vocoder.init(jax.random.PRNGKey(0), cfg)
    adt = activation_dtype()
    params = jax.tree.map(lambda p: p.astype(adt), params)

    def rnd(shape):
        return (jax.random.normal(jax.random.PRNGKey(1), shape,
                                  dtype=jnp.float32) * 0.1).astype(adt)

    def body_condnet(x):
        h = x
        for layer in params["condnet"]:
            h = elu(conv1d(h, layer["w"], layer["b"], padding=1))
        h = conv1d(reflection_pad1d(h, 3), params["pre"]["w"],
                   params["pre"]["b"])
        h = leaky_relu(h, cfg.leaky_slope_act)
        return x + 1e-3 * h[..., : x.shape[-1]]

    rows = [("condnet_pre", body_condnet, rnd((1, t0, cfg.in_channels)))]

    t = t0
    ch = cfg.channels
    for i, s in enumerate(cfg.upsample_scales):
        stage = params["stages"][i]
        ci, co = ch // (2 ** i), ch // (2 ** (i + 1))

        def body_up(x, stage=stage, s=s, ci=ci):
            y = _upsample(stage["up"], x, s)
            # fold s*Cout back onto the input shape with a FREE row-major
            # reshape (s*Cout >= Cin at every stage) — a strided [::s] slice
            # would cost more than the upsample itself
            y2 = y[:, : x.shape[1] * s, :].reshape(x.shape[0], x.shape[1], -1)
            return x + 1e-3 * y2[..., : x.shape[-1]]

        def body_res(x, stage=stage, i=i):
            y, act = _res_stack(stage["res"], x, cfg.resstack_kernel[i],
                                cfg.leaky_slope_res,
                                final_slope=cfg.leaky_slope_act)
            if not act:
                y = leaky_relu(y, cfg.leaky_slope_act)
            return x + 1e-3 * y

        rows.append((f"up{i}_x{s}_{ci}to{co}", body_up, rnd((1, t, ci))))
        t *= s
        rows.append((f"res{i}_c{co}_t{t}", body_res, rnd((1, t, co))))

    def body_post(x):
        return x + (1e-3 * _post_conv(params["post"], x)).astype(x.dtype)

    rows.append(("post_conv", body_post, rnd((1, t, ch // 16))))

    total = 0.0
    for name, body, x0 in rows:
        ms = chained_ms(body, x0)
        total += ms
        print(json.dumps({"metric": f"voc_{name}", "value": round(ms, 2),
                          "unit": "ms_per_30s_chunk"}), flush=True)
    print(json.dumps({"metric": "voc_substage_total", "value": round(total, 2),
                      "unit": "ms_per_30s_chunk",
                      "precision": os.environ.get("BENCH_PRECISION",
                                                  "default")}))


if __name__ == "__main__":
    main()
