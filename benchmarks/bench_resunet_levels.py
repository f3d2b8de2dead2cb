#!/usr/bin/env python
"""Per-level ConvBlockRes latency on the 30 s chunk's U-Net shapes.

Times one ConvBlockRes (bn->lrelu->conv3x3 twice + residual) per encoder/
decoder level shape, eval mode with folded BN — exactly what
models.resunet._conv_block_res dispatches at inference — plus the achieved
TFLOP/s per level so the narrow-vs-wide MXU starvation is visible.

Methodology matches bench_stages.py (K=4 vs K=8 chained differencing).
Prints one JSON line per level.
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
    from voicefixer_tpu.models import resunet
    from voicefixer_tpu.models.resunet import _conv_block_res
    from voicefixer_tpu.ops.conv import fold_bn_eval
    from voicefixer_tpu.ops.precision import activation_dtype, set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    cfg = DEFAULT_CONFIG.unet
    seconds = float(os.environ.get("BENCH_CHUNK_SECONDS", "30"))
    sr = DEFAULT_CONFIG.pipeline.sample_rate
    t_mel = int(seconds * sr) // 441 + 1
    t = -(-t_mel // cfg.downsample_ratio) * cfg.downsample_ratio
    fq = 127

    params = fold_bn_eval(resunet.init(jax.random.PRNGKey(0), cfg))
    adt = activation_dtype()
    params = jax.tree.map(lambda p: p.astype(adt), params)
    slope = cfg.leaky_slope

    # (name, params subtree, [B, T, F, C] input shape); the co->co blocks
    # are the per-level workhorses (3 of 4 encoder blocks + all but one
    # decoder block), measured once per (shape, channels) pair.
    rows = []
    h, w = t, fq
    chans = cfg.encoder_channels
    for i, co in enumerate(chans):
        rows.append((f"enc{i + 1}_{co}x[{h},{w}]",
                     params[f"enc{i + 1}"]["block2"], (1, h, w, co)))
        h, w = h // 2, w // 2
    # decoder levels revisit the same (shape, co) pairs from below; the
    # concat block (2co -> co) is the distinct extra shape
    h, w = t // 2 ** (cfg.levels - 1), max(fq // 2 ** (cfg.levels - 1), 1)
    for i, co in enumerate(reversed(chans)):
        rows.append((f"dec{i + 1}_cat_{2 * co}to{co}x[{h},{w}]",
                     params[f"dec{i + 1}"]["block2"], (1, h, w, 2 * co)))
        h, w = h * 2, w * 2

    total = 0.0
    counts = {}  # how many times each measured block shape runs per forward
    for name, p, shape in rows:
        x0 = (jax.random.normal(jax.random.PRNGKey(1), shape,
                                dtype=jnp.float32) * 0.1).astype(adt)

        def body(x, p=p):
            y = _conv_block_res(p, x, slope, training=False)
            return x + 1e-3 * jnp.concatenate(
                [y] * (x.shape[-1] // y.shape[-1]), -1)

        ms = chained_ms(body, x0)
        ci, co = p["conv1"]["w"].shape[2], p["conv1"]["w"].shape[3]
        hw = shape[1] * shape[2]
        fl = hw * 9 * (ci * co + co * co) * 2
        if ci != co:
            fl += hw * ci * co * 2
        print(json.dumps({
            "metric": f"unet_{name}", "value": round(ms, 3), "unit": "ms",
            "tflops": round(fl / (ms * 1e-3) / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
