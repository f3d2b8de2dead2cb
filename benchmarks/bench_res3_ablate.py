#!/usr/bin/env python
"""Attribute the fold-mode streaming kernel's gap over its MXU floor.

Measures the production fused up3+res3 stage and the standalone fold
res_stream under VF_TPU_STREAM_ABLATE ablations (default / nomask /
noact — the ablated variants are numerically WRONG and exist purely to
price the mask and activation VPU passes). Long chains (K=4 vs 16) and
min-of-6 reps push the tunnel noise well under the effects measured.

Run one mode per process:
  for m in "" nomask noact; do VF_TPU_STREAM_ABLATE=$m \
      python benchmarks/bench_res3_ablate.py; done
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
    from voicefixer_tpu.kernels.resstack import _bdiag, _ceil8, up_res_stack
    from voicefixer_tpu.kernels.resstream import res_stream
    from voicefixer_tpu.models import vocoder
    from voicefixer_tpu.ops.precision import activation_dtype, set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    mode = os.environ.get("VF_TPU_STREAM_ABLATE", "") or "default"
    cfg = DEFAULT_CONFIG.vocoder
    sr = DEFAULT_CONFIG.pipeline.sample_rate
    t0 = int(30 * sr) // 441 + 1
    t0 += t0 % 2 + 4
    t_res3 = t0 * 441

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

    xf0 = rnd((1, half + 2 * reach, 2 * ch))
    w1s = jnp.stack([_bdiag(p["c1"]["w"], ch, ch) for p in res_p])
    b1s = jnp.stack([jnp.concatenate([p["c1"]["b"]] * 2) for p in res_p])
    w2s = jnp.stack([_bdiag(p["c2"]["w"], ch, ch) for p in res_p])
    b2s = jnp.stack([jnp.concatenate([p["c2"]["b"]] * 2) for p in res_p])

    def body_fold(xf):
        out = res_stream(xf, w1s, b1s, w2s, b2s, dils=dils,
                         slope=cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt,
                         mask_t_total=t_res3, fold_offset=off, fold_ch=ch)
        return xf + 1e-3 * out

    x128 = rnd((1, t_res3 // 3, 128))

    def body_fused(x):
        y = up_res_stack(stage3["up"], res_p, x, 3, 3,
                         cfg.leaky_slope_res,
                         final_slope=cfg.leaky_slope_act, matmul_dtype=mdt)
        y2 = y[:, : x.shape[1] * 3, :].reshape(
            x.shape[0], x.shape[1], -1)[..., : x.shape[-1]]
        return x + 1e-3 * y2

    for name, body, x in (("fold_res3", body_fold, xf0),
                          ("fused_up3res3", body_fused, x128)):
        ms = chained_ms(body, x, ks=(4, 16), reps=6)
        print(json.dumps({"metric": f"{name}_{mode}",
                          "value": round(ms, 2), "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
