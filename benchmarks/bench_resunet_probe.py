#!/usr/bin/env python
"""Probe the production ResUNet stage three ways on the real chip:
  folded    — BN folded to (scale, shift) as the serving facade does;
              Pallas convblock dispatches on the narrow levels
  folded_noconvblock — BN folded, VF_TPU_NO_PALLAS_CONVBLOCK=1 (XLA convs)
  unfolded  — raw init params (bench.py's restore_segment call until r5):
              plan_tm can't see folded BN, so no Pallas dispatch
Run each in its own process (env binds at trace time):
  python benchmarks/bench_resunet_probe.py folded
  VF_TPU_NO_PALLAS_CONVBLOCK=1 python benchmarks/bench_resunet_probe.py folded
  python benchmarks/bench_resunet_probe.py unfolded
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
    from voicefixer_tpu.models import analysis, resunet
    from voicefixer_tpu.ops.conv import fold_bn_eval
    from voicefixer_tpu.ops.precision import set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    cfg = DEFAULT_CONFIG
    mode = sys.argv[1] if len(sys.argv) > 1 else "folded"
    nok = os.environ.get("VF_TPU_NO_PALLAS_CONVBLOCK", "")

    params = analysis.init(jax.random.PRNGKey(0), cfg)
    if mode == "folded":
        params = fold_bn_eval(params)
    t_mel = int(30 * cfg.pipeline.sample_rate) // 441 + 1
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, t_mel, 128, 2),
                           dtype=jnp.float32) * 0.1

    def body(u):
        return jnp.concatenate(
            [resunet.apply(params["unet"], u, cfg.unet)] * 2, -1)

    ms = chained_ms(body, x0, ks=(2, 10), reps=4)
    print(json.dumps({
        "metric": f"resunet_{mode}{'_noconvblock' if nok else ''}",
        "value": round(ms, 2), "unit": "ms_per_30s_chunk"}), flush=True)


if __name__ == "__main__":
    main()
