#!/usr/bin/env python
"""Headline benchmark: mode-0 restore throughput on one chip.

Metric: audio-seconds restored per wall-clock second per chip, on the
production 30 s chunk through the full two-stage pipeline (analysis +
vocoder, full-size 44.1 kHz config). BASELINE.md's target is >= 10x
real-time per chip, so vs_baseline = value / 10.

The reference publishes no numbers (SURVEY.md 6); its per-file wall-clock
print (/root/reference/voicefixer/__main__.py:23-27) is the closest artifact.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")


def main():
    import jax
    import jax.numpy as jnp

    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.models import analysis, vocoder
    from voicefixer_tpu.pipeline.restore import restore_segment
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = DEFAULT_CONFIG

    # BENCH_PRECISION=default (the default) is the production serving
    # config: native MXU bf16 operands with fp32 accumulation.
    # BENCH_PRECISION=highest switches to the torch-parity fp32 config
    # that the numerical acceptance tests validate.
    from voicefixer_tpu.ops.precision import set_precision
    set_precision(os.environ.get("BENCH_PRECISION", "default"))

    seconds = float(os.environ.get("BENCH_CHUNK_SECONDS", "30"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n = int(cfg.pipeline.sample_rate * seconds)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = analysis.init(k1, cfg)
    vocoder_params = vocoder.init(k2, cfg.vocoder)

    fn = jax.jit(lambda p, vp, w: restore_segment(p, vp, w, cfg)[0])
    wav = jax.random.normal(jax.random.PRNGKey(3), (n,),
                            dtype=jnp.float32) * 0.1

    t0 = time.time()
    out = fn(params, vocoder_params, wav)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"bench: compile+first-run {compile_s:.1f}s "
          f"(chunk {seconds:.0f}s, device {jax.devices()[0].platform})",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        out = fn(params, vocoder_params, wav)
    out.block_until_ready()
    elapsed = time.time() - t0

    value = seconds * iters / elapsed
    print(json.dumps({
        "metric": "mode0_restore_throughput",
        "value": round(value, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(value / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
