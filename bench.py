#!/usr/bin/env python
"""Headline benchmark: mode-0 restore throughput on one chip.

Metric: audio-seconds restored per wall-clock second per chip, on the
production 30 s chunk through the full two-stage pipeline (analysis +
vocoder, full-size 44.1 kHz config). BASELINE.md's target is >= 10x
real-time per chip, so vs_baseline = value / 10.

Methodology: the development TPU is reached through a network tunnel whose
per-dispatch round trip (tens of ms) is an artifact of the tunnel, not the
chip, and `block_until_ready` does not reliably force execution through it.
Device throughput is therefore measured with K restores CHAINED inside one
jitted program (each iteration's input depends on the previous output, so
nothing can be elided), timed to a final value fetch, and differenced
between K=4 and K=8 to cancel the fixed dispatch cost. The JSON line also
reports `dispatch_ms` (the per-call host overhead this cancels) so the
tunnel cost stays visible.

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
    n = int(cfg.pipeline.sample_rate * seconds)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = analysis.init(k1, cfg)
    vocoder_params = vocoder.init(k2, cfg.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(3), (n,),
                            dtype=jnp.float32) * 0.1

    def chained(k):
        @jax.jit
        def prog(p, vp, w):
            def step(i, w):
                out, _ = restore_segment(p, vp, w, cfg)
                return w + 1e-3 * out[:n]
            return jax.lax.fori_loop(0, k, step, w)
        return prog

    def run(prog, w):
        t0 = time.perf_counter()
        out = prog(params, vocoder_params, w)
        float(jnp.sum(out[::10000]))  # value fetch forces execution
        return time.perf_counter() - t0

    prog4, prog8 = chained(4), chained(8)
    t0 = time.time()
    run(prog4, wav)
    compile_s = time.time() - t0
    run(prog8, wav)  # warm both programs
    print(f"bench: compile+first-run {compile_s:.1f}s "
          f"(chunk {seconds:.0f}s, device {jax.devices()[0].platform})",
          file=sys.stderr)

    t4 = min(run(prog4, wav * (1 + 1e-4 * r)) for r in range(3))
    t8 = min(run(prog8, wav * (1 + 1e-4 * r)) for r in range(3))
    device_s = max(t8 - t4, 1e-9) / 4.0
    dispatch_ms = max(t4 - 4 * device_s, 0.0) * 1e3

    # accuracy guard: production (bf16-operand) output vs the fp32 parity
    # path on the same chunk — reported as SNR so speed never silently
    # trades away fidelity (target >= 35 dB)
    snr_db = None
    if not os.environ.get("BENCH_SKIP_SNR"):
        import numpy as np

        from voicefixer_tpu.ops.precision import precision

        def one(w):
            import functools
            fn = jax.jit(functools.partial(restore_segment, cfg=cfg))
            out, _ = fn(params, vocoder_params, w)
            return np.asarray(out)

        prod = one(wav)
        with precision("highest"):
            ref = one(wav)
        err = prod - ref
        snr_db = float(10 * np.log10(
            (np.sum(ref * ref) + 1e-20) / (np.sum(err * err) + 1e-20)))

    # achieved TFLOP/s and %roofline from the analytic pipeline FLOP model
    # (XLA cost analysis reports 0 for Pallas custom calls; v5e bf16 peak:
    # 197 TFLOP/s)
    from voicefixer_tpu.utils.flops import pipeline_flops
    tflops = pipeline_flops(cfg, seconds) / device_s / 1e12

    value = seconds / device_s
    print(json.dumps({
        "metric": "mode0_restore_throughput",
        "value": round(value, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(value / 10.0, 3),
        "device_ms_per_chunk": round(device_s * 1e3, 2),
        "dispatch_ms": round(dispatch_ms, 2),
        "compile_s": round(compile_s, 1),
        "snr_db_vs_fp32": None if snr_db is None else round(snr_db, 1),
        "achieved_tflops": round(tflops, 1),
        "pct_bf16_roofline": round(100 * tflops / 197.0, 1),
    }))


if __name__ == "__main__":
    main()
