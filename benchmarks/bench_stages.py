#!/usr/bin/env python
"""Per-stage latency breakdown of the 30 s restore chunk: STFT+mel,
denoiser (mask net incl. GRUs), ResUNet, vocoder. Guides where the next
kernel/precision work should go. Defaults to the production precision
(bf16 operands, fp32 accumulation); BENCH_PRECISION=highest for the fp32
parity-path numbers.

Prints one JSON line per stage.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.models import analysis, denoiser, resunet, vocoder
    from voicefixer_tpu.ops.norm import from_log, to_log
    from voicefixer_tpu.ops.precision import set_precision
    from voicefixer_tpu.pipeline import vocoder_facade
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))
    cfg = DEFAULT_CONFIG
    seconds = float(os.environ.get("BENCH_CHUNK_SECONDS", "30"))
    n = int(cfg.pipeline.sample_rate * seconds)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = analysis.init(k1, cfg)
    vparams = vocoder.init(k2, cfg.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(3), (1, n),
                            dtype=jnp.float32) * 0.1

    mel = jax.jit(functools.partial(analysis.wav_to_mel, cfg=cfg))(wav)
    mask = jax.jit(functools.partial(denoiser.apply, cfg=cfg.denoiser))(
        params["denoiser"], mel)
    clean = mask * mel
    unet_in = jnp.stack([to_log(mel), to_log(clean)], axis=-1)
    unet_out = jax.jit(functools.partial(resunet.apply, cfg=cfg.unet))(
        params["unet"], unet_in)
    restored = from_log(unet_out[..., 0] + to_log(clean))

    stages = {
        "stft_mel": (jax.jit(functools.partial(analysis.wav_to_mel, cfg=cfg)),
                     (wav,)),
        "denoiser": (jax.jit(functools.partial(denoiser.apply,
                                               cfg=cfg.denoiser)),
                     (params["denoiser"], mel)),
        "resunet": (jax.jit(functools.partial(resunet.apply, cfg=cfg.unet)),
                    (params["unet"], unet_in)),
        "vocoder": (jax.jit(functools.partial(vocoder_facade.synthesize,
                                              cfg=cfg.vocoder)),
                    (vparams, restored)),
    }
    total = 0.0
    for name, (fn, args) in stages.items():
        ms = timeit(fn, *args, iters=5)
        total += ms
        print(json.dumps({"metric": f"stage_{name}", "value": round(ms, 2),
                          "unit": "ms_per_30s_chunk"}), flush=True)
    print(json.dumps({"metric": "stage_total", "value": round(total, 2),
                      "unit": "ms_per_30s_chunk",
                      "precision": os.environ.get("BENCH_PRECISION",
                                                  "default")}))


if __name__ == "__main__":
    main()
