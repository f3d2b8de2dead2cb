#!/usr/bin/env python
"""Per-stage latency breakdown of the 30 s restore chunk: STFT+mel,
denoiser (mask net incl. GRUs), ResUNet, vocoder. Guides where the next
kernel/precision work should go. Defaults to the production precision
(bf16 operands, fp32 accumulation); BENCH_PRECISION=highest for the fp32
parity-path numbers.

Methodology (same as bench.py): K applications of each stage CHAINED inside
one jitted program (the output feeds the next input, so nothing is elided),
timed to a value fetch, differenced between K=4 and K=8 — this cancels the
development tunnel's per-dispatch cost and reports pure device time.

Prints one JSON line per stage.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_ms(body, x0, ks=(4, 8), reps=6):
    """Device ms per application of `body` (a shape-preserving fn).

    reps are nearly free next to the compile (each is one dispatch + the
    program), and the tunnel's per-dispatch jitter is the dominant error
    term — min-of-6 per K keeps the differenced value honest where
    min-of-3 produced occasional negative rows (r5)."""
    import jax
    import jax.numpy as jnp

    res = {}
    for k in ks:
        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(0, k, lambda i, x: body(x), x)
        times = []
        for rep in range(reps):
            xi = x0 * (1.0 + 1e-4 * rep)
            float(jnp.sum(xi[..., ::1000]))  # materialize input first
            t0 = time.perf_counter()
            out = prog(xi)
            float(jnp.sum(out[..., ::1000]))  # value fetch forces execution
            times.append((time.perf_counter() - t0) * 1e3)
        res[k] = min(times)
    return (res[ks[1]] - res[ks[0]]) / (ks[1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp

    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.models import analysis, denoiser, resunet, vocoder
    from voicefixer_tpu.ops.conv import fold_bn_eval
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
    params = fold_bn_eval(analysis.init(k1, cfg))  # serving path folds BN
    vparams = vocoder.init(k2, cfg.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(3), (1, n),
                            dtype=jnp.float32) * 0.1

    mel = jax.jit(functools.partial(analysis.wav_to_mel, cfg=cfg))(wav)
    mask = jax.jit(functools.partial(denoiser.apply, cfg=cfg.denoiser))(
        params["denoiser"], mel)
    clean = mask * mel
    unet_in = jnp.stack([to_log(mel), to_log(clean)], axis=-1)
    t_mel = mel.shape[1]

    stages = {
        # each body maps its input shape back to itself via a cheap adapter
        "stft_mel": (lambda w: w * (1 + 1e-6 * jnp.mean(
            analysis.wav_to_mel(w, cfg))), wav),
        "denoiser": (lambda m: denoiser.apply(params["denoiser"], m,
                                              cfg.denoiser), mel),
        "resunet": (lambda u: jnp.concatenate(
            [resunet.apply(params["unet"], u, cfg.unet)] * 2, -1), unet_in),
        "vocoder": (lambda m: m + 1e-3 * vocoder_facade.synthesize(
            vparams, m, cfg.vocoder)[:, ::441, 0][:, :t_mel, None],
            from_log(unet_in[..., 0])),
    }
    total = 0.0
    for name, (body, x0) in stages.items():
        ms = chained_ms(body, x0)
        total += ms
        print(json.dumps({"metric": f"stage_{name}", "value": round(ms, 2),
                          "unit": "ms_per_30s_chunk"}), flush=True)
    print(json.dumps({"metric": "stage_total", "value": round(total, 2),
                      "unit": "ms_per_30s_chunk",
                      "precision": os.environ.get("BENCH_PRECISION",
                                                  "default")}))


if __name__ == "__main__":
    main()
