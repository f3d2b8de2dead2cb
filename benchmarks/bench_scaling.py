#!/usr/bin/env python
"""Data-parallel scaling-efficiency benchmark (BASELINE.md: >= 90%).

On real multi-chip hardware the right measurement is weak scaling
(per-device batch fixed). Only a single tunneled TPU chip is available
here, so the multi-device run uses a virtual CPU mesh — whose N "devices"
all share the same physical cores, making weak scaling physically
impossible to observe. What CAN be measured there is partition overhead at
constant total work: restore the same total batch on a 1-device mesh vs
sharded over N devices. With zero sharding/collective overhead the times
are equal (same silicon, same FLOPs); efficiency = t_1 / t_N.

Set SCALE_DEVICES to choose the mesh width (default 8 on CPU).
Prints one JSON line per mesh size plus a final efficiency line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    want = int(os.environ.get("SCALE_DEVICES", "8"))
    if len(jax.devices()) < want:
        from jax.extend import backend as _xb
        jax.config.update("jax_platforms", "cpu")
        _xb.clear_backends()
        jax.config.update("jax_num_cpu_devices", want)

    import jax.numpy as jnp

    from voicefixer_tpu.config import DEFAULT_CONFIG, tiny_test_config
    from voicefixer_tpu.models import analysis, vocoder
    from voicefixer_tpu.parallel.mesh import data_sharding, make_mesh
    from voicefixer_tpu.pipeline.restore import restore_batch

    on_tpu = jax.default_backend() == "tpu"
    cfg = DEFAULT_CONFIG if on_tpu else tiny_test_config()
    seconds = float(os.environ.get("SCALE_CHUNK_SECONDS",
                                   "30" if on_tpu else "0.2"))
    per_device = int(os.environ.get("SCALE_PER_DEVICE", "2"))
    n = int(cfg.pipeline.sample_rate * seconds)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = analysis.init(k1, cfg)
    vocoder_params = vocoder.init(k2, cfg.vocoder)

    devices = jax.devices()
    sizes = sorted({1, max(1, len(devices) // 2), len(devices)})
    batch = per_device * len(devices)  # constant total work
    base_dt = None
    for nd in sizes:
        mesh = make_mesh(n_data=nd, n_model=1, devices=devices[:nd])
        wav = jax.random.normal(jax.random.PRNGKey(3), (batch, n),
                                dtype=jnp.float32) * 0.1
        wav = jax.device_put(wav, data_sharding(mesh, 2))
        params_r = jax.device_put(
            (params, vocoder_params),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

        fn = jax.jit(lambda p, w: restore_batch(p[0], p[1], w, cfg)[0])
        out = fn(params_r, wav)
        jax.block_until_ready(out)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params_r, wav)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        tp = batch * seconds / dt  # audio-seconds per second, whole mesh
        if nd == 1:
            base_dt = dt
        # constant total work on shared silicon: overhead-free sharding
        # keeps dt equal to the 1-device run
        eff = base_dt / dt
        print(json.dumps({
            "metric": f"dp_restore_mesh{nd}",
            "value": round(tp, 2),
            "unit": "audio_seconds_per_second",
            "devices": nd, "batch": batch,
            "efficiency_vs_1dev": round(eff, 3),
        }), flush=True)
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.9, 3),
        "devices": sizes[-1],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
