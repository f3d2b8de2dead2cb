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

CONTROL (VERDICT r4 next-5): the same constant total work also runs as N
INDEPENDENT single-device programs (no mesh, no GSPMD, no collectives) —
one per virtual device. Any slowdown there is pure host oversubscription
of the one physical CPU by N XLA device threads; the difference between
the control and the mesh row isolates the real sharding/collective cost.
The emitted artifact carries both rows plus an automatic diagnosis.

Set SCALE_DEVICES to choose the mesh width (default 8 on CPU).
Prints one JSON line per measurement and writes SCALING_<round>.json.
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
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

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
        emit({
            "metric": f"dp_restore_mesh{nd}",
            "value": round(tp, 2),
            "unit": "audio_seconds_per_second",
            "devices": nd, "batch": batch,
            "efficiency_vs_1dev": round(eff, 3),
        })
    mesh_eff = eff

    # --- no-communication control at full width: same total batch as N
    # independent per-device programs, one pinned to each device. No mesh,
    # no GSPMD, no collectives — only the host scheduling N device threads.
    nd = sizes[-1]
    ctrl_eff = None
    if nd > 1:
        fn1 = jax.jit(lambda p, vp, w: restore_batch(p, vp, w, cfg)[0])
        shards, ps, vps = [], [], []
        for i in range(nd):
            d = devices[i]
            w = jax.random.normal(jax.random.PRNGKey(3 + i),
                                  (per_device, n), dtype=jnp.float32) * 0.1
            shards.append(jax.device_put(w, d))
            ps.append(jax.device_put(params, d))
            vps.append(jax.device_put(vocoder_params, d))
        outs = [fn1(ps[i], vps[i], shards[i]) for i in range(nd)]
        jax.block_until_ready(outs)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = [fn1(ps[i], vps[i], shards[i]) for i in range(nd)]
        jax.block_until_ready(outs)
        dt_ctrl = (time.perf_counter() - t0) / iters
        ctrl_eff = base_dt / dt_ctrl
        emit({
            "metric": f"control_nocomm_{nd}proc",
            "value": round(batch * seconds / dt_ctrl, 2),
            "unit": "audio_seconds_per_second",
            "devices": nd, "batch": batch,
            "efficiency_vs_1dev": round(ctrl_eff, 3),
        })

    emit({
        "metric": "dp_scaling_efficiency",
        "value": round(mesh_eff, 3),
        "unit": "fraction",
        "vs_baseline": round(mesh_eff / 0.9, 3),
        "devices": sizes[-1],
        "backend": jax.default_backend(),
    })

    if ctrl_eff is not None:
        # sharding-only efficiency: the mesh run relative to what the SAME
        # oversubscribed host achieves with zero communication
        shard_eff = mesh_eff / max(ctrl_eff, 1e-9)
        emit({"metric": "dp_sharding_only_efficiency",
              "value": round(min(shard_eff, 1.0), 3), "unit": "fraction",
              "devices": nd, "note": "mesh eff / no-comm control eff"})
        if ctrl_eff < 0.9:
            diagnosis = (
                f"The no-comm control ALSO drops to {ctrl_eff:.2f} at "
                f"{nd} virtual devices on one physical CPU, so the "
                f"mesh row's {mesh_eff:.2f} is dominated by host "
                f"oversubscription (N XLA device threads sharing one "
                f"socket), not by GSPMD sharding/collective overhead. "
                f"Sharding-only efficiency (mesh/control) is "
                f"{min(shard_eff, 1.0):.2f}. Weak scaling on real chips "
                f"remains the true measurement (single tunneled TPU "
                f"here).")
        else:
            diagnosis = (
                f"The no-comm control holds {ctrl_eff:.2f} while the mesh "
                f"run drops to {mesh_eff:.2f}: a real sharding/collective "
                f"overhead of ~{100 * (1 - mesh_eff / ctrl_eff):.0f}% to "
                f"hunt in parallel.inference/restore_batch sharding.")
        print(f"diagnosis: {diagnosis}", file=sys.stderr)
    else:
        diagnosis = "single-device run; no control measured"

    art = {
        "backend": f"{jax.default_backend()}-virtual-{sizes[-1]}dev",
        "methodology": (
            "partition overhead at constant total work "
            "(benchmarks/bench_scaling.py): same batch restored on "
            "1/N-device meshes of ONE physical CPU; efficiency = t_1/t_N. "
            "Control row: same work as N independent no-mesh per-device "
            "programs — isolates host oversubscription from sharding "
            "overhead. Weak scaling needs real chips (single tunneled "
            "TPU here)."),
        "diagnosis": diagnosis,
        "rows": rows,
    }
    tag = "r05"
    try:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "PROGRESS.jsonl")) as f:
            rounds = [json.loads(ln).get("round") for ln in f if ln.strip()]
        tag = f"r{max(r for r in rounds if r is not None):02d}"
    except Exception:  # noqa: BLE001 — cosmetic
        pass
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"SCALING_{tag}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
