#!/usr/bin/env python
"""Production-scale overlap-add validation (VERDICT r3 weak-6 / next-6).

Restores one long wav (default 90 s) with the PRODUCTION config through
(a) a single unchunked program, (b) 30 s hard-seam chunks (reference
parity, base.py:117-138), and (c) overlap-add at a ramp sweep; reports the
error of each chunked output against the unchunked reference, split into
seam-local (+-10 ms of each boundary) vs interior means, plus the
throughput cost of the overlap (extra windows).

Random weights (zero-egress: the real ckpts are unreachable) — the seam
artifact is a structural property of chunking, not of the weights; ratios,
not absolute errors, are the decision quantity.

Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from voicefixer_tpu.ops.precision import set_precision
    from voicefixer_tpu.utils import compile_cache

    compile_cache.enable()
    set_precision(os.environ.get("BENCH_PRECISION", "default"))

    import dataclasses

    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.pipeline.restore import VoiceFixer

    total_s = float(os.environ.get("OVERLAP_TOTAL_SECONDS", "90"))
    ramps = [float(r) for r in os.environ.get(
        "OVERLAP_RAMPS", "0.5,1.0,2.0").split(",")]
    cfg = DEFAULT_CONFIG
    sr = cfg.pipeline.sample_rate
    n = int(total_s * sr)
    seg = cfg.pipeline.seg_length

    cfg_un = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline,
                                          seg_length_seconds=total_s))
    vf = VoiceFixer.random(0, config=cfg)
    # sharing vf.params is exact: fold_bn_eval keeps gamma/beta/mean/var and
    # recomputing (scale, shift) from them is idempotent (ops.conv:189-205)
    vf_un = VoiceFixer(params=vf.params, vocoder_params=vf.vocoder_params,
                       config=cfg_un)

    wav = (np.random.default_rng(11).standard_normal(n) * 0.1).astype(
        np.float32)

    t0 = time.time()
    ref = vf_un.restore_inmem(wav, mode=0)
    print(json.dumps({"metric": "overlap_ref_unchunked_s",
                      "value": round(time.time() - t0, 1)}), flush=True)

    def seam_vs_interior(out, positions, w=441):
        e = np.abs(out - ref[: out.shape[-1]])
        m = np.zeros(e.shape[-1], bool)
        for p in positions:
            m[max(0, p - w): p + w] = True
        return float(e[m].mean()), float(e[~m].mean())

    t0 = time.time()
    hard = vf.restore_inmem(wav, mode=0)
    dt_hard = time.time() - t0
    se, ie = seam_vs_interior(hard, list(range(seg, n, seg)))
    print(json.dumps({"metric": "overlap_hard_seam", "seam_mean_err": se,
                      "interior_mean_err": ie,
                      "seam_ratio": round(se / max(ie, 1e-12), 2),
                      "wall_s": round(dt_hard, 1)}), flush=True)

    for ramp in ramps:
        t0 = time.time()
        out = vf.restore_inmem(wav, mode=0, chunk_overlap_seconds=ramp)
        dt = time.time() - t0
        stride = seg - int(ramp * sr)
        se, ie = seam_vs_interior(out, list(range(stride, n, stride)))
        print(json.dumps({
            "metric": f"overlap_ramp_{ramp}", "seam_mean_err": se,
            "interior_mean_err": ie,
            "seam_ratio": round(se / max(ie, 1e-12), 2),
            "wall_s": round(dt, 1),
            "extra_windows_pct": round(100 * (ramp / (30 - ramp)), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
