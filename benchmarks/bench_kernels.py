#!/usr/bin/env python
"""Per-kernel microbenchmarks: Pallas kernels vs the plain-jax ops path,
with speed-of-light (roofline) utilization on the production shapes.

Prints one JSON line per benchmark:
  {"metric": "...", "value": ..., "unit": "...", "jax_ms": ..., "pallas_ms":
   ..., "speedup": ..., "sol_pct": ...}

Timing uses the chained-in-program methodology from bench_stages.chained_ms
(K applications inside one jit, differenced across two K values) — the
development tunnel's per-dispatch cost would otherwise swamp every kernel.

Roofline reference (TPU v5e, the bench chip): 819 GB/s HBM, 197 TFLOP/s
bf16 / ~49 TFLOP/s fp32 MXU. GRU is latency-bound (serial recurrence) so
its "speed of light" is reported as steps/s rather than a roofline %.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.bench_stages import chained_ms

HBM_GBPS = 819.0


def bench_gru():
    from voicefixer_tpu.kernels.gru import gru_seq, gru_seq_bidir
    from voicefixer_tpu.ops import gru as vgru

    b, t, h, in_dim = 1, 3008, 256, 512
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    params = {
        "w_ih": 0.1 * jax.random.normal(keys[0], (3 * h, in_dim)),
        "w_hh": 0.1 * jax.random.normal(keys[1], (3 * h, h)),
        "b_ih": 0.1 * jax.random.normal(keys[2], (3 * h,)),
        "b_hh": 0.1 * jax.random.normal(keys[3], (3 * h,)),
    }
    x = jax.random.normal(keys[4], (b, t, in_dim), dtype=jnp.float32)
    x_proj = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]
    w_hh_t = jnp.asarray(params["w_hh"].T)
    b_hh = jnp.asarray(params["b_hh"])

    def adapt(xp, out):  # [B,T,H] back to [B,T,3H]
        return xp + 1e-3 * jnp.concatenate([out] * 3, axis=-1)

    prev = os.environ.get("VF_TPU_NO_PALLAS")
    os.environ["VF_TPU_NO_PALLAS"] = "1"
    jax_ms = chained_ms(
        lambda xp: adapt(xp, vgru.gru_single_direction(
            x, dict(params, b_ih=xp[0, 0]))), x_proj, ks=(2, 4))
    if prev is None:
        del os.environ["VF_TPU_NO_PALLAS"]
    pallas_ms = chained_ms(
        lambda xp: adapt(xp, gru_seq(xp, w_hh_t, b_hh)), x_proj, ks=(2, 4))
    bidir_ms = chained_ms(
        lambda xp: adapt(xp, jnp.add(*gru_seq_bidir(
            xp, xp, w_hh_t, w_hh_t, b_hh, b_hh))), x_proj, ks=(2, 4))
    print(json.dumps({
        "metric": "gru_recurrence_T3008_H256",
        "value": round(t / (pallas_ms / 1e3) / 1e6, 3),
        "unit": "Msteps_per_s",
        "jax_ms": round(jax_ms, 3), "pallas_ms": round(pallas_ms, 3),
        "bidir_fused_ms_per_dir": round(bidir_ms / 2, 3),
        "speedup": round(jax_ms / pallas_ms, 2),
    }), flush=True)


def bench_resstack():
    from voicefixer_tpu.kernels.resstack import res_stack
    from voicefixer_tpu.models.vocoder import _res_stack

    # production vocoder stage shapes for a 30 s chunk (T_mel=3008)
    stages = [(21056, 512), (147392, 256), (442176, 128), (1326528, 64)]
    for t, ch in stages:
        keys = jax.random.split(jax.random.PRNGKey(ch), 33)
        params = [{"c1": {"w": 0.05 * jax.random.normal(keys[4 * i],
                                                        (3, ch, ch)),
                          "b": jnp.zeros((ch,))},
                   "c2": {"w": 0.05 * jax.random.normal(keys[4 * i + 1],
                                                        (3, ch, ch)),
                          "b": jnp.zeros((ch,))}}
                  for i in range(8)]
        x = 0.1 * jax.random.normal(keys[-1], (1, t, ch), dtype=jnp.float32)

        jax_ms = chained_ms(
            lambda a: _res_stack(params, a, kernel=3, slope=0.2)[0], x,
            ks=(2, 4))
        pallas_ms = chained_ms(
            lambda a: res_stack(params, a, kernel=3, slope=0.2), x,
            ks=(2, 4))
        # min traffic: per block read x + write y (f32)
        gb = 8 * 2 * t * ch * 4 / 1e9
        sol_ms = gb / HBM_GBPS * 1e3
        best = min(jax_ms, pallas_ms)
        print(json.dumps({
            "metric": f"resstack_T{t}_C{ch}",
            "value": round(gb / (best / 1e3), 1),
            "unit": "GB_per_s_effective",
            "jax_ms": round(jax_ms, 3), "pallas_ms": round(pallas_ms, 3),
            "speedup": round(jax_ms / pallas_ms, 2),
            "sol_pct": round(100 * sol_ms / best, 1),
        }), flush=True)


def bench_upsample():
    from voicefixer_tpu.kernels.upsample import upsample
    from voicefixer_tpu.ops.conv import conv_transpose1d

    # production stage shapes: (T_in, Cin, Cout, scale)
    stages = [(3008, 1024, 512, 7), (21056, 512, 256, 7),
              (147392, 256, 128, 3), (442176, 128, 64, 3)]
    for t, cin, cout, s in stages:
        keys = jax.random.split(jax.random.PRNGKey(cin), 3)
        w = 0.05 * jax.random.normal(keys[0], (2 * s, cin, cout))
        b = jnp.zeros((cout,))
        x = 0.1 * jax.random.normal(keys[1], (1, t, cin), dtype=jnp.float32)

        def jax_body(x):
            a = x + jnp.sin(x)
            y = conv_transpose1d(a, w, b, stride=s, padding=s // 2 + s % 2,
                                 output_padding=s % 2)
            return x + 1e-3 * jnp.repeat(y[:, ::s, :], cin // cout,
                                         axis=-1)[:, :t, :]

        def pallas_body(x):
            y = upsample(x, w, b, scale=s)
            return x + 1e-3 * jnp.repeat(y[:, ::s, :], cin // cout,
                                         axis=-1)[:, :t, :]

        jax_ms = chained_ms(jax_body, x, ks=(2, 4))
        pallas_ms = chained_ms(pallas_body, x, ks=(2, 4))
        flops = 2 * t * 2 * s * cin * cout
        best = min(jax_ms, pallas_ms)
        print(json.dumps({
            "metric": f"upsample_T{t}_C{cin}to{cout}_s{s}",
            "value": round(flops / (best / 1e3) / 1e12, 2),
            "unit": "TFLOP_per_s",
            "jax_ms": round(jax_ms, 3), "pallas_ms": round(pallas_ms, 3),
            "speedup": round(jax_ms / pallas_ms, 2),
        }), flush=True)


def bench_stft_mel():
    from voicefixer_tpu.config import DEFAULT_CONFIG
    from voicefixer_tpu.kernels.stft import stft_mel
    from voicefixer_tpu.ops import mel as vmel
    from voicefixer_tpu.ops import stft as vstft

    cfg = DEFAULT_CONFIG
    n = 44100 * 30
    wav = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (1, n),
                                  dtype=jnp.float32)
    fb = jnp.asarray(vmel.melscale_fbanks(
        cfg.mel.n_stft, cfg.mel.f_min, cfg.mel.f_max, cfg.mel.n_mels,
        cfg.mel.sample_rate, norm=None), dtype=jnp.float32)

    def jax_body(wav):
        sp = vstft.spectrogram(wav, cfg.stft, eps=cfg.stft.mag_eps)
        return wav * (1 + 1e-6 * jnp.mean(jnp.matmul(sp, fb)))

    def pallas_body(wav):
        return wav * (1 + 1e-6 * jnp.mean(stft_mel(wav, fb, cfg.stft)))

    jax_ms = chained_ms(jax_body, wav, ks=(2, 4))
    pallas_ms = chained_ms(pallas_body, wav, ks=(2, 4))
    t_frames = n // cfg.stft.hop_length + 1
    flops = 2 * t_frames * cfg.stft.n_fft * 2 * 1152
    best = min(jax_ms, pallas_ms)
    print(json.dumps({
        "metric": "stft_mel_30s_chunk",
        "value": round(flops / (best / 1e3) / 1e12, 2),
        "unit": "TFLOP_per_s",
        "jax_ms": round(jax_ms, 3), "pallas_ms": round(pallas_ms, 3),
        "speedup": round(jax_ms / pallas_ms, 2),
    }), flush=True)


def main():
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    bench_gru()
    bench_resstack()
    bench_upsample()
    bench_stft_mel()


if __name__ == "__main__":
    main()
