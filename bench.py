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
between two K values (preferred 8 vs 4) to cancel the fixed dispatch cost.
The JSON line also reports `dispatch_ms` (the per-call host overhead this
cancels) so the tunnel cost stays visible.

Resilience: the tunnel's remote-compile endpoint fails transiently
("response body closed", connection resets). Round 2's official artifact
was lost to exactly one such error, so every compile/run here is wrapped in
retry-with-backoff, the K-pair degrades (8,4) -> (4,2) -> single-program
estimate, and the JSON line is ALWAYS emitted with whatever was measured
plus an `errors` field listing what was retried or skipped. The only
nonzero exit is a fidelity-guard breach: a MEASURED TPU-path SNR below the
floors (e2e >= 35 dB, stages >= 34/36 dB) fails the run so the driver
records a precision regression instead of a narration of one.

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

# Transient-failure policy for every device interaction (compile + run).
RETRIES = int(os.environ.get("BENCH_RETRIES", "4"))
BACKOFF_S = float(os.environ.get("BENCH_BACKOFF_S", "3"))


def call_with_retries(label, fn, errors, retries=None, backoff=None,
                      sleep=time.sleep):
    """Run fn(); on any exception retry with exponential backoff.

    Returns fn()'s value, or None after the last attempt fails. Every
    failure is appended to `errors` (kept short) so the emitted JSON
    records what went wrong even when a retry eventually succeeds.
    """
    retries = RETRIES if retries is None else retries
    delay = BACKOFF_S if backoff is None else backoff
    for attempt in range(1, retries + 1):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — tunnel errors are untyped
            msg = f"{label}[try {attempt}/{retries}]: " \
                  f"{type(e).__name__}: {str(e)[:160]}"
            errors.append(msg)
            print(f"bench: {msg}", file=sys.stderr)
            if attempt == retries:
                return None
            sleep(delay)
            delay *= 2
    return None


def measure(make_prog, run, errors, k_pairs=((4, 8), (2, 4)), best_of=3):
    """Device seconds per unit of work, by K-differencing with fallbacks.

    make_prog(k) builds (but does not compile) the K-chained program;
    run(prog, jitter) compiles on first use, executes, fetches a value, and
    returns wall seconds. Tries each (lo, hi) pair in order; if no pair
    survives compilation/warmup, falls back to a single-program estimate
    (device+dispatch)/K from whichever K still works — an upper bound on
    device time, labeled in the returned method string.

    Returns (device_s, dispatch_ms, method, compile_s) — device_s None if
    nothing at all ran.
    """
    compiled = {}   # k -> prog, warmed and ready to time
    compile_s = None

    def ensure(k):
        """Compile+warm the K-chained program once, with retries."""
        if k in compiled:
            return compiled[k]
        prog = make_prog(k)
        t0 = time.time()
        ok = call_with_retries(
            f"compile+warm K={k}", lambda: run(prog, 0), errors)
        if ok is None:
            return None
        nonlocal compile_s
        if compile_s is None:
            compile_s = time.time() - t0
        compiled[k] = prog
        return prog

    def timed(k, jitter):
        prog = compiled.get(k)
        if prog is None:
            return None
        return call_with_retries(
            f"run K={k}", lambda: run(prog, jitter), errors)

    for lo, hi in k_pairs:
        # warm the smaller program first: it populates the persistent
        # compile cache with the shared single-restore subcomputation, so
        # the big program's remote compile is cheaper and likelier to
        # survive the tunnel.
        if ensure(lo) is None or ensure(hi) is None:
            continue
        t_lo = [t for t in (timed(lo, 1 + 1e-4 * r) for r in range(best_of))
                if t is not None]
        t_hi = [t for t in (timed(hi, 1 + 1e-4 * r) for r in range(best_of))
                if t is not None]
        if not t_lo or not t_hi:
            continue
        device_s = max(min(t_hi) - min(t_lo), 1e-9) / (hi - lo)
        dispatch_ms = max(min(t_lo) - lo * device_s, 0.0) * 1e3
        return device_s, dispatch_ms, f"K-diff({lo},{hi})", compile_s

    # Last resort: no pair compiled. Use any single chained program that
    # did; its time includes one dispatch so this overestimates device time
    # (underestimates throughput) — safe direction for a headline claim.
    for k in sorted(compiled, reverse=True):
        ts = [t for t in (timed(k, 1 + 1e-4 * r) for r in range(best_of))
              if t is not None]
        if ts:
            errors.append(f"fallback: single-program estimate at K={k} "
                          "(includes dispatch; underestimates throughput)")
            return min(ts) / k, None, f"single(K={k})", compile_s
    return None, None, "none", compile_s


# TPU-path fidelity floors (the CPU-path pytest budgets in
# tests/test_snr_budget.py are the localizing layer; these make the bench
# itself FAIL — exit nonzero — on a Pallas-path precision regression
# instead of narrating it, VERDICT r4 next-4)
SNR_FLOOR_E2E = 35.0
SNR_FLOOR_STAGE = {"analysis_mel": 34.0, "vocoder": 36.0}


def guard_failures(result) -> list:
    """Fidelity-floor breaches in a measured result (empty = pass). A
    missing SNR (skipped / transient failure) is NOT a breach — resilience
    keeps the artifact flowing; a MEASURED value below floor is."""
    guard = []
    snr = result.get("snr_db_vs_fp32")
    if snr is not None and snr < SNR_FLOOR_E2E:
        guard.append(f"e2e SNR {snr} dB < {SNR_FLOOR_E2E} dB floor")
    for name, floor in SNR_FLOOR_STAGE.items():
        got = (result.get("stage_snr_db") or {}).get(name)
        if got is not None and got < floor:
            guard.append(f"stage {name} SNR {got} dB < {floor} dB floor")
    return guard


def main():
    errors: list[str] = []
    result = {
        "metric": "mode0_restore_throughput",
        "value": None,
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": None,
    }

    try:
        run_bench(result, errors)
    except KeyboardInterrupt:
        raise
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        errors.append(f"fatal: {type(e).__name__}: {str(e)[:200]}")

    guard = guard_failures(result)
    if guard:
        result["guard_failures"] = guard
        for g in guard:
            print(f"bench: GUARD FAILURE: {g}", file=sys.stderr)
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    return 1 if guard else 0


def run_bench(result, errors):
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
    # fold BN to (scale, shift) exactly as the serving facade does at
    # weight-load time (pipeline.restore.VoiceFixer.__init__) — without
    # this the bench measures a path no user runs, and r5 found a real
    # serving regression (a kernel dispatch gated on folded BN) hiding
    # behind exactly that gap
    from voicefixer_tpu.ops.conv import fold_bn_eval
    params = fold_bn_eval(analysis.init(k1, cfg))
    vocoder_params = vocoder.init(k2, cfg.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(3), (n,),
                            dtype=jnp.float32) * 0.1

    def make_prog(k):
        @jax.jit
        def prog(p, vp, w):
            def step(i, w):
                out, _ = restore_segment(p, vp, w, cfg)
                return w + 1e-3 * out[:n]
            return jax.lax.fori_loop(0, k, step, w)
        return prog

    def run(prog, jitter):
        w = wav if jitter == 0 else wav * jitter
        t0 = time.perf_counter()
        out = prog(params, vocoder_params, w)
        float(jnp.sum(out[::10000]))  # value fetch forces execution
        return time.perf_counter() - t0

    device_s, dispatch_ms, method, compile_s = measure(make_prog, run, errors)
    print(f"bench: method={method} compile+first-run "
          f"{compile_s if compile_s is None else round(compile_s, 1)}s "
          f"(chunk {seconds:.0f}s, device {jax.devices()[0].platform})",
          file=sys.stderr)
    if device_s is None:
        errors.append("no timing method succeeded; value is null")
        return

    # accuracy guard: production (bf16-operand) output vs the fp32 parity
    # path on the same chunk — reported as SNR so speed never silently
    # trades away fidelity (target >= 35 dB), with per-stage SNRs so a
    # precision regression is LOCALIZED (VERDICT r3 weak-5: budgets live in
    # tests/test_snr_budget.py; this reports the TPU pallas-path values)
    snr_db = None
    stage_snr = None
    if not os.environ.get("BENCH_SKIP_SNR"):
        import functools

        import numpy as np

        from voicefixer_tpu.models import analysis as analysis_model
        from voicefixer_tpu.ops.norm import from_log
        from voicefixer_tpu.ops.precision import precision
        from voicefixer_tpu.pipeline import vocoder_facade

        def snr_of(prod, ref):
            prod, ref = np.asarray(prod, np.float64), np.asarray(
                ref, np.float64)
            return float(10 * np.log10(
                (np.sum(ref * ref) + 1e-20)
                / (np.sum((prod - ref) ** 2) + 1e-20)))

        def one(w):
            fn = jax.jit(functools.partial(restore_segment, cfg=cfg))
            out, _ = fn(params, vocoder_params, w)
            return np.asarray(out)

        def snr():
            prod = one(wav)
            with precision("highest"):
                ref = one(wav)
            return snr_of(prod, ref)

        snr_db = call_with_retries("snr", snr, errors)

        if not os.environ.get("BENCH_SKIP_STAGE_SNR"):
            # a 2 s chunk keeps the four extra stage compiles cheap; the
            # budgets themselves are asserted in tests/test_snr_budget.py
            wav_s = wav[: 2 * cfg.pipeline.sample_rate]

            def stage_snrs():
                def mel_one():
                    return jax.jit(functools.partial(
                        analysis_model.restore_mel, cfg=cfg))(
                            params, wav_s[None])
                mel_p = mel_one()
                with precision("highest"):
                    mel_r = mel_one()
                den = from_log(mel_r)

                def voc_one():
                    return jax.jit(functools.partial(
                        vocoder_facade.synthesize, cfg=cfg.vocoder))(
                            vocoder_params, den)
                voc_p = voc_one()
                with precision("highest"):
                    voc_r = voc_one()
                return {"analysis_mel": round(snr_of(mel_p, mel_r), 1),
                        "vocoder": round(snr_of(voc_p, voc_r), 1)}

            stage_snr = call_with_retries("stage_snr", stage_snrs, errors)

    # wall-clock steady-state throughput: N independent single-chunk
    # dispatches enqueued back-to-back through jax's async dispatch, timed
    # host-side to the last block. This is what a single-stream client
    # actually sees (device time + however much per-chunk host/tunnel work
    # fails to pipeline under device work) — reported next to the K-diff
    # device number so neither hides the other (VERDICT r4 next-3).
    wall_value = None
    if not os.environ.get("BENCH_SKIP_WALL"):
        import functools

        fn = jax.jit(functools.partial(restore_segment, cfg=cfg))

        def steady(n_chunks=8):
            out, _ = fn(params, vocoder_params, wav)   # warm the jit cache
            jax.block_until_ready(out)
            ins = [wav * (1 + 1e-4 * i) for i in range(n_chunks)]
            jax.block_until_ready(ins)
            t0 = time.perf_counter()
            outs = [fn(params, vocoder_params, w)[0] for w in ins]
            jax.block_until_ready(outs)
            return n_chunks * seconds / (time.perf_counter() - t0)

        walls = [w for w in (call_with_retries("wall", steady, errors,
                                               retries=2)
                             for _ in range(3)) if w is not None]
        wall_value = max(walls) if walls else None

    # achieved TFLOP/s and %roofline from the analytic pipeline FLOP model
    # (XLA cost analysis reports 0 for Pallas custom calls; v5e bf16 peak:
    # 197 TFLOP/s)
    from voicefixer_tpu.utils.flops import pipeline_flops
    tflops = pipeline_flops(cfg, seconds) / device_s / 1e12

    value = seconds / device_s
    result.update({
        "value": round(value, 2),
        "vs_baseline": round(value / 10.0, 3),
        "device_ms_per_chunk": round(device_s * 1e3, 2),
        "dispatch_ms": None if dispatch_ms is None else round(dispatch_ms, 2),
        "wall_clock_audio_s_per_s": None if wall_value is None
        else round(wall_value, 2),
        "compile_s": None if compile_s is None else round(compile_s, 1),
        "method": method,
        "snr_db_vs_fp32": None if snr_db is None else round(snr_db, 1),
        "stage_snr_db": stage_snr,
        "achieved_tflops": round(tflops, 1),
        "pct_bf16_roofline": round(100 * tflops / 197.0, 1),
    })

    # per-stage device-time artifact (VERDICT r4 next-2): regenerate
    # STAGES_r{N}.json on every bench run so the analysis-vs-vocoder split
    # and every vocoder substage are on record — a one-stage regression is
    # visible even when the headline number hides it.
    if not os.environ.get("BENCH_SKIP_STAGES"):
        emit_stage_artifact(errors)


def _round_tag() -> str:
    """Current build round from PROGRESS.jsonl (driver-maintained);
    default r05."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "PROGRESS.jsonl")) as f:
            rounds = [json.loads(ln).get("round") for ln in f if ln.strip()]
        return f"r{max(r for r in rounds if r is not None):02d}"
    except Exception:  # noqa: BLE001 — the tag is cosmetic
        return "r05"


def emit_stage_artifact(errors):
    """Run benchmarks/bench_stages.py + bench_vocoder_stages.py in
    subprocesses (isolated so a stage failure cannot cost the headline
    artifact) and write their device-time rows to STAGES_<round>.json."""
    import subprocess
    root = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for script in ("bench_stages.py", "bench_vocoder_stages.py"):
        def run_one(script=script):
            proc = subprocess.run(
                [sys.executable, os.path.join(root, "benchmarks", script)],
                capture_output=True, text=True, timeout=2400,
                env=os.environ.copy(), cwd=root)
            if proc.returncode != 0:
                raise RuntimeError(f"{script} rc={proc.returncode}: "
                                   f"{proc.stderr[-300:]}")
            return [json.loads(ln) for ln in proc.stdout.splitlines()
                    if ln.strip().startswith("{")]
        got = call_with_retries(f"stages:{script}", run_one, errors,
                                retries=2)
        if got:
            rows.extend(got)
    if rows:
        art = {"methodology": "chained K-diff(4,8) per stage "
                              "(benchmarks/bench_stages.py + "
                              "bench_vocoder_stages.py), device ms on the "
                              "production 30 s chunk",
               "precision": os.environ.get("BENCH_PRECISION", "default"),
               "rows": rows}
        path = os.path.join(root, f"STAGES_{_round_tag()}.json")
        with open(path, "w") as f:
            json.dump(art, f, indent=1)
        print(f"bench: wrote {path} ({len(rows)} stage rows)",
              file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
