"""Global matmul/conv precision policy.

Parity mode (default) runs every contraction in float32 (`HIGHEST`), which
on TPU means multi-pass bf16 emulation on the MXU — required to match the
torch reference bit-for-bit-ish, but ~6x the MXU work of plain bf16.

Production mode (`set_precision("default")`, or the `precision("default")`
context manager) lets the MXU run native bf16 accumulate-f32, the
throughput configuration the benchmarks report separately.
"""

from __future__ import annotations

import contextlib

from jax import lax

_ALIASES = {
    "highest": lax.Precision.HIGHEST,
    "float32": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
    "bfloat16": lax.Precision.DEFAULT,
}

_current = lax.Precision.HIGHEST


def set_precision(p: str | lax.Precision):
    global _current
    _current = _ALIASES.get(p, p) if isinstance(p, str) else p


def get_precision() -> lax.Precision:
    return _current


def activation_dtype():
    """Storage dtype for streaming activations in the bandwidth-bound
    vocoder stages: production mode (DEFAULT) keeps them bf16 in HBM —
    halving the traffic of every conv/kernel pass — while parity mode
    stores fp32. Matmuls accumulate fp32 in both modes."""
    import jax.numpy as jnp
    return (jnp.bfloat16 if _current == lax.Precision.DEFAULT
            else jnp.float32)


@contextlib.contextmanager
def precision(p: str | lax.Precision):
    global _current
    prev = _current
    set_precision(p)
    try:
        yield
    finally:
        _current = prev
