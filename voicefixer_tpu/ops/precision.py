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


@contextlib.contextmanager
def precision(p: str | lax.Precision):
    global _current
    prev = _current
    set_precision(p)
    try:
        yield
    finally:
        _current = prev
