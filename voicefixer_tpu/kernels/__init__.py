"""Pallas TPU kernels for the hot ops.

These are the framework's "native layer" (the reference has no C++/CUDA —
SURVEY.md §2.6): hand-written Mosaic kernels for the ops where fusion or
VMEM residency beats what XLA emits from the plain jax path in
`voicefixer_tpu.ops`:

- kernels.gru      — full GRU recurrence VMEM-resident (the one serial op)
- kernels.resstack — fused dilated residual block (lrelu→conv→lrelu→conv→+x)
- kernels.upsample — fused x+sin(x) + polyphase transposed conv
- kernels.stft     — fused frame/window/DFT/|.| (+ optional mel projection)

Every kernel has a jax reference implementation in `ops/` and a parity test
(tests/test_kernels.py, interpret mode on CPU; exact on TPU). Dispatch is
opt-out: the model code routes through `kernels.enabled()` which is true on
TPU backends unless VF_TPU_NO_PALLAS is set.
"""

from __future__ import annotations

import os

import jax


def enabled() -> bool:
    """Use Pallas kernels? True on a real TPU backend unless disabled.
    Under a model-parallel mesh the kernels stay on only inside a shard_map
    body (parallel.sp), where arrays are shard-local single-device values;
    outside one, GSPMD-sharded arrays route to the plain-jax path (the
    kernels have no partitioning rule — parallel.tp)."""
    if os.environ.get("VF_TPU_NO_PALLAS"):
        return False
    from voicefixer_tpu.parallel import sp, tp
    if tp.model_parallel() and not sp.in_shard_map():
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def use(name: str) -> bool:
    """Per-kernel dispatch: enabled() plus a VF_TPU_NO_PALLAS_<NAME>
    opt-out (name in {GRU, RESSTACK, UPSAMPLE, STFT})."""
    return enabled() and not os.environ.get(f"VF_TPU_NO_PALLAS_{name.upper()}")


def matmul_dtype():
    """Kernel matmul input dtype following the global precision policy
    (ops.precision): parity mode (HIGHEST) keeps fp32 operands; production
    mode (DEFAULT) feeds the MXU bf16 with fp32 accumulation — the same
    trade XLA makes for lax convs under Precision.DEFAULT."""
    import jax.numpy as jnp
    from jax import lax

    from voicefixer_tpu.ops.precision import get_precision
    return (jnp.bfloat16 if get_precision() == lax.Precision.DEFAULT
            else jnp.float32)
