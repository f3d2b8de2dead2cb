"""Pallas TPU kernels for the hot ops.

These are the framework's "native layer" (the reference has no C++/CUDA —
SURVEY.md §2.6): hand-written Mosaic kernels for the ops where fusion or
VMEM residency beats what XLA emits from the plain jax path in
`voicefixer_tpu.ops`:

- kernels.gru      — full GRU recurrence VMEM-resident (the one serial op)
- kernels.resstack — chained dilated residual groups + dispatch
- kernels.resstream— streaming whole-stack ResStack (+ fused upsample)
- kernels.upsample — fused x+sin(x) + polyphase transposed conv
- kernels.convblock— fused U-Net ConvBlockRes (bn+lrelu+conv x2 + residual).
  OPT-IN ONLY (VF_TPU_PALLAS_CONVBLOCK=1): r5 measured XLA's implicit-GEMM
  convs faster at every production U-Net level (models/resunet.py)
- kernels.stft     — fused frame/window/DFT/|.| (+ optional mel projection)

Every kernel has a jax reference implementation in `ops/` and a parity test
(tests/test_kernels.py, interpret mode on CPU; exact on TPU). Dispatch is
opt-out: the model code routes through `kernels.enabled()` which is true on
TPU backends unless VF_TPU_NO_PALLAS is set.

Vocoder ResStack dispatch matrix (production 30 s chunk, bf16; winners
measured on v5e by benchmarks/bench_vocoder_stages.py +
bench_res3_parts.py, r3-r4):

| stage | shape            | path (why) |
|-------|------------------|------------|
| res0  | C=512, T~21k     | resstack.plan_chain: chained groups for
|       |                  | dils 1..243; dil 729/2187 singles on the
|       |                  | r5 shifted-tap kernel (res_shift_single —
|       |                  | three row-offset tile reads; the halo
|       |                  | design couldn't fit those in VMEM and had
|       |                  | fallen back to XLA conv) |
| res1  | C=256, T~147k    | resstack.plan_chain (streaming's C=256
|       |                  | weight bank + rings alone blow VMEM);
|       |                  | dil-2187 single on the shifted-tap kernel |
| up2+res2 | 256->C=128, T~442k | resstream.up_res_stream fused (plain) |
| up3+res3 | 128->C=64, T~1.33M | resstream.up_res_stream fused, lane-
|       |                  | folded halves (res_fold layout) |

The unfused entry points (upsample.upsample, resstack.res_stack with its
stream_ok/_res_fold routing) remain both as the fallback for shapes the
fused path rejects and as the sequence-parallel building blocks
(parallel.sp drives stages shard-locally with mask_bounds).
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
