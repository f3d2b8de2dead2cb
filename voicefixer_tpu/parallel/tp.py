"""Tensor-parallel inference context.

The reference has no multi-device inference at all (its NCCL constants are
dead config — /root/reference/voicefixer/vocoder/config.py:156-159). The
TPU-native design is GSPMD: `VoiceFixer(mesh=...)` shards every large conv
kernel channel-out over the mesh's "model" axis (parallel.sharding) and the
model code drops `with_sharding_constraint` pins on stage-boundary
activations via `constrain_channels`. XLA then propagates the shardings
through each conv stack and inserts the ICI collectives (all-gather /
reduce-scatter) at the contraction points — no hand-written collectives.

The active mesh is carried by a context variable that is only read at jit
TRACE time: callers enter `use_mesh(mesh)` around the traced call (the
`VoiceFixer` facade does this on every jitted-call wrapper, which is free
after the first trace). With no active mesh (or n_model == 1) every helper
is an exact no-op, so single-device paths compile unchanged.

The "model" axis is split by stage: the ANALYSIS models use the GSPMD
channel parallelism above, while the VOCODER (narrow channels, 1.3 M-sample
time axis) runs SEQUENCE-parallel instead (parallel.sp) — time sharded over
the same axis inside a shard_map with ppermute halo exchange, each shard
running the fused Pallas kernels intact. Outside a shard_map body the
kernels remain single-device programs with no GSPMD partitioning rule, so
`kernels.use` routes GSPMD-sharded model code to the plain-jax path when a
model-parallel mesh is active (`model_parallel()` below) — except inside
parallel.sp's shard_map, where arrays are shard-local and the kernels stay
on (sp.in_shard_map). Data-parallel meshes keep the fused kernels
everywhere (batch sharding never crosses a kernel).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "vf_tp_mesh", default=None)

# channel widths below this are replicated: the ICI latency of gathering
# a sliver exceeds the FLOP savings (mirrors sharding.param_specs)
MIN_CHANNELS = 64


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Activate `mesh` for sharding-constraint placement during tracing."""
    token = _ACTIVE.set(mesh)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def active_mesh() -> Mesh | None:
    return _ACTIVE.get()


def model_parallel() -> bool:
    """True when a mesh with a >1 "model" axis is active."""
    mesh = _ACTIVE.get()
    return mesh is not None and mesh.shape.get("model", 1) > 1


def wrap(fn, mesh: Mesh | None):
    """Wrap a jitted callable so every call (hence the trace) runs inside
    `use_mesh(mesh)`. No-op wrapper when mesh is None."""
    if mesh is None:
        return fn

    def wrapped(*args, **kwargs):
        with use_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def replicate_model(x, batch_axis: int | None = 0):
    """Pin an activation to be replicated over the "model" axis (batch
    still over "data" when it divides). Used at boundaries where a tensor's
    trailing dim is NOT a channel axis — e.g. the [B, T, n_mel(, 2)] mel
    tensors entering the U-Net, whose mel axis is *spatial* for the conv
    stack: letting a frequency sharding propagate into freq convs/pools
    would make GSPMD partition a halo'd spatial axis."""
    mesh = _ACTIVE.get()
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return x
    spec = [None] * x.ndim
    if batch_axis is not None and x.shape[batch_axis] % mesh.shape.get(
            "data", 1) == 0:
        spec[batch_axis] = "data"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def constrain_channels(x, batch_axis: int | None = 0,
                       min_channels: int = MIN_CHANNELS):
    """Pin a [B, ..., C] activation to (batch over "data", C over "model").

    No-op unless a model-parallel mesh is active, C >= min_channels, and C
    divides evenly; the batch dim is pinned to "data" only when it divides
    (single-chunk paths keep B=1 replicated).
    """
    mesh = _ACTIVE.get()
    if mesh is None:
        return x
    n_model = mesh.shape.get("model", 1)
    if n_model <= 1:
        return x
    ch = x.shape[-1]
    if ch < min_channels or ch % n_model:
        return x
    spec = [None] * x.ndim
    spec[-1] = "model"
    if batch_axis is not None and x.shape[batch_axis] % mesh.shape.get(
            "data", 1) == 0:
        spec[batch_axis] = "data"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
