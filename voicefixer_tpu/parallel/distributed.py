"""Multi-host (multi-process) runtime initialization.

The reference has no multi-device story at all — its NCCL/MPI constants are
dead config (/root/reference/voicefixer/vocoder/config.py:156-159, never
read). The TPU-native replacement is `jax.distributed`: each host runs one
process, the coordinator bootstraps the cluster over DCN, and afterwards
`jax.devices()` spans every chip in the slice, so the ("data", "model")
mesh from `parallel.mesh` transparently covers all hosts. Shardings are laid
out so "model" (tensor-parallel, collective-heavy) stays inside a host's ICI
domain while "data" (embarrassingly parallel chunks / gradient psum) crosses
hosts on DCN — `make_mesh` gets this for free because `jax.devices()` orders
devices process-major, so adjacent devices (same host) land in the trailing
"model" axis.

Entry points:
- CLI: `python -m voicefixer_tpu ... --coordinator host:port
  --num-processes N --process-id K` (or the env vars below) on every host.
- Env-driven: VF_COORDINATOR / VF_NUM_PROCESSES / VF_PROCESS_ID, falling
  back to JAX's own auto-detection (TPU pods populate it from metadata).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def is_initialized() -> bool:
    return _initialized


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Bootstrap `jax.distributed` for a multi-host run. Returns True if the
    distributed runtime was (already or newly) initialized, False if no
    coordinator was specified anywhere (single-host run — a no-op, NOT an
    error, so single-process CLI usage stays zero-config).

    Arguments default to the VF_COORDINATOR / VF_NUM_PROCESSES /
    VF_PROCESS_ID environment variables. On TPU pods all three may be left
    unset IF the platform metadata provides them (jax.distributed's own
    auto-detection); pass VF_COORDINATOR=auto to force that path.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("VF_COORDINATOR")
    if coordinator is None:
        return False
    if num_processes is None and os.environ.get("VF_NUM_PROCESSES"):
        num_processes = int(os.environ["VF_NUM_PROCESSES"])
    if process_id is None and os.environ.get("VF_PROCESS_ID"):
        process_id = int(os.environ["VF_PROCESS_ID"])
    kwargs = {}
    if coordinator != "auto":
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def shutdown():
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write outputs / print logs."""
    return jax.process_index() == 0
