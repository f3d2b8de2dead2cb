"""Device mesh construction and sharding helpers.

The reference has no parallelism at all (SURVEY.md 2.6: single process,
batch=1, a sequential chunk loop — /root/reference/voicefixer/base.py:116-137;
its NCCL constants are dead config). The TPU-native scaling story is a
2-axis `jax.sharding.Mesh`:

- axis "data": utterances/chunks are embarrassingly parallel — batch goes
  data-parallel across hosts/chips (DCN-friendly: no cross-talk except
  gradient psum when training).
- axis "model": tensor parallelism over *channels* for the wide conv stacks
  (vocoder 1024->64 ch, UNet up to 384 ch). Annotated via
  `with_sharding_constraint`; XLA GSPMD inserts the all-gathers/
  reduce-scatters on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices data-parallel."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [B, ...] arrays batch-sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree)


def global_batch(mesh: Mesh, x):
    """Assemble a batch-sharded GLOBAL array on a (possibly multi-process)
    mesh. Single-process: a plain sharded device_put of the full batch.
    Multi-process (jax.distributed initialized): each process passes its own
    LOCAL rows and the runtime stitches the global [B_total, ...] array —
    the multi-host input path for data-parallel inference/training."""
    if jax.process_count() == 1:
        return jax.device_put(x, data_sharding(mesh, x.ndim))
    return jax.make_array_from_process_local_data(
        data_sharding(mesh, x.ndim), x)
