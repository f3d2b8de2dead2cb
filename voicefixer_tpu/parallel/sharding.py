"""Parameter partition specs for tensor parallelism.

Policy: shard the *output-channel* axis of large kernels over the "model"
mesh axis and let GSPMD propagate — activations become channel-sharded
through each conv stack, with XLA inserting ICI collectives at the
reshape/contract points. Small tensors (biases, BN stats, GRU cells, tiny
convs) are replicated: the collective cost would exceed the FLOP savings.

This is the TPU-native replacement for the reference's (nonexistent)
multi-device story (SURVEY.md 2.6).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param subtrees that must stay replicated: sequential cells and scalar
# stats, plus the whole denoiser — its FC widths are the MEL axis (n_mel
# = 128), which is a *spatial* axis for the downstream U-Net, not a channel
# axis; sharding it would push a frequency-sharded activation into the
# U-Net's freq convs/pools (and it is GRU-serial and tiny anyway).
_REPLICATED_KEYS = ("gru", "bn", "mean", "var", "gamma", "beta", "denoiser")


def _spec_for(path: str, x, n_model: int,
              min_channels: int) -> P:
    if n_model == 1:
        return P()
    leaf = path.rsplit("/", 1)[-1]
    if any(k in path for k in _REPLICATED_KEYS) or leaf == "b":
        return P()
    shape = np.shape(x)
    if len(shape) >= 2 and shape[-1] >= min_channels \
            and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1)), "model")
    return P()


def param_specs(params, n_model: int, min_channels: int = 64):
    """Pytree of PartitionSpec matching `params` (channel-out sharding)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, f"{path}/{i}")
                              for i, v in enumerate(node))
        return _spec_for(path, node, n_model, min_channels)

    return walk(params, "")


def param_shardings(params, mesh: Mesh, min_channels: int = 64):
    """Pytree of NamedSharding for `params` on `mesh`."""
    n_model = mesh.shape.get("model", 1)
    specs = param_specs(params, n_model, min_channels)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda s: isinstance(s, P))


def shard_params(params, mesh: Mesh, min_channels: int = 64):
    """device_put `params` according to param_shardings."""
    return jax.tree.map(jax.device_put, params,
                        param_shardings(params, mesh, min_channels))
