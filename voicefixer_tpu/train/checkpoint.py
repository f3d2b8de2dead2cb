"""Training checkpoint save / resume.

The reference has no training checkpointing (inference-only weight loading,
SURVEY.md 5). Here TrainState round-trips through the same npz pytree format
as converted model weights (utils/weights.py), with optimizer state
flattened alongside — dependency-free and mesh-agnostic (arrays are pulled
to host; reload + place_train_state re-shards on any mesh).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from voicefixer_tpu.train.step import TrainState
from voicefixer_tpu.utils import weights as W


def save_train_state(state: TrainState, path: str):
    """Write params/opt_state/step to `<path>` (npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    opt_flat, treedef = jax.tree.flatten(state.opt_state)
    payload = {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_flat": [np.asarray(x) for x in opt_flat],
        "step": np.asarray(state.step),
    }
    W.save_pytree_npz(payload, path)
    # treedef is reconstructed from a template at load time; record its
    # string form for an integrity check
    with open(path + ".treedef", "w") as f:
        f.write(str(treedef))


def load_train_state(path: str, optimizer_template) -> TrainState:
    """Reload a TrainState. `optimizer_template` is an
    optax.GradientTransformation used to rebuild the opt_state treedef
    (must match the one used at save time)."""
    payload = W.load_pytree_npz(path)
    params = payload["params"]
    ref_opt = optimizer_template.init(params)
    flat_ref, treedef = jax.tree.flatten(ref_opt)
    flat = payload["opt_flat"]
    if len(flat) != len(flat_ref):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(flat)} leaves, "
            f"template yields {len(flat_ref)}")
    opt_state = jax.tree.unflatten(
        treedef, [np.asarray(x, dtype=np.asarray(r).dtype)
                  for x, r in zip(flat, flat_ref)])
    return TrainState(params=params, opt_state=opt_state,
                      step=jax.numpy.asarray(payload["step"]))
