"""Sharded training step for the analysis stage.

TPU-native design: one jitted step over a ("data", "model") mesh —
batch data-parallel, large kernels channel-sharded (parallel.sharding).
GSPMD inserts the gradient psum over "data" and the activation collectives
over "model"; nothing here issues a collective by hand.

The reference has no runnable training (SURVEY.md 2.2/2.6); its optimizer
recipe — Adam lr 3e-4, beta (0.5, 0.999), LambdaLR warmup 1000 steps then
gamma^(step//15000) — is preserved from restorer/model.py:407-431,365-377.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import optax

from voicefixer_tpu.config import VoiceFixerConfig
from voicefixer_tpu.parallel.mesh import data_sharding, replicated
from voicefixer_tpu.parallel.sharding import param_shardings
from voicefixer_tpu.train import losses


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Any


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])


def reference_optimizer(lr: float = 3e-4, beta1: float = 0.5,
                        beta2: float = 0.999, warmup_steps: int = 1000,
                        gamma: float = 0.85,
                        decay_every: int = 15000) -> optax.GradientTransformation:
    """Adam + the reference's warmup/step-decay schedule
    (restorer/model.py:365-377,407-431)."""
    def schedule(step):
        warm = jax.numpy.clip(step / warmup_steps, 0.0, 1.0)
        decay = gamma ** (step // decay_every)
        return lr * warm * decay

    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def init_train_state(params, optimizer=None) -> TrainState:
    optimizer = optimizer or reference_optimizer()
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jax.numpy.zeros((), dtype=jax.numpy.int32))


def make_train_step(cfg: VoiceFixerConfig, optimizer=None, mesh=None,
                    donate: bool = True):
    """Build the jitted train step.

    step(state, wav_noisy [B,N], wav_clean [B,N], rng) -> (state, metrics).

    With `mesh`, params/opt_state are laid out per parallel.sharding (tensor
    parallel over "model") and the batch is sharded over "data".
    """
    optimizer = optimizer or reference_optimizer()

    def step_fn(state: TrainState, wav_noisy, wav_clean, rng):
        grad_fn = jax.value_and_grad(losses.analysis_loss, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, wav_noisy, wav_clean,
                                      cfg, rng=rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def state_shardings(state: TrainState):
        p_shard = param_shardings(state.params, mesh)
        opt_shard = jax.tree.map(
            lambda x: param_shardings(x, mesh) if isinstance(x, dict)
            else replicated(mesh), state.opt_state,
            is_leaf=lambda x: isinstance(x, dict))
        return TrainState(params=p_shard, opt_state=opt_shard,
                          step=replicated(mesh))

    def shardings_for(state):
        ss = state_shardings(state)
        batch_s = data_sharding(mesh, 2)
        return ss, batch_s

    def jitted(state):
        ss, batch_s = shardings_for(state)
        return jax.jit(
            step_fn,
            in_shardings=(ss, batch_s, batch_s, replicated(mesh)),
            out_shardings=(ss, replicated(mesh)),
            donate_argnums=(0,) if donate else (),
        )

    _cache = {}

    def step(state, wav_noisy, wav_clean, rng):
        if "fn" not in _cache:
            _cache["fn"] = jitted(state)
        return _cache["fn"](state, wav_noisy, wav_clean, rng)

    return step


def place_train_state(state: TrainState, mesh) -> TrainState:
    """device_put the state with the same shardings make_train_step expects."""
    from voicefixer_tpu.parallel.sharding import shard_params
    params = shard_params(state.params, mesh)
    opt_state = jax.tree.map(
        lambda x: shard_params(x, mesh) if isinstance(x, dict)
        else jax.device_put(x, replicated(mesh)), state.opt_state,
        is_leaf=lambda x: isinstance(x, dict))
    step = jax.device_put(state.step, replicated(mesh))
    return TrainState(params=params, opt_state=opt_state, step=step)
