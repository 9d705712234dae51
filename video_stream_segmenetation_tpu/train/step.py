"""Data-parallel training step for the matting nets.

SPMD recipe: batch axis sharded over the mesh 'data' axis, params
replicated; `jax.grad` under jit emits the psum gradient all-reduce over
ICI automatically via sharding propagation.  (The serving hot loop needs
no collectives at all -- SURVEY.md §2.10; training is where ICI earns its
keep.)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from video_stream_segmenetation_tpu.train.losses import matting_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-5):
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(model, rng, sample_batch, tx=None) -> tuple[TrainState, Any]:
    tx = tx or make_optimizer()
    variables = model.init(rng, sample_batch, train=False)
    return (
        TrainState(
            params=variables,
            opt_state=tx.init(variables),
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def make_train_step(model, tx, loss_fn=None):
    """Returns train_step(state, frames [B,H,W,3], alpha_gt [B,H,W]) ->
    (state, metrics).  jit/donate at the call site; shard `frames` and
    `alpha_gt` on the mesh data axis and replicate state.

    ``loss_fn(params, frames, alpha_gt) -> (loss, metrics)`` overrides
    the default matting loss (e.g. losses.make_pipeline_loss: backprop
    through the serving refine chain)."""

    if loss_fn is None:
        def loss_fn(params, frames, alpha_gt):
            out = model.apply(params, frames, train=False)
            return matting_loss(out, alpha_gt, frames)

    def train_step(state: TrainState, frames, alpha_gt):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frames, alpha_gt
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return train_step
