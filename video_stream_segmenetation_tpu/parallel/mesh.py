"""Device mesh + sharding layer (SURVEY.md §2.10 / §5-comm).

The reference has no distributed anything (single browser thread); the
TPU-native scale-out is stream-batch data parallelism: shard the leading
``S`` stream axis over a mesh ``data`` axis, replicate model params, and
let XLA insert collectives (none are needed in the hot loop -- streams are
independent; ICI only carries the startup weight broadcast).  A ``model``
axis exists for future tensor-parallel matting nets; v1 keeps it size 1.

This thin module is deliberately the single place that knows about
devices, so multi-host serving is a config change (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Mesh over the available (or given) devices: ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def stream_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading stream axis over 'data'; other dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_stream_tree(mesh: Mesh, tree):
    """Place a pytree of [S, ...] arrays with the stream axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, stream_sharding(mesh, x.ndim)), tree
    )


def replicate_tree(mesh: Mesh, tree):
    """Replicate params across the mesh (startup weight broadcast over
    ICI -- the only collective the serving hot loop needs)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )


def sharded_step(mesh: Mesh, step, donate_state: bool = True):
    """jit a pipeline step for mesh execution.

    Sharding is carried by the operands (place params with
    `replicate_tree`, state/frames/knobs with `shard_stream_tree`); jit
    propagates those placements through the whole program, and since
    streams are independent the compiled module contains zero hot-loop
    collectives.  State donation avoids a copy of the [S, h, w] EMA
    accumulator each step.
    """
    return jax.jit(step, donate_argnums=(1,) if donate_state else ())
