"""Per-stream runtime state as batched device arrays.

The reference keeps this state in module globals for its single stream
(prevAlpha frameProcessorTest.ts:47, lastAffine main.ts:14, RVM recurrent
tensors frameProcessorRVM.ts:16-22), reset on page reload.  Here each item
is row ``s`` of an ``[S, ...]`` array; admission/eviction is a functional
row reset, and the whole pytree lives in HBM across steps (SURVEY.md §5
checkpoint/resume: state is droppable/recreatable, zero-init is the
documented cold start).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

IDENTITY_AFFINE = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamState:
    prev_alpha: jnp.ndarray  # [S, h, w] EMA accumulator (mask res)
    affine: jnp.ndarray  # [S, 6] last merged affine (mask space)
    has_affine: jnp.ndarray  # [S] bool -- lastAffine != null
    initialized: jnp.ndarray  # [S] bool -- prevAlpha != null
    frame_idx: jnp.ndarray  # [S] int32 -- per-stream frame counter
    # optional recurrent-matting state (RecurrentMatteNet r1..r4 pytree,
    # the batched form of frameProcessorRVM.ts:16-22); () when unused
    rec: tuple = ()
    # translation-tracking state (prevFaceCenter, frameProcessor.ts:46):
    # [S, 2] mask-space face center + [S] validity
    face_center: jnp.ndarray | None = None
    has_center: jnp.ndarray | None = None

    @property
    def num_streams(self) -> int:
        return self.prev_alpha.shape[0]


def init_state(
    num_streams: int, mask_hw: tuple[int, int], rec: tuple = ()
) -> StreamState:
    h, w = mask_hw
    s = num_streams
    return StreamState(
        prev_alpha=jnp.zeros((s, h, w), jnp.float32),
        affine=jnp.tile(jnp.asarray(IDENTITY_AFFINE, jnp.float32), (s, 1)),
        has_affine=jnp.zeros((s,), bool),
        initialized=jnp.zeros((s,), bool),
        frame_idx=jnp.zeros((s,), jnp.int32),
        rec=rec,
        face_center=jnp.zeros((s, 2), jnp.float32),
        has_center=jnp.zeros((s,), bool),
    )


def reset_streams(state: StreamState, mask: jnp.ndarray) -> StreamState:
    """Cold-start the streams where ``mask`` is True (admission/eviction/
    error recovery).  Jit-friendly: pure where-merge against fresh state;
    recurrent state zero-fills (the documented RVM cold start,
    frameProcessorRVM.ts:48-53)."""
    fresh = jax.tree_util.tree_map(jnp.zeros_like, state)
    fresh = dataclasses.replace(
        fresh,
        affine=jnp.tile(
            jnp.asarray(IDENTITY_AFFINE, jnp.float32), (state.num_streams, 1)
        ),
    )

    def merge(new, old):
        m = mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree_util.tree_map(merge, fresh, state)


def reset_stream(state: StreamState, s: int) -> StreamState:
    """Reset a single stream slot by index (host-side admission API)."""
    mask = jnp.zeros((state.num_streams,), bool).at[s].set(True)
    return reset_streams(state, mask)
