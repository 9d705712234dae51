"""Checkpoint / resume (SURVEY.md §5).

The reference's model "checkpoints" are static ONNX files fetched at
startup (model.ts:12-67); per-stream state is reset on reload.  Here:

* model params save/restore via orbax (service start = checkpoint read);
* optional stream-state snapshots (for planned restarts; cold start
  remains the documented recovery path -- zero-init recurrents /
  first-frame EMA copy).
"""

from __future__ import annotations

import dataclasses
import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params, overwrite: bool = True) -> None:
    """Write a param pytree to ``path`` (directory)."""
    path = os.path.abspath(path)
    if overwrite and os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    _checkpointer().save(path, jax.device_get(params))


def restore_params(path: str, like=None):
    """Read a param pytree; ``like`` (a template pytree) restores with
    matching dtypes/shardings when given."""
    path = os.path.abspath(path)
    if like is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(
            path, restore_args=ocp.checkpoint_utils.construct_restore_args(like)
        )
    return _checkpointer().restore(path)


def face_checkpoint_paths(ckpt_dir: str, fd_size: int, lmk_size: int):
    """Geometry-keyed face checkpoint paths (tools/train_face.py naming:
    facefinder keyed by FD, landmarknet by LMK; no suffix at the
    reference geometry 256/192).  Returns (fd_path, lmk_path)."""
    fd_suf = "" if fd_size == 256 else f"_{fd_size}"
    lmk_suf = "" if lmk_size == 192 else f"_{lmk_size}"
    return (
        os.path.join(ckpt_dir, "facefinder" + fd_suf),
        os.path.join(ckpt_dir, "landmarknet" + lmk_suf),
    )


def save_engine(path: str, engine) -> None:
    """Snapshot an Engine: params + stream state + knobs."""
    state = {
        "params": engine.bundle.params,
        "stream_state": engine.state,
        "knobs": engine.knobs,
    }
    save_params(path, state)


def restore_engine(path: str, engine) -> None:
    """Restore a snapshot into an existing Engine (same geometry)."""
    restored = restore_params(path)
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu.runtime.config import PipelineKnobs
    from video_stream_segmenetation_tpu.runtime.state import StreamState

    engine.bundle.matte_params = restored["params"]["matte"]
    if restored["params"].get("face") is not None:
        engine.bundle.face_params = restored["params"]["face"]
    if restored["params"].get("lmk") is not None:
        engine.bundle.lmk_params = restored["params"]["lmk"]
    ss = restored["stream_state"]
    rec = ss.get("rec", ())
    if rec:
        # restore the recurrent pytree with the engine's own structure
        rec = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(engine.state.rec),
            [jnp.asarray(x) for x in jax.tree_util.tree_leaves(rec)],
        )
    else:
        rec = ()
    engine.state = StreamState(
        prev_alpha=jnp.asarray(ss["prev_alpha"]),
        affine=jnp.asarray(ss["affine"]),
        has_affine=jnp.asarray(ss["has_affine"]),
        initialized=jnp.asarray(ss["initialized"]),
        frame_idx=jnp.asarray(ss["frame_idx"]),
        rec=rec,
    )
    kn = {k: jnp.asarray(v) for k, v in restored["knobs"].items()}
    # knob fields added after a snapshot was taken restore at the
    # engine's defaults (forward compatibility: e.g. ema_adapt)
    for f in dataclasses.fields(PipelineKnobs):
        if f.name not in kn:
            kn[f.name] = getattr(engine.knobs, f.name)
    engine.knobs = PipelineKnobs(**kn)
