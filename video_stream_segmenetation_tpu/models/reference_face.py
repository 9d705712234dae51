"""The reference's REAL shipped face weights, served natively in JAX.

The reference repo commits three face models
(client/src/assets/MediaPipeFaceDetector.onnx /
MediaPipeFaceLandmarkDetector.onnx / blaze.onnx — SURVEY.md §2.7).  This
module imports those exact weights (parsed by utils/onnx_lite.py, executed
by utils/onnx_exec.py's jittable port) and exposes them behind the same
batched NHWC interface as our fast serving models (models/blazeface.py /
facemesh.py), so the engine can serve the *true reference face stack* with
``Engine.use_reference_face_models()``:

* ``ReferenceFaceFinder.apply(params, x [S,256,256,3])`` ->
  ``{"box_coords": [S,896,16] decoded normalized corners+kps,
     "box_scores": [S,896] sigmoid}`` — the raw graph emits SSD
  regressions in input-pixel units relative to the 896-anchor grid
  (16x16x2 + 8x8x6), decoded here by ops.detect.decode_anchor_boxes (the
  *intended* decode; the reference JS's own decode path was dead at
  runtime, SURVEY.md App. A).
* ``ReferenceLandmarkNet.apply(params, x [S,192,192,3])`` ->
  ``{"landmarks": [S,468,3] normalized, "scores": [S] sigmoid}``.

Weights are cached as ``checkpoints/face_ref/*.npz`` by
tools/import_reference_weights.py so serving does not require the
reference checkout.  Parity vs the numpy oracle executor is recorded in
benchmarks/PARITY.json (tools/face_parity.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

REF_ASSETS = "/root/reference/client/src/assets"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CKPT_DIR = os.path.join(_REPO_ROOT, "checkpoints", "face_ref")

DETECTOR_ONNX = "MediaPipeFaceDetector.onnx"
LANDMARK_ONNX = "MediaPipeFaceLandmarkDetector.onnx"
BLAZE_ONNX = "blaze.onnx"


def _npz_path(kind: str) -> str:
    return os.path.join(CKPT_DIR, f"{kind}.npz")


def import_onnx_to_npz(kind: str, onnx_path: str) -> str:
    """Convert an ONNX file's initializers to a flat npz checkpoint
    (keys = graph value names).  Returns the npz path."""
    from video_stream_segmenetation_tpu.utils import onnx_lite

    model = onnx_lite.load(onnx_path)
    os.makedirs(CKPT_DIR, exist_ok=True)
    out = _npz_path(kind)
    np.savez(out, **model.graph.initializers)
    return out


def _load_params(kind: str, onnx_name: str) -> dict[str, np.ndarray]:
    npz = _npz_path(kind)
    if os.path.exists(npz):
        with np.load(npz) as z:
            return {k: z[k] for k in z.files}
    src = os.path.join(REF_ASSETS, onnx_name)
    if not os.path.exists(src):
        raise FileNotFoundError(
            f"no cached weights at {npz} and no reference checkout at {src}; "
            f"run tools/import_reference_weights.py where the reference "
            f"assets are available"
        )
    import_onnx_to_npz(kind, src)
    with np.load(_npz_path(kind)) as z:
        return {k: z[k] for k in z.files}


def _graph_fn(onnx_name: str):
    """(fn, graph-input-name) for an ONNX asset; structure only (weights
    come from the npz so the onnx file itself is optional at runtime)."""
    from video_stream_segmenetation_tpu.utils import onnx_exec, onnx_lite

    path = os.path.join(REF_ASSETS, onnx_name)
    if not os.path.exists(path):
        # structure cache: ship the graph skeleton alongside the npz
        path = os.path.join(CKPT_DIR, onnx_name)
    model = onnx_lite.load(path)
    fn, _ = onnx_exec.build_jax_fn(model)
    return fn


def _ensure_structure_cached(onnx_name: str) -> None:
    """Copy the .onnx graph file next to the npz (it IS the architecture
    definition; without it only weights exist)."""
    dst = os.path.join(CKPT_DIR, onnx_name)
    if os.path.exists(dst):
        return
    src = os.path.join(REF_ASSETS, onnx_name)
    if os.path.exists(src):
        os.makedirs(CKPT_DIR, exist_ok=True)
        with open(src, "rb") as f, open(dst, "wb") as g:
            g.write(f.read())


class ReferenceFaceFinder:
    """Real-weight detector behind the FaceFinder serving contract."""

    input_size = 256

    def __init__(self):
        self._fn = _graph_fn(DETECTOR_ONNX)

    def init_params(self) -> dict[str, np.ndarray]:
        return _load_params("detector", DETECTOR_ONNX)

    def apply(self, params, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        from video_stream_segmenetation_tpu.ops.detect import (
            blazeface_anchors,
            decode_anchor_boxes,
        )

        nchw = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
        out = jax.vmap(
            lambda img: self._fn(params, image=img[None]), in_axes=0
        )(nchw)
        raw = out["box_coords"][:, 0]          # [S, 896, 16] SSD regressions
        logits = out["box_scores"][:, 0, :, 0]  # [S, 896]
        anchors = jnp.asarray(blazeface_anchors(self.input_size))
        coords = decode_anchor_boxes(raw, anchors, self.input_size)
        return {"box_coords": coords, "box_scores": jax.nn.sigmoid(logits)}


class ReferenceLandmarkNet:
    """Real-weight FaceMesh-468 behind the LandmarkNet serving contract."""

    input_size = 192

    def __init__(self):
        self._fn = _graph_fn(LANDMARK_ONNX)

    def init_params(self) -> dict[str, np.ndarray]:
        return _load_params("landmarks", LANDMARK_ONNX)

    def apply(self, params, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        nchw = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
        out = jax.vmap(
            lambda img: self._fn(params, image=img[None]), in_axes=0
        )(nchw)
        return {
            "landmarks": out["landmarks"][:, 0],  # [S, 468, 3] normalized
            "scores": out["scores"][:, 0],         # [S] sigmoid already
        }


def cache_reference_weights() -> dict[str, str]:
    """Import all shipped face weights into checkpoints/face_ref/.
    Returns {kind: npz_path}."""
    paths = {}
    for kind, name in (
        ("detector", DETECTOR_ONNX),
        ("landmarks", LANDMARK_ONNX),
        ("blaze", BLAZE_ONNX),
    ):
        src = os.path.join(REF_ASSETS, name)
        if os.path.exists(src):
            paths[kind] = import_onnx_to_npz(kind, src)
            _ensure_structure_cached(name)
    return paths
