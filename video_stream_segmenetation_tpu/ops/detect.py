"""Detector post-processing: anchor decode, best-box pick, IoU, NMS.

The reference delegates most of this to ONNX graphs; the visible contracts:

* MediaPipeFaceDetector: outputs box_coords [1,896,16] (normalized corner
  boxes) + box_scores [1,896,1]; the JS picks the argmax score with no NMS
  (runFaceDetector, client/src/core/frameProcessorTest.ts:415-423), denorms
  by the 256 input size, maps through the letterbox inverse, clamps to the
  frame and requires x1 > x0, y1 > y0 (:434-448).
* blaze.onnx runs NMS *inside* the graph with conf/iou/max_detections
  scalar inputs (runBlazeFace, client/src/core/frameProcessor.ts:270-291).
  Here NMS is a first-class jit-friendly op instead.

Anchors: the 896-anchor BlazeFace grid for a 256x256 input = 16x16x2 +
8x8x6 (standard MediaPipe full-range config), used by our JAX detector head
(models/blazeface.py) so its decoded output matches the ONNX contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def blazeface_anchors(input_size: int = 256) -> np.ndarray:
    """[A, 2] normalized (cx, cy) anchor centers: (in/16)^2 grid x2 anchors
    + (in/32)^2 grid x6 anchors.  For the canonical 256 input this is the
    MediaPipe back-model 896-anchor config (16x16x2 + 8x8x6) the reference
    contract exposes (box_coords [1,896,16], model.ts:32-34); other input
    sizes (e.g. blaze.onnx's 128) scale the grids consistently with the
    detector head strides."""
    anchors = []
    for grid, per_cell in ((input_size // 16, 2), (input_size // 32, 6)):
        for gy in range(grid):
            for gx in range(grid):
                cx = (gx + 0.5) / grid
                cy = (gy + 0.5) / grid
                anchors.extend([(cx, cy)] * per_cell)
    return np.asarray(anchors, dtype=np.float32)


def decode_anchor_boxes(
    raw: jnp.ndarray,
    anchors: jnp.ndarray,
    input_size: int = 256,
) -> jnp.ndarray:
    """Decode raw SSD regressions [..., A, 16] -> normalized corner boxes +
    keypoints, matching the MediaPipe convention the reference's patched
    ONNX bakes in: offsets are in input-pixel units relative to the anchor
    center; entries are (dcx, dcy, w, h, kp0x, kp0y, ... kp5x, kp5y).

    Output layout matches box_coords: (x0, y0, x1, y1, kp...) normalized.
    """
    scale = float(input_size)
    cx = anchors[..., 0] + raw[..., 0] / scale
    cy = anchors[..., 1] + raw[..., 1] / scale
    w = raw[..., 2] / scale
    h = raw[..., 3] / scale
    x0 = cx - w / 2
    y0 = cy - h / 2
    x1 = cx + w / 2
    y1 = cy + h / 2
    kps = raw[..., 4:16].reshape(raw.shape[:-1] + (6, 2))
    kpx = anchors[..., None, 0] + kps[..., 0] / scale
    kpy = anchors[..., None, 1] + kps[..., 1] / scale
    kp = jnp.stack([kpx, kpy], axis=-1).reshape(raw.shape[:-1] + (12,))
    return jnp.concatenate(
        [jnp.stack([x0, y0, x1, y1], axis=-1), kp], axis=-1
    )


def best_box_decode(
    coords: jnp.ndarray,
    scores: jnp.ndarray,
    video_hw: tuple[int, int],
    input_size: int = 256,
    letterboxed: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Argmax-over-anchors decode (runFaceDetector,
    frameProcessorTest.ts:415-448), batched.

    coords: ``[..., A, 16]`` normalized; scores: ``[..., A]`` (or
    ``[..., A, 1]``).  Returns (box ``[..., 4]`` video px, score ``[...]``,
    valid ``[...]`` bool).  valid requires a strictly positive box after
    clamping (:446).
    """
    if scores.shape[-1] == 1 and scores.ndim == coords.ndim:
        scores = scores[..., 0]
    vh, vw = video_hw
    best = jnp.argmax(scores, axis=-1)
    score = jnp.take_along_axis(scores, best[..., None], axis=-1)[..., 0]
    box_n = jnp.take_along_axis(
        coords, best[..., None, None], axis=-2
    )[..., 0, :4]
    # normalized [0,1] -> model-input pixels
    p = box_n * input_size
    p0 = p[..., 0:2]
    p1 = p[..., 2:4]
    if letterboxed:
        from video_stream_segmenetation_tpu.ops.geometry import letterbox_inverse_map

        p0 = letterbox_inverse_map(p0, video_hw, input_size)
        p1 = letterbox_inverse_map(p1, video_hw, input_size)
    else:
        # plain resize preprocess: input px -> video px
        s = jnp.asarray([vw / input_size, vh / input_size], dtype=p0.dtype)
        p0 = p0 * s
        p1 = p1 * s
    x0 = jnp.clip(p0[..., 0], 0, vw)
    y0 = jnp.clip(p0[..., 1], 0, vh)
    x1 = jnp.clip(p1[..., 0], 0, vw)
    y1 = jnp.clip(p1[..., 1], 0, vh)
    valid = (x1 > x0) & (y1 > y0)
    return jnp.stack([x0, y0, x1, y1], axis=-1), score, valid


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between ``[..., N, 4]`` and ``[..., M, 4]`` corner boxes ->
    ``[..., N, M]``."""
    ax0, ay0, ax1, ay1 = (a[..., :, None, i] for i in range(4))
    bx0, by0, bx1, by1 = (b[..., None, :, i] for i in range(4))
    ix0 = jnp.maximum(ax0, bx0)
    iy0 = jnp.maximum(ay0, by0)
    ix1 = jnp.minimum(ax1, bx1)
    iy1 = jnp.minimum(ay1, by1)
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    area_a = jnp.maximum(ax1 - ax0, 0) * jnp.maximum(ay1 - ay0, 0)
    area_b = jnp.maximum(bx1 - bx0, 0) * jnp.maximum(by1 - by0, 0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: jnp.ndarray | float = 0.3,
    score_threshold: jnp.ndarray | float = 0.5,
    max_detections: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS as a static-shape XLA loop -- the TPU-native equivalent of
    the NMS baked into blaze.onnx (conf_threshold/iou_threshold/
    max_detections scalar inputs, frameProcessor.ts:270-280).

    boxes ``[N, 4]``, scores ``[N]``.  Returns (boxes ``[K, 4]``,
    scores ``[K]``, valid ``[K]``) with K = max_detections, ordered by
    descending score; invalid slots are zero.
    """
    n = boxes.shape[0]
    alive = scores >= jnp.asarray(score_threshold, scores.dtype)

    def body(carry, _):
        alive_c, = carry
        masked = jnp.where(alive_c, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        ok = masked[idx] > -jnp.inf
        box = jnp.where(ok, boxes[idx], jnp.zeros((4,), boxes.dtype))
        sc = jnp.where(ok, scores[idx], 0.0)
        ious = box_iou(box[None, :], boxes)[0]
        suppress = ious > jnp.asarray(iou_threshold, scores.dtype)
        alive_n = alive_c & ~suppress
        alive_n = alive_n.at[idx].set(False)
        alive_n = jnp.where(ok, alive_n, alive_c)
        return (alive_n,), (box, sc, ok)

    (_,), (out_boxes, out_scores, out_valid) = jax.lax.scan(
        body, (alive,), None, length=max_detections
    )
    return out_boxes, out_scores, out_valid


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    capacity: int,
    iou_threshold: jnp.ndarray | float,
    score_threshold: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning padded *indices* -- the static-shape form of
    ONNX NonMaxSuppression (used by the blaze.onnx graph port,
    utils/onnx_exec.py).  boxes ``[N, 4]`` corner format (either axis
    order; IoU is order-symmetric), scores ``[N]``.  Returns
    (idx ``[capacity]`` int32, valid ``[capacity]`` bool) in descending
    score order of the kept boxes."""
    alive = scores > jnp.asarray(score_threshold, scores.dtype)

    def body(carry, _):
        alive_c, = carry
        masked = jnp.where(alive_c, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        ok = masked[idx] > -jnp.inf
        box = boxes[idx]
        ious = box_iou(box[None, :], boxes)[0]
        suppress = ious > jnp.asarray(iou_threshold, scores.dtype)
        alive_n = alive_c & ~suppress
        alive_n = alive_n.at[idx].set(False)
        alive_n = jnp.where(ok, alive_n, alive_c)
        return (alive_n,), (idx.astype(jnp.int32), ok)

    (_,), (idxs, valid) = jax.lax.scan(
        body, (alive,), None, length=capacity
    )
    return idxs, valid
