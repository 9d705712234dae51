"""Train FaceFinder + LandmarkNet on synthetic face scenes.

Trains at the serving distribution (runtime/pipeline.py::_face_subpath):
detector on letterboxed guide-resolution frames, landmarks on padded +
jittered ROI crops; saves orbax checkpoints the Engine loads via
``load_face_params``.  Evaluation: detector box IoU + landmark px error
on held-out scenes.

Run: JAX_PLATFORMS= python tools/train_face.py [steps]
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from video_stream_segmenetation_tpu import models, ops, utils  # noqa: E402
from video_stream_segmenetation_tpu.ops.detect import blazeface_anchors  # noqa: E402
from video_stream_segmenetation_tpu.ops.geometry import letterbox_params, pad_box  # noqa: E402
from video_stream_segmenetation_tpu.train.face import (  # noqa: E402
    detector_loss,
    landmark_loss,
    synthetic_face_batch,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints")
SCENE_HW = (288, 512)  # guide resolution (the face_input='guide' source)
# geometry overrides (the face-subpath cost lever, VERDICT r3 #5): the
# serving default is FD 256 / LMK 192 (the reference's FD_INPUT /
# LMK_INPUT); smaller inputs quarter the detector/landmark conv FLOPs.
# Checkpoints save under a _<FD> suffix when non-default so the default
# bundles stay untouched.
FD = int(os.environ.get("VST_FD", "256"))
LMK = int(os.environ.get("VST_LMK", "192"))
# checkpoints are geometry-keyed per model: facefinder by FD, landmarknet
# by LMK (the models are independent; 'landmarknet_128' = LMK 128
# regardless of the detector it trained beside).  VST_SKIP_FD=1 /
# VST_SKIP_LMK=1 train just one side (e.g. an lmk-96 candidate next to
# the already-served fd-128 detector).
FD_SUFFIX = "" if FD == 256 else f"_{FD}"
LMK_SUFFIX = "" if LMK == 192 else f"_{LMK}"
SKIP_FD = bool(os.environ.get("VST_SKIP_FD"))
SKIP_LMK = bool(os.environ.get("VST_SKIP_LMK"))


def letterbox_batch(frames, box):
    """Frames+boxes -> FD letterbox input + normalized gt corners."""
    h, w = SCENE_HW
    _, dw, dh, off_x, off_y = letterbox_params(SCENE_HW, FD)
    small = ops.resize_bilinear_mxu(frames, (dh, dw), method="half_pixel")
    pads = [(0, 0), (off_y, FD - dh - off_y), (off_x, FD - dw - off_x), (0, 0)]
    fd_in = jnp.pad(small, pads)
    sx, sy = dw / w, dh / h
    gt = jnp.stack(
        [
            (box[:, 0] * sx + off_x) / FD,
            (box[:, 1] * sy + off_y) / FD,
            (box[:, 2] * sx + off_x) / FD,
            (box[:, 3] * sy + off_y) / FD,
        ],
        axis=-1,
    )
    return fd_in, gt


def lmk_batch(key, frames, box, landmarks):
    """Padded + jittered ROI crops with ROI-normalized landmarks; 25% of
    crops are shifted off-face negatives (score target 0)."""
    b = frames.shape[0]
    h, w = SCENE_HW
    k1, k2, k3 = jax.random.split(key, 3)
    roi = pad_box(box, 0.25, SCENE_HW)
    # jitter: scale 0.9-1.15, shift up to 10% of roi size
    jw = (roi[:, 2] - roi[:, 0])
    jh = (roi[:, 3] - roi[:, 1])
    sc = jax.random.uniform(k1, (b,), minval=0.9, maxval=1.15)
    shift = jax.random.uniform(k2, (b, 2), minval=-0.1, maxval=0.1)
    cx = (roi[:, 0] + roi[:, 2]) / 2 + shift[:, 0] * jw
    cy = (roi[:, 1] + roi[:, 3]) / 2 + shift[:, 1] * jh
    is_face = jax.random.uniform(k3, (b,)) > 0.25
    # negatives: slide the crop one-and-a-half widths sideways
    cx = jnp.where(is_face, cx, cx + 1.6 * jw * jnp.sign(shift[:, 0] + 1e-3))
    half_w = jw * sc / 2
    half_h = jh * sc / 2
    roi_j = jnp.stack([cx - half_w, cy - half_h, cx + half_w, cy + half_h], -1)
    crop = ops.crop_and_resize_mxu(frames, roi_j, (LMK, LMK))
    gt = jnp.stack(
        [
            (landmarks[..., 0] - roi_j[:, None, 0]) / (2 * half_w[:, None]),
            (landmarks[..., 1] - roi_j[:, None, 1]) / (2 * half_h[:, None]),
        ],
        axis=-1,
    )
    return crop, gt, is_face


def train_model(name, model, loss_fn, data_fn, steps, lr, sample):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=1e-5))
    params = model.init(jax.random.PRNGKey(0), sample)
    opt = tx.init(params)

    def step(params, opt, key):
        def lf(p):
            return loss_fn(p, key)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, metrics

    # chunked: roll 200 steps into one dispatch (fori_loop, traced count)
    # -- the python loop pays one dispatch per step, and per-dispatch
    # cost on this host is 150-500 ms (BENCH r4 diag), which would bound
    # training at ~3 steps/s whatever the chip does
    from jax import lax

    def multi(params, opt, rng0, n):
        def body(j, c):
            p, o, rng, _ = c
            rng, k = jax.random.split(rng)
            p, o, loss, _m = step(p, o, k)
            return p, o, rng, loss

        return lax.fori_loop(
            0, n, body, (params, opt, rng0, jnp.float32(0.0))
        )

    multi_j = jax.jit(multi, donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(1)
    i, chunk = 0, 200
    while i < steps:
        n = min(chunk, steps - i)
        params, opt, rng, loss = multi_j(params, opt, rng, n)
        i += n
        print(
            f"[{name}] {json.dumps({'step': i, 'loss': round(float(loss), 4)})}",
            flush=True,
        )
    return params


def main(steps=2000, batch=32):
    os.makedirs(OUT, exist_ok=True)

    # ---- detector
    fd_model = models.FaceFinder(input_size=FD)
    anchors = jnp.asarray(blazeface_anchors(FD))

    def fd_loss(params, key):
        frames, box, _ = synthetic_face_batch(key, batch, SCENE_HW)
        fd_in, gt = letterbox_batch(frames, box)
        out = fd_model.apply(params, fd_in)
        return detector_loss(out, gt, anchors)

    if SKIP_FD:
        fd_params = utils.restore_params(
            os.path.join(OUT, "facefinder" + FD_SUFFIX)
        )
        print("[facefinder] reusing existing checkpoint", flush=True)
    else:
        fd_params = train_model(
            "facefinder", fd_model, fd_loss, None, steps, 1e-3,
            jnp.zeros((1, FD, FD, 3)),
        )
        utils.save_params(
            os.path.join(OUT, "facefinder" + FD_SUFFIX), fd_params
        )
        print("[facefinder] saved", flush=True)

    # ---- landmarks
    lmk_model = models.LandmarkNet()

    def lm_loss(params, key):
        k1, k2 = jax.random.split(key)
        frames, box, landmarks = synthetic_face_batch(k1, batch, SCENE_HW)
        crop, gt, is_face = lmk_batch(k2, frames, box, landmarks)
        out = lmk_model.apply(params, crop)
        return landmark_loss(out, gt, is_face)

    if SKIP_LMK:
        lmk_params = utils.restore_params(
            os.path.join(OUT, "landmarknet" + LMK_SUFFIX)
        )
        print("[landmarknet] reusing existing checkpoint", flush=True)
    else:
        lmk_params = train_model(
            "landmarknet", lmk_model, lm_loss, None, steps, 1e-3,
            jnp.zeros((1, LMK, LMK, 3)),
        )
        utils.save_params(
            os.path.join(OUT, "landmarknet" + LMK_SUFFIX), lmk_params
        )
        print("[landmarknet] saved", flush=True)

    # ---- eval on held-out scenes
    frames, box, landmarks = synthetic_face_batch(
        jax.random.PRNGKey(777), 64, SCENE_HW
    )
    fd_in, gt = letterbox_batch(frames, box)
    det = fd_model.apply(fd_params, fd_in)
    pbox, score, valid = ops.best_box_decode(
        det["box_coords"], det["box_scores"], SCENE_HW, FD, letterboxed=True
    )
    gt_px = np.asarray(box)
    pb = np.asarray(pbox)
    ious = []
    for i in range(64):
        xa0, ya0 = max(pb[i, 0], gt_px[i, 0]), max(pb[i, 1], gt_px[i, 1])
        xa1, ya1 = min(pb[i, 2], gt_px[i, 2]), min(pb[i, 3], gt_px[i, 3])
        inter = max(0.0, xa1 - xa0) * max(0.0, ya1 - ya0)
        a = (pb[i, 2] - pb[i, 0]) * (pb[i, 3] - pb[i, 1])
        b2 = (gt_px[i, 2] - gt_px[i, 0]) * (gt_px[i, 3] - gt_px[i, 1])
        ious.append(inter / max(a + b2 - inter, 1e-6))
    print(json.dumps({
        "det_mean_iou": round(float(np.mean(ious)), 3),
        "det_mean_score": round(float(np.asarray(score).mean()), 3),
        "det_valid_frac": round(float(np.asarray(valid).mean()), 3),
    }), flush=True)

    roi = pad_box(jnp.asarray(box), 0.25, SCENE_HW)
    crop = ops.crop_and_resize_mxu(frames, roi, (LMK, LMK))
    lout = lmk_model.apply(lmk_params, crop)
    rw = np.asarray(roi[:, 2] - roi[:, 0])
    lm_px = np.asarray(lout["landmarks"][..., 0]) * rw[:, None] + np.asarray(roi[:, 0:1])
    gt_x = np.asarray(landmarks[..., 0])
    from video_stream_segmenetation_tpu.train.face import ANCHOR_IDS

    err = np.abs(lm_px[:, ANCHOR_IDS] - gt_x[:, ANCHOR_IDS]).mean()
    print(json.dumps({
        "lmk_anchor_x_err_px": round(float(err), 2),
        "lmk_mean_score": round(float(np.asarray(lout["scores"]).mean()), 3),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
