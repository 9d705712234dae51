"""Face-path parity vs the reference's REAL shipped weights -> PARITY.json.

The reference commits its face models as ONNX binaries
(client/src/assets/, contracts at client/src/core/model.ts:32-34 and
frameProcessorTest.ts:406-497).  This tool measures, with those exact
weights as the oracle:

1. **port_fidelity** — our jittable JAX port (utils/onnx_exec.build_jax_fn)
   vs an independent NumPy executor of the same graphs, on random and
   face-like inputs: max abs/rel per output.  Proves the weights were
   imported losslessly and the JAX execution is the same function.
2. **decode_consistency** — the serving wrapper
   (models/reference_face.ReferenceFaceFinder + ops.best_box_decode,
   letterboxed path) vs an independent NumPy re-derivation of the
   MediaPipe anchor decode: best-anchor agreement + box IoU.
3. **blaze_nms** — the blaze.onnx in-graph NonMaxSuppression (numpy
   oracle) vs our static-shape `ops.detect.nms_padded` inside the JAX
   port of the same graph: selected boxes compared row by row.
4. **student_vs_reference** — our fast dense-conv serving models
   (checkpoints/facefinder, checkpoints/landmarknet) scored against the
   real-weight teacher on held-out synthetic scenes: detector box IoU
   (student vs teacher, and each vs scene ground truth), landmark px
   error.  These are the non-self-referential quality numbers VERDICT.md
   round 1 asked for.

Run (CPU is fine): python tools/face_parity.py
Writes PARITY.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_stream_segmenetation_tpu import models, ops  # noqa: E402
from video_stream_segmenetation_tpu.models import reference_face as rf  # noqa: E402
from video_stream_segmenetation_tpu.ops.detect import blazeface_anchors  # noqa: E402
from video_stream_segmenetation_tpu.ops.geometry import letterbox_params, pad_box  # noqa: E402
from video_stream_segmenetation_tpu.train.face import synthetic_face_batch  # noqa: E402
from video_stream_segmenetation_tpu.utils import onnx_exec, onnx_lite  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE_HW = (288, 512)
FD = 256
LMK = 192


def _face_like(size: int, rng) -> np.ndarray:
    """A face-like [1,3,size,size] input (skin ellipse + features)."""
    img = np.full((size, size, 3), 0.25, np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx, cy, r = size / 2, size * 0.47, size * 0.14
    face = ((yy - cy) / (r * 1.25)) ** 2 + ((xx - cx) / r) ** 2 < 1
    img[face] = (0.85, 0.68, 0.55)
    for ex in (cx - r * 0.4, cx + r * 0.4):
        eye = ((yy - (cy - r * 0.25)) / (r * 0.12)) ** 2 + ((xx - ex) / (r * 0.18)) ** 2 < 1
        img[eye] = (0.1, 0.1, 0.12)
    mouth = ((yy - (cy + r * 0.55)) / (r * 0.1)) ** 2 + ((xx - cx) / (r * 0.35)) ** 2 < 1
    img[mouth] = (0.55, 0.2, 0.2)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0, 1).transpose(2, 0, 1)[None]


def port_fidelity() -> dict:
    rng = np.random.default_rng(0)
    out = {}
    cases = {
        "detector": (rf.DETECTOR_ONNX, 256, {"image"}),
        "landmarks": (rf.LANDMARK_ONNX, 192, {"image"}),
    }
    for kind, (name, size, _inp) in cases.items():
        model = onnx_lite.load(os.path.join(rf.REF_ASSETS, name))
        fn, params = onnx_exec.build_jax_fn(model)
        jfn = jax.jit(fn)
        worst = {}
        for tag, img in (
            ("random", rng.random((1, 3, size, size), np.float32)),
            ("face", _face_like(size, rng)),
        ):
            ref = onnx_exec.run(model, {"image": img})
            got = {k: np.asarray(v) for k, v in jfn(params, image=img).items()}
            for k in ref:
                d = float(np.abs(got[k] - ref[k]).max())
                rel = d / (float(np.abs(ref[k]).max()) + 1e-12)
                cur = worst.get(k, (0.0, 0.0))
                worst[k] = (max(cur[0], d), max(cur[1], rel))
        out[kind] = {
            k: {"max_abs": v[0], "max_rel": v[1]} for k, v in worst.items()
        }
    return out


def decode_consistency(n: int = 16) -> dict:
    """Serving-path decode (letterbox + JAX anchors) vs independent numpy
    decode on the real detector outputs."""
    key = jax.random.PRNGKey(7)
    frames, gt_box, _ = synthetic_face_batch(key, n, SCENE_HW)
    frames = np.asarray(frames)

    model = onnx_lite.load(os.path.join(rf.REF_ASSETS, rf.DETECTOR_ONNX))

    # serving path: wrapper + best_box_decode (letterboxed)
    finder = rf.ReferenceFaceFinder()
    params = jax.device_put(finder.init_params())
    h, w = SCENE_HW
    _, dw, dh, off_x, off_y = letterbox_params(SCENE_HW, FD)
    small = ops.resize_bilinear(jnp.asarray(frames), (dh, dw), method="half_pixel")
    fd_in = jnp.pad(
        small, [(0, 0), (off_y, FD - dh - off_y), (off_x, FD - dw - off_x), (0, 0)]
    )
    det = finder.apply(params, fd_in)
    box_j, score_j, valid_j = ops.best_box_decode(
        det["box_coords"], det["box_scores"], SCENE_HW, FD, letterboxed=True
    )
    box_j, score_j = np.asarray(box_j), np.asarray(score_j)

    # independent numpy decode of the same graph outputs
    anchors = np.asarray(blazeface_anchors(FD))
    agree, ious, t_iou = [], [], []
    fd_np = np.asarray(fd_in)
    for i in range(n):
        o = onnx_exec.run(model, {"image": fd_np[i].transpose(2, 0, 1)[None]})
        logits = o["box_scores"][0, :, 0]
        raw = o["box_coords"][0]
        best = int(np.argmax(logits))
        dcx, dcy, bw, bh = raw[best][:4]
        cx = anchors[best, 0] + dcx / FD
        cy = anchors[best, 1] + dcy / FD
        x0, x1 = cx - bw / FD / 2, cx + bw / FD / 2
        y0, y1 = cy - bh / FD / 2, cy + bh / FD / 2
        # letterbox inverse -> scene px (frameProcessorTest.ts:434-446 role)
        sx, sy = dw / w, dh / h
        bx = np.array([
            (x0 * FD - off_x) / sx, (y0 * FD - off_y) / sy,
            (x1 * FD - off_x) / sx, (y1 * FD - off_y) / sy,
        ])
        bx = np.clip(bx, [0, 0, 0, 0], [w, h, w, h])
        jx = box_j[i]
        inter = max(0, min(bx[2], jx[2]) - max(bx[0], jx[0])) * max(
            0, min(bx[3], jx[3]) - max(bx[1], jx[1])
        )
        a1 = (bx[2] - bx[0]) * (bx[3] - bx[1])
        a2 = (jx[2] - jx[0]) * (jx[3] - jx[1])
        iou = inter / (a1 + a2 - inter + 1e-9)
        ious.append(float(iou))
        # teacher box vs scene ground truth
        g = np.asarray(gt_box[i])
        inter = max(0, min(bx[2], g[2]) - max(bx[0], g[0])) * max(
            0, min(bx[3], g[3]) - max(bx[1], g[1])
        )
        t_iou.append(float(inter / (a1 + (g[2] - g[0]) * (g[3] - g[1]) - inter + 1e-9)))
        # same best anchor?
        jscore = det["box_scores"][i]
        agree.append(int(np.argmax(np.asarray(jscore))) == best)
    return {
        "n_scenes": n,
        "best_anchor_agreement": float(np.mean(agree)),
        "box_iou_jax_vs_numpy_mean": float(np.mean(ious)),
        "box_iou_jax_vs_numpy_min": float(np.min(ious)),
        "teacher_box_vs_gt_iou_mean": float(np.mean(t_iou)),
    }


def blaze_nms(n: int = 4) -> dict:
    """blaze.onnx end-to-end: numpy oracle (true ONNX NMS) vs the JAX port
    (ops.detect.nms_padded) -- selected boxes row-for-row."""
    model = onnx_lite.load(os.path.join(rf.REF_ASSETS, rf.BLAZE_ONNX))
    fn, params = onnx_exec.build_jax_fn(model, nms_capacity=8)
    jfn = jax.jit(fn)
    rng = np.random.default_rng(3)
    rows_checked = 0
    max_abs = 0.0
    count_match = True
    for i in range(n):
        img = _face_like(128, rng) if i % 2 == 0 else rng.random(
            (1, 3, 128, 128), np.float32
        )
        feeds = {
            "image": img.astype(np.float32),
            # permissive thresholds so many anchors survive: exercises the
            # NMS suppression logic, not just the score gate
            "conf_threshold": np.asarray([0.05], np.float32),
            "max_detections": np.asarray([8], np.int64),
            "iou_threshold": np.asarray([0.5], np.float32),
        }
        ref = onnx_exec.run(model, feeds)["selectedBoxes"]
        if ref.ndim == 2:  # the [1,16] single-box collapse the JS handles
            ref = ref[None] if ref.shape[0] != 1 else ref.reshape(1, 1, 16)
        got = jfn(params, **feeds)
        sel = np.asarray(got["selectedBoxes"])
        # find the __valid mask emitted for the NMS node
        valid = None
        for k, v in got.items():
            if k.endswith("__valid"):
                valid = np.asarray(v)
        n_ref = ref.shape[1]
        if valid is not None:
            count_match &= int(valid.sum()) == n_ref
        take = min(n_ref, sel.shape[1])
        if take:
            max_abs = max(max_abs, float(np.abs(sel[0, :take] - ref[0, :take]).max()))
        rows_checked += take
    return {
        "rows_checked": rows_checked,
        "selected_count_match": bool(count_match),
        "max_abs_diff": max_abs,
    }


def student_vs_reference(n: int = 32) -> dict:
    """Fast serving models vs the real-weight teacher on held-out scenes."""
    from video_stream_segmenetation_tpu.utils.checkpoint import restore_params

    key = jax.random.PRNGKey(1234)
    frames, gt_box, gt_lmk = synthetic_face_batch(key, n, SCENE_HW)

    h, w = SCENE_HW
    _, dw, dh, off_x, off_y = letterbox_params(SCENE_HW, FD)
    small = ops.resize_bilinear(frames, (dh, dw), method="half_pixel")
    fd_in = jnp.pad(
        small, [(0, 0), (off_y, FD - dh - off_y), (off_x, FD - dw - off_x), (0, 0)]
    )

    def best_boxes(model, params):
        det = model.apply(params, fd_in)
        box, score, valid = ops.best_box_decode(
            det["box_coords"], det["box_scores"], SCENE_HW, FD, letterboxed=True
        )
        return np.asarray(box), np.asarray(score), np.asarray(valid)

    teacher = rf.ReferenceFaceFinder()
    t_params = jax.device_put(teacher.init_params())
    t_box, t_score, _ = best_boxes(teacher, t_params)

    student = models.FaceFinder(input_size=FD)
    s_params = restore_params(os.path.join(ROOT, "checkpoints", "facefinder"))
    s_box, s_score, _ = best_boxes(student, s_params)

    def iou(a, b):
        inter = np.maximum(
            0, np.minimum(a[:, 2], b[:, 2]) - np.maximum(a[:, 0], b[:, 0])
        ) * np.maximum(
            0, np.minimum(a[:, 3], b[:, 3]) - np.maximum(a[:, 1], b[:, 1])
        )
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa + ab - inter + 1e-9)

    g = np.asarray(gt_box)
    st_iou = iou(s_box, t_box)
    res = {
        "n_scenes": n,
        "detector": {
            "student_vs_teacher_iou_mean": float(st_iou.mean()),
            "student_vs_teacher_iou_median": float(np.median(st_iou)),
            "teacher_vs_gt_iou_mean": float(iou(t_box, g).mean()),
            "student_vs_gt_iou_mean": float(iou(s_box, g).mean()),
        },
    }

    # landmarks: both run on the TEACHER's ROI (same serving path)
    roi = pad_box(jnp.asarray(t_box), 0.25, SCENE_HW)
    crop = ops.crop_and_resize_mxu(frames, roi, (LMK, LMK))
    t_lmk_model = rf.ReferenceLandmarkNet()
    tl_params = jax.device_put(t_lmk_model.init_params())
    t_lmk = np.asarray(t_lmk_model.apply(tl_params, crop)["landmarks"])

    s_lmk_model = models.LandmarkNet()
    sl_params = restore_params(os.path.join(ROOT, "checkpoints", "landmarknet"))
    s_out = s_lmk_model.apply(sl_params, crop)
    s_lmk = np.asarray(s_out["landmarks"])

    rw = np.asarray(roi[:, 2] - roi[:, 0])[:, None]
    rh = np.asarray(roi[:, 3] - roi[:, 1])[:, None]
    d = np.sqrt(
        ((t_lmk[..., 0] - s_lmk[..., 0]) * rw) ** 2
        + ((t_lmk[..., 1] - s_lmk[..., 1]) * rh) ** 2
    )
    # five anchor landmarks the affine solve uses (frameProcessorTest.ts:518)
    anchor_ids = [33, 263, 1, 13, 14]
    res["landmarks"] = {
        "student_vs_teacher_px_mean": float(d.mean()),
        "student_vs_teacher_px_median": float(np.median(d)),
        "anchor5_px_mean": float(d[:, anchor_ids].mean()),
        "teacher_score_mean": float(
            np.asarray(t_lmk_model.apply(tl_params, crop)["scores"]).mean()
        ),
    }
    return res


def main() -> None:
    report = {
        "oracle": "reference shipped ONNX weights "
                  "(client/src/assets/*.onnx), parsed + executed directly",
        "notes": {
            "port_fidelity": "JAX serving port vs independent NumPy "
                             "executor of the same graphs: lossless import",
            "student_vs_reference": "the real-weight teacher was trained "
                                    "on real humans; on our synthetic "
                                    "scenes its own box-vs-gt IoU bounds "
                                    "what student-vs-teacher can reach "
                                    "(domain gap, not student error -- "
                                    "see student_vs_gt_iou_mean)",
        },
        "port_fidelity": port_fidelity(),
        "decode_consistency": decode_consistency(),
        "blaze_nms": blaze_nms(),
        "student_vs_reference": student_vs_reference(),
    }
    out = os.path.join(ROOT, "PARITY.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
