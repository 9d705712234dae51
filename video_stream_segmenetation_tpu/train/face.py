"""Face-model training: synthetic scenes with facial features.

The reference ships its face models as pretrained ONNX
(MediaPipeFaceDetector / FaceLandmarkDetector, SURVEY.md §2.7); a
standalone framework must be able to produce equivalent weights.  The
synthetic matting scenes (train/loop.py) already carry a head ellipse;
here the generator additionally draws facial features (eyes, mouth) at
canonical template positions and returns their geometry, giving exact
ground truth for:

* the detector (head bounding box -> anchor cls + box regression), and
* the 468-landmark regressor (a fixed canonical template mapped onto the
  head ellipse -- the pipeline consumes exactly 5 of these anchors for
  its Procrustes similarity solve, frameProcessorTest.ts:518).

Training runs at the serving distribution: detector inputs are the
letterboxed guide-resolution frames, landmark inputs are padded ROI crops
(matching runtime/pipeline.py::_face_subpath geometry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu.models.facemesh import NUM_LANDMARKS

# the 5 Procrustes anchor ids and their positions in head-ellipse units
# (u = (x-cx)/hr, v = (y-hy)/(1.25*hr)); eyes/nose/lips per the
# reference's anchor choice (frameProcessorTest.ts:518)
ANCHOR_IDS = (33, 263, 1, 13, 14)
ANCHOR_UV = (
    (-0.42, -0.22),  # 33  left eye
    (0.42, -0.22),   # 263 right eye
    (0.0, 0.12),     # 1   nose tip
    (0.0, 0.42),     # 13  upper inner lip
    (0.0, 0.52),     # 14  lower inner lip
)


@functools.lru_cache(maxsize=1)
def face_template_468() -> np.ndarray:
    """[468, 2] canonical landmark layout in head-ellipse units: concentric
    rings filling the face disc, with the 5 Procrustes anchors pinned."""
    rng = np.random.default_rng(468)
    pts = []
    n_rings = 9
    per_ring = NUM_LANDMARKS // n_rings
    for r in range(n_rings):
        rad = 0.15 + 0.8 * (r + 1) / n_rings
        for k in range(per_ring):
            th = 2 * np.pi * (k + 0.5 * (r % 2)) / per_ring
            pts.append((rad * np.cos(th), rad * np.sin(th)))
    while len(pts) < NUM_LANDMARKS:
        pts.append(tuple(rng.uniform(-0.5, 0.5, 2)))
    tpl = np.asarray(pts[:NUM_LANDMARKS], np.float32)
    for i, uv in zip(ANCHOR_IDS, ANCHOR_UV):
        tpl[i] = uv
    return tpl


def synthetic_face_batch(key, batch: int, hw: tuple[int, int], return_parts=False):
    """Matting-style scenes + facial features + face geometry.

    Returns (frame [B,H,W,3] 0..1, box [B,4] px = head bbox,
    landmarks [B,468,2] px); with ``return_parts`` also a dict of scene
    components {a_body, a_head, feat} (each [B,H,W]) -- the ground truth
    for multi-class segmentation training (BASELINE config 5).
    """
    h, w = hw
    ks = jax.random.split(key, 14)
    cx = jax.random.uniform(ks[0], (batch, 1, 1), minval=0.25 * w, maxval=0.75 * w)
    cy = jax.random.uniform(ks[1], (batch, 1, 1), minval=0.45 * h, maxval=0.85 * h)
    rx = jax.random.uniform(ks[2], (batch, 1, 1), minval=0.12 * w, maxval=0.28 * w)
    ry = jax.random.uniform(ks[3], (batch, 1, 1), minval=0.28 * h, maxval=0.5 * h)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    edge = jax.random.uniform(ks[4], (batch, 1, 1), minval=0.05, maxval=0.2)
    d_body = jnp.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    a_body = jnp.clip((1.05 - d_body) / edge, 0.0, 1.0)
    hy = cy - ry * jax.random.uniform(ks[5], (batch, 1, 1), minval=0.9, maxval=1.2)
    hr = rx * jax.random.uniform(ks[6], (batch, 1, 1), minval=0.35, maxval=0.55)
    d_head = jnp.sqrt(((xx - cx) / hr) ** 2 + ((yy - hy) / (hr * 1.25)) ** 2)
    a_head = jnp.clip((1.05 - d_head) / edge, 0.0, 1.0)
    alpha = jnp.maximum(a_body, a_head)

    fg_color = jax.random.uniform(ks[7], (batch, 1, 1, 3), minval=0.25, maxval=0.9)
    fg_tex = jax.random.uniform(ks[8], (batch, h, w, 3), minval=-0.15, maxval=0.15)
    bg_base = jax.random.uniform(ks[9], (batch, 1, 1, 3), minval=0.0, maxval=0.5)
    bg_tex = jax.random.uniform(ks[10], (batch, h, w, 3)) * jax.random.uniform(
        ks[10], (batch, 1, 1, 1), minval=0.1, maxval=0.4
    )
    noise = jax.random.normal(ks[11], (batch, h, w, 3)) * 0.02
    fg = fg_color + fg_tex

    # facial features: dark ellipses at the anchor template positions
    def feature(u, v, fr_u, fr_v):
        fx = cx + u * hr
        fy = hy + v * (1.25 * hr)
        d = jnp.sqrt(((xx - fx) / (fr_u * hr)) ** 2 + ((yy - fy) / (fr_v * hr)) ** 2)
        return jnp.clip(1.2 - d, 0.0, 1.0)

    eyes = feature(-0.42, -0.22, 0.16, 0.10) + feature(0.42, -0.22, 0.16, 0.10)
    mouth = feature(0.0, 0.47, 0.34, 0.12)
    nose = feature(0.0, 0.12, 0.09, 0.14)
    dark = jnp.clip(eyes + mouth + 0.6 * nose, 0.0, 1.0)
    feat_strength = jax.random.uniform(ks[12], (batch, 1, 1), minval=0.45, maxval=0.75)
    fg = fg * (1.0 - (dark * feat_strength)[..., None])

    bg = bg_base + bg_tex
    frame = jnp.clip(fg * alpha[..., None] + bg * (1 - alpha[..., None]) + noise, 0, 1)

    box = jnp.concatenate(
        [cx - hr, hy - 1.25 * hr, cx + hr, hy + 1.25 * hr], axis=-1
    ).reshape(batch, 4)
    tpl = jnp.asarray(face_template_468())  # [468, 2] ellipse units
    lm_x = cx.reshape(batch, 1) + tpl[None, :, 0] * hr.reshape(batch, 1)
    lm_y = hy.reshape(batch, 1) + tpl[None, :, 1] * (1.25 * hr).reshape(batch, 1)
    landmarks = jnp.stack([lm_x, lm_y], axis=-1)  # [B, 468, 2] px
    if return_parts:
        return frame, box, landmarks, {
            "a_body": a_body, "a_head": a_head, "feat": dark,
        }
    return frame, box, landmarks


# ---- losses ---------------------------------------------------------------

def detector_loss(out: dict, gt_box_norm: jnp.ndarray, anchors: jnp.ndarray):
    """Anchor cls BCE + corner L1 on positive anchors.

    out: FaceFinder dict (decoded normalized corners + sigmoid scores).
    gt_box_norm: [B,4] normalized corners.  anchors: [A,2] normalized
    centers.  Positives = anchors whose center lies inside the gt box.
    """
    scores = out["box_scores"]  # [B, A] sigmoid
    coords = out["box_coords"][..., :4]  # [B, A, 4]
    ax, ay = anchors[:, 0], anchors[:, 1]
    inside = (
        (ax[None] >= gt_box_norm[:, None, 0])
        & (ax[None] <= gt_box_norm[:, None, 2])
        & (ay[None] >= gt_box_norm[:, None, 1])
        & (ay[None] <= gt_box_norm[:, None, 3])
    )
    pos = inside.astype(jnp.float32)
    eps = 1e-6
    p = jnp.clip(scores, eps, 1 - eps)
    bce = -(pos * jnp.log(p) + (1 - pos) * jnp.log(1 - p))
    # balance: positives are ~2% of 896 anchors
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum((1 - pos).sum(), 1.0)
    cls_loss = (bce * pos).sum() / n_pos + (bce * (1 - pos)).sum() / n_neg
    box_l1 = jnp.abs(coords - gt_box_norm[:, None, :])
    box_loss = (box_l1.mean(-1) * pos).sum() / n_pos
    return cls_loss + 5.0 * box_loss, {
        "cls": cls_loss, "box": box_loss,
        "pos_frac": pos.mean(),
    }


def landmark_loss(out: dict, gt_lm_roi: jnp.ndarray, is_face: jnp.ndarray):
    """L1 on ROI-normalized xy (faces only) + presence-score BCE."""
    lm = out["landmarks"][..., :2]  # [B, 468, 2] in [0,1]
    score = out["scores"]
    l1 = jnp.abs(lm - gt_lm_roi).mean(axis=(-2, -1))  # [B]
    facef = is_face.astype(jnp.float32)
    lm_loss = (l1 * facef).sum() / jnp.maximum(facef.sum(), 1.0)
    eps = 1e-6
    p = jnp.clip(score, eps, 1 - eps)
    s_loss = -(facef * jnp.log(p) + (1 - facef) * jnp.log(1 - p)).mean()
    return 10.0 * lm_loss + s_loss, {"lm_l1": lm_loss, "score_bce": s_loss}
