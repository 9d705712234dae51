"""Face-model training pieces (train/face.py + tools/train_face.py):
synthetic scenes carry exact box/landmark ground truth; losses decrease
and the geometry round-trips."""

import numpy as np

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops
from video_stream_segmenetation_tpu.ops.detect import blazeface_anchors
from video_stream_segmenetation_tpu.train.face import (
    ANCHOR_IDS,
    ANCHOR_UV,
    detector_loss,
    face_template_468,
    landmark_loss,
    synthetic_face_batch,
)

HW = (96, 160)


def test_face_batch_geometry(rng):
    """Landmarks must sit inside the head box; anchors at their template
    positions."""
    frames, box, lm = synthetic_face_batch(jax.random.PRNGKey(0), 4, HW)
    box = np.asarray(box)
    lm = np.asarray(lm)
    assert frames.shape == (4, *HW, 3)
    # the 5 Procrustes anchors lie within the head box
    for i, (u, v) in zip(ANCHOR_IDS, ANCHOR_UV):
        assert (lm[:, i, 0] >= box[:, 0] - 1).all()
        assert (lm[:, i, 0] <= box[:, 2] + 1).all()
        assert (lm[:, i, 1] >= box[:, 1] - 1).all()
        assert (lm[:, i, 1] <= box[:, 3] + 1).all()
    tpl = face_template_468()
    for i, uv in zip(ANCHOR_IDS, ANCHOR_UV):
        np.testing.assert_allclose(tpl[i], uv)


def test_detector_loss_prefers_correct_boxes():
    """Loss must be lower for predictions matching the gt than for junk."""
    anchors = jnp.asarray(blazeface_anchors(64))
    gt = jnp.asarray([[0.3, 0.3, 0.7, 0.7]], jnp.float32)
    a = anchors[None]
    inside = (
        (a[..., 0] >= 0.3) & (a[..., 0] <= 0.7)
        & (a[..., 1] >= 0.3) & (a[..., 1] <= 0.7)
    )
    good = {
        "box_scores": jnp.where(inside, 0.95, 0.05),
        "box_coords": jnp.broadcast_to(
            jnp.concatenate([gt[0], jnp.zeros(12)]), (1, a.shape[1], 16)
        ),
    }
    bad = {
        "box_scores": jnp.where(inside, 0.05, 0.95),
        "box_coords": jnp.zeros((1, a.shape[1], 16)),
    }
    lg, _ = detector_loss(good, gt, anchors)
    lb, _ = detector_loss(bad, gt, anchors)
    assert float(lg) < float(lb)


def test_landmark_loss_shape_and_direction():
    gt = jnp.full((2, 468, 2), 0.5)
    good = {"landmarks": jnp.concatenate([gt, jnp.zeros((2, 468, 1))], -1),
            "scores": jnp.asarray([0.9, 0.9])}
    bad = {"landmarks": jnp.zeros((2, 468, 3)), "scores": jnp.asarray([0.1, 0.1])}
    is_face = jnp.asarray([True, True])
    lg, _ = landmark_loss(good, gt, is_face)
    lb, _ = landmark_loss(bad, gt, is_face)
    assert float(lg) < float(lb)


def test_face_models_forward_contract(rng):
    """Redesigned dense trunks keep the reference I/O contract
    (box_coords [S,896,16] + box_scores [S,896] at 256; landmarks
    [S,468,3] + scores [S])."""
    fd = models.FaceFinder(input_size=256)
    p = fd.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    out = fd.apply(p, jnp.zeros((2, 256, 256, 3)))
    assert out["box_coords"].shape == (2, 896, 16)
    assert out["box_scores"].shape == (2, 896)

    lmk = models.LandmarkNet()
    p2 = lmk.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)))
    out2 = lmk.apply(p2, jnp.zeros((2, 192, 192, 3)))
    assert out2["landmarks"].shape == (2, 468, 3)
    assert out2["scores"].shape == (2,)
