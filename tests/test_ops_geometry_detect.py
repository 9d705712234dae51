"""Golden tests: Procrustes solve, letterboxing, box ops, NMS, decode."""

import math

import numpy as np

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.ops import geometry
from tests import oracles


def test_procrustes_matches_oracle(rng):
    ref = np.array(
        [(x * 640, y * 480) for x, y in geometry.REF_NORM], dtype=np.float64
    )
    # synth destination: rotate+scale+translate the reference, plus noise
    theta, s, t = 0.2, 1.3, np.array([25.0, -10.0])
    R = np.array([[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]])
    dst = (ref @ R.T) * s + t + rng.normal(0, 0.5, ref.shape)
    expect = oracles.procrustes_oracle(dst, ref)
    got = np.asarray(
        geometry.estimate_similarity_transform(jnp.asarray(dst), jnp.asarray(ref))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-3)


def test_procrustes_recovers_exact_similarity():
    ref = np.array([(x * 640, y * 480) for x, y in geometry.REF_NORM])
    theta, s = -0.35, 0.8
    R = np.array([[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]])
    dst = (ref @ R.T) * s + [100.0, 50.0]
    a = np.asarray(geometry.estimate_similarity_transform(jnp.asarray(dst), jnp.asarray(ref)))
    np.testing.assert_allclose(a[0], s * math.cos(theta), rtol=1e-5)
    np.testing.assert_allclose(a[1], -s * math.sin(theta), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a[2], 100.0, atol=1e-3)
    np.testing.assert_allclose(a[5], 50.0, atol=1e-3)


def test_affine_video_to_mask_reference_mode():
    aff = jnp.asarray([1.1, 0.2, 100.0, -0.2, 1.1, 50.0])
    got = np.asarray(
        geometry.affine_video_to_mask(aff, (720, 1280), (288, 512), mode="reference")
    )
    sx, sy = 512 / 1280, 288 / 720
    np.testing.assert_allclose(got, [1.1, 0.2, 100.0 * sx, -0.2, 1.1, 50.0 * sy], rtol=1e-6)


def test_affine_video_to_mask_exact_mode_conjugation():
    """exact mode must equal S A S^-1 acting on mask coords."""
    aff = np.array([1.05, 0.1, 20.0, -0.1, 1.05, 10.0])
    vh, vw, mh, mw = 720, 1280, 288, 512
    sx, sy = mw / vw, mh / vh
    m = np.asarray(
        geometry.affine_video_to_mask(jnp.asarray(aff), (vh, vw), (mh, mw), mode="exact")
    )
    # pick a mask point, map through both routes
    pm = np.array([100.0, 60.0])
    pv = pm / [sx, sy]
    pv2 = np.array(
        [aff[0] * pv[0] + aff[1] * pv[1] + aff[2], aff[3] * pv[0] + aff[4] * pv[1] + aff[5]]
    )
    expect = pv2 * [sx, sy]
    got = np.array(
        [m[0] * pm[0] + m[1] * pm[1] + m[2], m[3] * pm[0] + m[4] * pm[1] + m[5]]
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_affine_from_landmarks_shapes(rng):
    pts = rng.random((468, 2)).astype(np.float32) * [1280, 720]
    aff = geometry.affine_from_landmarks(jnp.asarray(pts), (720, 1280), (288, 512))
    assert aff.shape == (6,)
    batched = geometry.affine_from_landmarks(
        jnp.asarray(np.stack([pts, pts])), (720, 1280), (288, 512)
    )
    assert batched.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(batched)[0], np.asarray(aff), rtol=1e-5)


def test_letterbox_params_matches_js():
    # toSquareLetterbox semantics (frameProcessorTest.ts:613-642)
    scale, dw, dh, ox, oy = geometry.letterbox_params((720, 1280), 256)
    assert scale == 256 / 1280
    assert dw == 256 and dh == round(720 * 256 / 1280)
    assert ox == 0 and oy == (256 - dh) // 2
    pts = jnp.asarray([[128.0, 128.0]])
    back = np.asarray(geometry.letterbox_inverse_map(pts, (720, 1280), 256))[0]
    np.testing.assert_allclose(back[0], (128.0 - ox) / scale)
    np.testing.assert_allclose(back[1], (128.0 - oy) / scale)


def test_pad_box_matches_crop_face_roi():
    # cropFaceROI with pad 0.25 (frameProcessorTest.ts:451-460)
    box = jnp.asarray([100.0, 80.0, 300.0, 280.0])
    got = np.asarray(geometry.pad_box(box, 0.25, (720, 1280)))
    bw, bh = 200.0, 200.0
    np.testing.assert_allclose(
        got,
        [
            math.floor(100 - bw * 0.25),
            math.floor(80 - bh * 0.25),
            math.ceil(300 + bw * 0.25),
            math.ceil(280 + bh * 0.25),
        ],
    )


def test_pad_box_clamps():
    box = jnp.asarray([5.0, 2.0, 1275.0, 715.0])
    got = np.asarray(geometry.pad_box(box, 0.25, (720, 1280)))
    assert got[0] == 0 and got[1] == 0
    assert got[2] == 1280 and got[3] == 720


def test_best_box_decode_plain_resize():
    coords = np.zeros((896, 16), dtype=np.float32)
    scores = np.zeros((896,), dtype=np.float32)
    coords[42, :4] = [0.25, 0.25, 0.75, 0.75]
    scores[42] = 0.9
    box, score, valid = ops.best_box_decode(
        jnp.asarray(coords), jnp.asarray(scores), (720, 1280), letterboxed=False
    )
    assert bool(valid)
    np.testing.assert_allclose(float(score), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(box), [320, 180, 960, 540], rtol=1e-5)


def test_best_box_decode_letterboxed():
    coords = np.zeros((896, 16), dtype=np.float32)
    scores = np.zeros((896,), dtype=np.float32)
    coords[0, :4] = [0.25, 0.4, 0.75, 0.6]
    scores[0] = 0.8
    box, score, valid = ops.best_box_decode(
        jnp.asarray(coords), jnp.asarray(scores), (720, 1280), letterboxed=True
    )
    scale, _, _, ox, oy = geometry.letterbox_params((720, 1280), 256)
    expect = [
        (0.25 * 256 - ox) / scale,
        (0.4 * 256 - oy) / scale,
        (0.75 * 256 - ox) / scale,
        (0.6 * 256 - oy) / scale,
    ]
    np.testing.assert_allclose(np.asarray(box), expect, rtol=1e-5)
    assert bool(valid)


def test_best_box_decode_invalid_when_degenerate():
    coords = np.zeros((10, 16), dtype=np.float32)
    scores = np.full((10,), 0.1, dtype=np.float32)
    scores[3] = 0.99  # zero-size box at argmax
    _, _, valid = ops.best_box_decode(
        jnp.asarray(coords), jnp.asarray(scores), (720, 1280), letterboxed=False
    )
    assert not bool(valid)


def test_box_iou():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(ops.box_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-6)
    assert iou[0, 1] == 0.0


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],  # overlaps box 0
            [20, 20, 30, 30],
            [50, 50, 60, 60],
        ],
        dtype=np.float32,
    )
    scores = np.array([0.9, 0.85, 0.8, 0.3], dtype=np.float32)
    out_b, out_s, out_v = ops.nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, 0.5, max_detections=5
    )
    v = np.asarray(out_v)
    assert v.sum() == 2  # box1 suppressed by box0; box3 below conf
    np.testing.assert_allclose(np.asarray(out_b)[0], boxes[0])
    np.testing.assert_allclose(np.asarray(out_b)[1], boxes[2])
    assert np.asarray(out_s)[0] == np.float32(0.9)


def test_blazeface_anchor_count():
    a = ops.blazeface_anchors(256)
    assert a.shape == (896, 2)
    # 16*16*2 + 8*8*6 = 512 + 384
    assert (a[:512] == a[:512]).all()


def test_decode_anchor_boxes_center_offsets():
    from video_stream_segmenetation_tpu.ops.detect import decode_anchor_boxes

    anchors = jnp.asarray(ops.blazeface_anchors(256))
    raw = np.zeros((896, 16), dtype=np.float32)
    raw[0, :4] = [0.0, 0.0, 64.0, 64.0]  # 64px box at anchor 0 center
    out = np.asarray(decode_anchor_boxes(jnp.asarray(raw), anchors))
    cx, cy = np.asarray(anchors)[0]
    np.testing.assert_allclose(
        out[0, :4], [cx - 0.125, cy - 0.125, cx + 0.125, cy + 0.125], rtol=1e-5
    )


def test_affine_video_to_mask_reference_mode_similarity_form():
    """Pin mode='reference' against the literal JS construction
    (frameProcessorTest.ts:570-600): A = [s cosT, -s sinT; s sinT,
    s cosT], only tx/ty scaled by (maskW/videoW, maskH/videoH) -- the
    bug-compat path parity runs will need."""
    import math

    s, theta, tx, ty = 1.07, 0.15, 37.5, -12.25
    a11 = s * math.cos(theta)
    a12 = -s * math.sin(theta)
    a21 = s * math.sin(theta)
    a22 = s * math.cos(theta)
    vh, vw, mh, mw = 720, 1280, 288, 512
    got = np.asarray(
        geometry.affine_video_to_mask(
            jnp.asarray([a11, a12, tx, a21, a22, ty]),
            (vh, vw), (mh, mw), mode="reference",
        )
    )
    # the JS returns {a11_v, a12_v, tx*sx, a21_v, a22_v, ty*sy} verbatim
    want = [a11, a12, tx * (mw / vw), a21, a22, ty * (mh / vh)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
