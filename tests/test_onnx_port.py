"""ONNX weight import: parser, executors, and the reference face wrappers.

The reference ships its face models as ONNX binaries (SURVEY.md §2.7);
utils/onnx_lite.py + utils/onnx_exec.py import and execute them without
the onnx package.  These tests pin the machinery using the cached
checkpoints (checkpoints/face_ref/, committed by
tools/import_reference_weights.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models import reference_face as rf
from video_stream_segmenetation_tpu.utils import onnx_exec, onnx_lite

CKPT = rf.CKPT_DIR
HAVE_ASSETS = os.path.exists(os.path.join(CKPT, rf.LANDMARK_ONNX))

pytestmark = pytest.mark.skipif(
    not HAVE_ASSETS, reason="reference face weights not imported"
)


def test_parse_contracts():
    """Graph I/O must match the contracts documented in the reference
    (client/src/core/model.ts:32-34, frameProcessor.ts:270-291)."""
    det = onnx_lite.load(os.path.join(CKPT, rf.DETECTOR_ONNX))
    assert det.graph.inputs == [("image", (1, 3, 256, 256))]
    assert set(det.graph.outputs) == {"box_coords", "box_scores"}

    blaze = onnx_lite.load(os.path.join(CKPT, rf.BLAZE_ONNX))
    names = [n for n, _ in blaze.graph.inputs]
    assert names == ["image", "conf_threshold", "max_detections", "iou_threshold"]
    assert blaze.graph.outputs == ["selectedBoxes"]
    assert any(n.op_type == "NonMaxSuppression" for n in blaze.graph.nodes)


def test_jax_port_matches_numpy_oracle():
    """build_jax_fn (serving) vs run (oracle) on the landmark model."""
    m = onnx_lite.load(os.path.join(CKPT, rf.LANDMARK_ONNX))
    rng = np.random.default_rng(0)
    img = rng.random((1, 3, 192, 192), np.float32)
    ref = onnx_exec.run(m, {"image": img})
    fn, params = onnx_exec.build_jax_fn(m)
    got = jax.jit(fn)(params, image=img)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), ref[k], rtol=1e-4, atol=1e-5
        )


def test_nms_padded_matches_onnx_nms():
    """ops.detect.nms_padded (static shapes) == ONNX greedy NMS."""
    from video_stream_segmenetation_tpu.ops.detect import nms_padded

    rng = np.random.default_rng(1)
    n = 40
    centers = rng.random((n, 2)).astype(np.float32)
    sizes = (rng.random((n, 2)) * 0.3 + 0.05).astype(np.float32)
    boxes = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=1
    ).astype(np.float32)
    scores = rng.random(n).astype(np.float32)

    sel = onnx_exec._np_nms(
        boxes[None], scores[None, None], 10, 0.4, 0.3, center_box=0
    )
    idx, valid = jax.jit(
        lambda b, s: nms_padded(b, s, 10, 0.4, 0.3)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    kept = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(kept, sel[:, 2])


def test_reference_wrappers_shapes():
    """Wrapper contracts match the fast serving models' (blazeface.py /
    facemesh.py) so the engine can swap them in."""
    finder = rf.ReferenceFaceFinder()
    p = finder.init_params()
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    out = finder.apply(p, x)
    assert out["box_coords"].shape == (2, 896, 16)
    assert out["box_scores"].shape == (2, 896)
    s = np.asarray(out["box_scores"])
    assert (s >= 0).all() and (s <= 1).all()  # sigmoid probabilities

    lmk = rf.ReferenceLandmarkNet()
    lp = lmk.init_params()
    out = lmk.apply(lp, jnp.zeros((2, 192, 192, 3), jnp.float32))
    assert out["landmarks"].shape == (2, 468, 3)
    assert out["scores"].shape == (2,)


def test_varint_parser_roundtrip():
    """Wire-format primitives on a handcrafted message."""
    # field 1 varint 300, field 2 length-delimited b"abc"
    msg = bytes([0x08, 0xAC, 0x02, 0x12, 0x03]) + b"abc"
    fields = list(onnx_lite._iter_fields(msg))
    assert fields[0] == (1, 0, 300)
    assert fields[1] == (2, 2, b"abc")


def _mk_model(nodes, inits, inputs, outputs):
    g = onnx_lite.Graph(nodes=nodes, initializers=inits, inputs=inputs,
                        outputs=outputs, name="t")
    return onnx_lite.Model(g, opset=13)


def _attr(**kw):
    out = {}
    for k, v in kw.items():
        a = onnx_lite.Attr(name=k)
        if isinstance(v, bytes):
            a.s = v
        elif isinstance(v, float):
            a.f = v
        elif isinstance(v, int):
            a.i = v
        elif isinstance(v, (list, tuple)):
            if all(isinstance(x, int) for x in v):
                a.ints = list(v)
            else:
                a.floats = list(v)
        out[k] = a
    return out


MATTING_OPS = [
    # (node, extra initializers) -- each op the MODNet/U2Net/RVM-class
    # float exports use beyond the face-model op set (SURVEY.md §2.7)
    ("Sub", {}, "binary"),
    ("Tanh", {}, {}),
    ("Sqrt", {}, {}),
    ("LeakyRelu", _attr(alpha=0.1), {}),
    ("HardSigmoid", {}, {}),
    ("HardSwish", {}, {}),
    ("Softmax", _attr(axis=1), {}),
    ("GlobalAveragePool", {}, {}),
    ("BatchNormalization", {}, "bn"),
    ("AveragePool", _attr(kernel_shape=[3, 3], strides=[2, 2],
                          pads=[1, 1, 1, 1]), {}),
    ("ReduceMean", _attr(axes=[2, 3], keepdims=1), {}),
    ("Resize", _attr(mode=b"linear",
                     coordinate_transformation_mode=b"half_pixel"), "resize"),
    ("Resize", _attr(mode=b"nearest",
                     coordinate_transformation_mode=b"asymmetric",
                     nearest_mode=b"floor"), "resize"),
    ("Resize", _attr(mode=b"linear",
                     coordinate_transformation_mode=b"align_corners"),
     "resize"),
    ("Split", _attr(axis=1, split=[2, 3]), {}),
]


@pytest.mark.parametrize("op,attrs,extra", MATTING_OPS)
def test_matting_op_jax_matches_numpy(op, attrs, extra, rng):
    x = rng.random((2, 5, 8, 10)).astype(np.float32) * 2 - 1
    inputs = ["x"]
    inits = {}
    if extra == "binary":
        inits = {"y2nd": rng.random((2, 5, 8, 10)).astype(np.float32)}
        inputs = ["x", "y2nd"]
    elif extra == "bn":
        inits = {
            "sc": rng.random(5).astype(np.float32) + 0.5,
            "b": rng.random(5).astype(np.float32),
            "mu": rng.random(5).astype(np.float32),
            "va": rng.random(5).astype(np.float32) + 0.1,
        }
        inputs = ["x", "sc", "b", "mu", "va"]
    elif extra == "resize":
        inits = {
            "roi": np.zeros(0, np.float32),
            "scales": np.zeros(0, np.float32),
            "sizes": np.asarray([2, 5, 13, 7], np.int64),
        }
        inputs = ["x", "roi", "scales", "sizes"]
    n_out = 2 if op == "Split" else 1
    outs = [f"y{k}" for k in range(n_out)]
    node = onnx_lite.Node(op_type=op, inputs=inputs, outputs=outs,
                          attrs=attrs, name=op)
    model = _mk_model([node], inits, [("x", x.shape)], outs)

    want = onnx_exec.run(model, {"x": x})
    fn, params = onnx_exec.build_jax_fn(model)
    got = jax.jit(lambda p, x: fn(p, x=x))(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)
    )
    for o in outs:
        np.testing.assert_allclose(
            np.asarray(got[o]), want[o], rtol=2e-5, atol=2e-5
        )


def test_refface_preset_serves_reference_weights(rng):
    """The fast stack serving the reference's real face weights via the
    statics flag (preset 'fast_int8_pico_refface' -> face_models=
    'reference'): the Engine swaps the ONNX-graph models in at build and
    serves through the production s2d/int8 path (VERDICT r4 #6)."""
    import dataclasses

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service.engine import Engine

    statics = dataclasses.replace(
        preset("fast_int8_pico_refface"),
        frame_hw=(80, 160), mask_hw=(32, 64), background="color",
    )
    assert statics.fd_size == 256 and statics.lmk_size == 192
    eng = Engine(num_streams=2, statics=statics, rng_seed=0,
                 donate_state=False)
    assert type(eng.bundle.face_model).__name__ == "ReferenceFaceFinder"
    assert type(eng.bundle.lmk_model).__name__ == "ReferenceLandmarkNet"
    eng.admit(); eng.admit()
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    for _ in range(2):
        out = eng.process(frames)
    assert out["metrics"]["health"]["state"] == "ok"
    assert out["alpha"].shape == (2, 32, 64)


def test_engine_reference_face_swap_lifecycle():
    """use_reference_face_models keeps the bundle/_raw_face consistent:
    the swap validates fd/lmk sizes, serves without degradation, and a
    later load_face_params reinstalls the fast model classes (round-2
    ADVICE engine.py:250)."""
    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.runtime.config import PipelineStatics
    from video_stream_segmenetation_tpu.service.engine import Engine

    frame = np.random.default_rng(0).integers(
        0, 255, (1, 144, 256, 3)
    ).astype(np.uint8)

    # mismatched sizes must raise, leaving the engine serving
    bad = Engine(1, statics=PipelineStatics(
        frame_hw=(144, 256), mask_hw=(72, 128), fd_size=64, lmk_size=48))
    bad.admit()
    with pytest.raises(ValueError, match="fd_size=256"):
        bad.use_reference_face_models()
    bad.process(frame)
    assert bad.health.state.name == "OK"

    eng = Engine(1, statics=PipelineStatics(
        frame_hw=(144, 256), mask_hw=(72, 128), fd_size=256, lmk_size=192))
    eng.admit()
    eng.use_reference_face_models()
    assert type(eng._raw_face[0]).__name__ == "ReferenceFaceFinder"
    eng.process(frame)
    assert eng.health.state.name == "OK"

    # restoring fast checkpoints over the swap reinstalls fast classes
    fd_ck = os.path.join(os.path.dirname(CKPT), "facefinder")
    if not os.path.isdir(fd_ck):
        pytest.skip("fast face checkpoint missing")
    eng.load_face_params(fd_ck)
    assert isinstance(eng.bundle.face_model, models.FaceFinder)
    assert isinstance(eng._raw_face[0], models.FaceFinder)
    eng.process(frame)
    assert eng.health.state.name == "OK"
