"""int8 serving graphs for the face subpath (FaceFinder / LandmarkNet).

The reference serves its face models as pretrained quantizable ONNX
(MediaPipeFaceDetector.onnx / MediaPipeFaceLandmarkDetector.onnx,
client/src/core/model.ts:32-34, frameProcessorTest.ts:477-497); here the
fast dense-conv serving models (models/blazeface.py, models/facemesh.py)
get the same static-int8 treatment as the flagship trunk
(models/quantized.py): BN folds into per-output-channel int8 weights,
every activation is a relu6 output so requantization is the constant
6/127 lattice, and the convs run on the MXU s8 x s8 -> s32 path.

Input quantization is symmetric on a 1/127 lattice (x in [0,1] ->
round(x*127)): zero-point 0 keeps SAME-padding zeros exact, and the
~7-bit input granularity is below the box/landmark regression noise
floor (parity pinned in tests/test_quantized_face.py).

The heads stay int8-in / f32-logit-out (per-output-channel weights);
LandmarkNet's pooled Dense head stays float (one tiny [256, 1405]
matmul whose logits need the dynamic range).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu.models.quantized import (
    ACT_SCALE,
    _conv_i8,
    _qconvbn,
    _quant_w,
    _requant,
)

IN_SCALE = 1.0 / 127.0  # [0,1] input lattice


def _quant_input(x):
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 127.0).astype(jnp.int8)


def _qhead(p, name):
    """Biased head conv (nn.Conv) -> int8 weights + f32 epilogue."""
    k = np.asarray(p[name]["kernel"], np.float64)
    wq, sw = _quant_w(k)
    return {
        "wq": jnp.asarray(wq),
        "mult": jnp.asarray((ACT_SCALE * sw).astype(np.float32)),
        "bias": jnp.asarray(np.asarray(p[name]["bias"], np.float32)),
    }


# ---- FaceFinder ---------------------------------------------------------

# (layer name, strides) in models/blazeface.py call order
_FF_TRUNK = (
    ("ConvBN_0", (2, 2)),
    ("ConvBN_1", (2, 2)),
    ("ConvBN_2", (1, 1)),
    ("ConvBN_3", (2, 2)),
    ("ConvBN_4", (1, 1)),
    ("ConvBN_5", (2, 2)),  # -> f16
    ("ConvBN_6", (1, 1)),  # f16
    ("ConvBN_7", (2, 2)),  # -> f32
    ("ConvBN_8", (1, 1)),  # f32
)


def quantize_face_finder(model, params):
    """Trained FaceFinder flax params -> int8 serving qparams."""
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    st = jax.tree_util.tree_map(np.asarray, params["batch_stats"])
    q = {}
    for i, (nm, _) in enumerate(_FF_TRUNK):
        q[nm] = _qconvbn(p, (nm,), st, IN_SCALE if i == 0 else ACT_SCALE)
    # heads in call order: raw16, cls16, raw32, cls32
    for nm in ("Conv_0", "Conv_1", "Conv_2", "Conv_3"):
        q[nm] = _qhead(p, nm)
    return q


class QuantizedFaceFinder:
    """Bundle-compatible int8 FaceFinder (apply(q, x) -> dict).

    Mirrors models/blazeface.py::FaceFinder exactly (same anchor grid,
    decode, and sigmoid scores) with the conv stack on the s8 MXU path.
    """

    def __init__(self, input_size: int = 256):
        self.input_size = input_size

    def apply(self, q, x, train: bool = False):
        from video_stream_segmenetation_tpu.ops.detect import (
            blazeface_anchors,
            decode_anchor_boxes,
        )

        x = _quant_input(x)
        feats = {}
        for nm, strides in _FF_TRUNK:
            x = _requant(_conv_i8(x, q[nm], strides=strides))
            if nm == "ConvBN_6":
                feats["f16"] = x
        feats["f32"] = x

        def head(feat, raw_nm, cls_nm):
            raw = _conv_i8(feat, q[raw_nm])
            cls = _conv_i8(feat, q[cls_nm])
            s = feat.shape[0]
            return raw.reshape(s, -1, 16), cls.reshape(s, -1)

        raw16, cls16 = head(feats["f16"], "Conv_0", "Conv_1")
        raw32, cls32 = head(feats["f32"], "Conv_2", "Conv_3")
        raw = jnp.concatenate([raw16, raw32], axis=1).astype(jnp.float32)
        logits = jnp.concatenate([cls16, cls32], axis=1).astype(jnp.float32)

        anchors = jnp.asarray(blazeface_anchors(self.input_size))
        coords = decode_anchor_boxes(raw, anchors, self.input_size)
        scores = jax.nn.sigmoid(logits)
        return {"box_coords": coords, "box_scores": scores}


# ---- LandmarkNet --------------------------------------------------------

_LMK_TRUNK = (
    ("ConvBN_0", (2, 2)),
    ("ConvBN_1", (2, 2)),
    ("ConvBN_2", (1, 1)),
    ("ConvBN_3", (2, 2)),
    ("ConvBN_4", (1, 1)),
    ("ConvBN_5", (2, 2)),
    ("ConvBN_6", (1, 1)),
    ("ConvBN_7", (2, 2)),
    ("ConvBN_8", (1, 1)),  # the 1x1 256-wide projection
)


def quantize_landmark_net(model, params):
    """Trained LandmarkNet flax params -> int8 serving qparams."""
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    st = jax.tree_util.tree_map(np.asarray, params["batch_stats"])
    q = {}
    for i, (nm, _) in enumerate(_LMK_TRUNK):
        q[nm] = _qconvbn(p, (nm,), st, IN_SCALE if i == 0 else ACT_SCALE)
    q["Dense_0"] = {
        "kernel": jnp.asarray(p["Dense_0"]["kernel"], jnp.float32),
        "bias": jnp.asarray(p["Dense_0"]["bias"], jnp.float32),
    }
    return q


class QuantizedLandmarkNet:
    """Bundle-compatible int8 LandmarkNet (apply(q, x) -> dict)."""

    def apply(self, q, x, train: bool = False):
        from video_stream_segmenetation_tpu.models.facemesh import NUM_LANDMARKS

        x = _quant_input(x)
        for nm, strides in _LMK_TRUNK:
            x = _requant(_conv_i8(x, q[nm], strides=strides))
        # pooled relu6-lattice features -> float head
        pooled = jnp.mean(x.astype(jnp.float32), axis=(-3, -2)) * ACT_SCALE
        out = pooled @ q["Dense_0"]["kernel"] + q["Dense_0"]["bias"]
        lm = out[..., : NUM_LANDMARKS * 3].reshape(
            out.shape[:-1] + (NUM_LANDMARKS, 3)
        )
        xy = jax.nn.sigmoid(lm[..., :2])
        z = lm[..., 2:3]
        score = jax.nn.sigmoid(out[..., -1])
        return {"landmarks": jnp.concatenate([xy, z], axis=-1), "scores": score}
