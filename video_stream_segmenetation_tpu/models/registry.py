"""Model zoo registry -- the framework-side equivalent of the reference's
ONNX session factory (client/src/core/model.ts:12-67), minus the EP
juggling: every model runs under the same XLA backend, and 'backend
fallback' is jit on CPU vs TPU (the testing stance in tests/conftest.py).

Each entry knows its canonical input geometry (the sizes hard-coded across
the reference: MODNet 288x512 frameProcessorTest.ts:10, FaceDetector 256
:33, Landmarks 192 :34, blaze 128 frameProcessor.ts:252, U2Net 320
u2FrameProc.ts:4) and how to initialize parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    make: Callable[..., Any]  # nn.Module factory
    input_hw: tuple[int, int]
    kwargs: dict = dataclasses.field(default_factory=dict)
    stateful: bool = False

    def build(self, **overrides):
        kw = {**self.kwargs, **overrides}
        return self.make(**kw)

    def init_params(self, rng=None, batch: int = 1, **overrides):
        model = self.build(**overrides)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((batch, *self.input_hw, 3), jnp.float32)
        if self.stateful:
            from video_stream_segmenetation_tpu.models.rvm import init_state

            state = init_state(batch, self.input_hw)
            params = model.init(rng, x, state)
        else:
            params = model.init(rng, x)
        return model, params


def _specs():
    from video_stream_segmenetation_tpu.models.blazeface import FaceFinder
    from video_stream_segmenetation_tpu.models.facemesh import LandmarkNet
    from video_stream_segmenetation_tpu.models.mattenet_hd import MatteNetHD
    from video_stream_segmenetation_tpu.models.modnet import MatteNet
    from video_stream_segmenetation_tpu.models.rvm import RecurrentMatteNet
    from video_stream_segmenetation_tpu.models.u2net import SaliencyNet

    return {
        # flagship matting net (role of model_q4f16.onnx, main.ts:6)
        "mattenet": ModelSpec("mattenet", MatteNet, (288, 512)),
        # 720p-native fast flagship (TPU-first: strided-conv stem does the
        # resize; see models/mattenet_hd.py)
        "mattenet_hd": ModelSpec("mattenet_hd", MatteNetHD, (720, 1280)),
        # plan-C lite trunk (decoder='light'): ~43% fewer FLOPs, edge
        # detail delegated to the guided refine stage
        "mattenet_hd10_lite": ModelSpec(
            "mattenet_hd10_lite", MatteNetHD, (720, 1280),
            {"stem_stride": 10, "head_upsample": 4, "decoder": "light"},
        ),
        # multi-class segmentation variant (BASELINE.json config 5)
        "mattenet_multiclass": ModelSpec(
            "mattenet_multiclass", MatteNet, (288, 512), {"num_classes": 4}
        ),
        # face detector (role of MediaPipeFaceDetector.onnx)
        "facefinder": ModelSpec("facefinder", FaceFinder, (256, 256)),
        # blaze.onnx-class small detector input (frameProcessor.ts:252)
        "facefinder128": ModelSpec(
            "facefinder128", FaceFinder, (128, 128), {"input_size": 128}
        ),
        # 468-landmark regressor (role of MediaPipeFaceLandmarkDetector.onnx)
        "landmarknet": ModelSpec("landmarknet", LandmarkNet, (192, 192)),
        # recurrent matting (role of the absent RVM model)
        "recurrent_mattenet": ModelSpec(
            "recurrent_mattenet", RecurrentMatteNet, (288, 512), stateful=True
        ),
        # salient-object variant (role of the absent U2Net model)
        "saliencynet": ModelSpec("saliencynet", SaliencyNet, (320, 320)),
    }


_REGISTRY: dict[str, ModelSpec] | None = None


def get_spec(name: str) -> ModelSpec:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _specs()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_models() -> list[str]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _specs()
    return sorted(_REGISTRY)
