"""TPU-native video-stream segmentation framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
Tomsk-Smart-Tech/video-stream-segmenetation (a browser virtual-background
pipeline): per-frame person segmentation/matting, temporal + morphological +
edge-aware mask refinement, face-landmark motion compensation, alpha
compositing against generated/blurred/replacement backgrounds, and a
personalized background generator -- rebuilt as batched, multi-stream,
HBM-resident device programs.

Public surface (mirrors the reference's `segment(frame) -> mask` /
`composite(frame, mask, background)` contract named in BASELINE.json):

    from video_stream_segmenetation_tpu import segment, composite, Engine
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API: keeps `import video_stream_segmenetation_tpu`
    # lightweight (no model/flax imports) until the API is touched.
    if name in ("segment", "composite", "process_frame"):
        from video_stream_segmenetation_tpu import api

        return getattr(api, name)
    if name == "Engine":
        from video_stream_segmenetation_tpu.service.engine import Engine

        return Engine
    if name in ("PipelineKnobs", "default_knobs"):
        from video_stream_segmenetation_tpu.runtime import config

        return getattr(config, name)
    raise AttributeError(name)
