"""Utilities: checkpointing, profiling, logging."""

from video_stream_segmenetation_tpu.utils.checkpoint import (  # noqa: F401
    face_checkpoint_paths,
    restore_engine,
    restore_params,
    save_engine,
    save_params,
)
from video_stream_segmenetation_tpu.utils.profiling import (  # noqa: F401
    device_timer,
    time_fn,
    trace,
)
from video_stream_segmenetation_tpu.utils.clips import (  # noqa: F401
    SyntheticClip,
    load_reference_masks,
    mask_iou,
    parity_report,
    run_clip_through_engine,
    synthetic_clip,
    temporal_stability,
)
