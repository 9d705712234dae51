"""Training subsystem: losses, metrics, data-parallel train step."""

from video_stream_segmenetation_tpu.train.losses import iou_metric, matting_loss  # noqa: F401
from video_stream_segmenetation_tpu.train.step import (  # noqa: F401
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from video_stream_segmenetation_tpu.train.loop import (  # noqa: F401
    fit,
    synthetic_matting_batch,
)
