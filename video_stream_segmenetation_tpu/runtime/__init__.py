"""Runtime: batched stream state, live config, the fused pipeline step."""

from video_stream_segmenetation_tpu.runtime.config import (  # noqa: F401
    PipelineKnobs,
    PipelineStatics,
    default_knobs,
)
from video_stream_segmenetation_tpu.runtime.state import (  # noqa: F401
    StreamState,
    init_state,
    reset_stream,
    reset_streams,
)
from video_stream_segmenetation_tpu.runtime.pipeline import (  # noqa: F401
    ModelBundle,
    make_range_step,
    make_round_step,
    make_step,
    segment_once,
)
from video_stream_segmenetation_tpu.runtime.rollout import (  # noqa: F401
    make_round_rollout,
    make_step_rollout,
)
from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler  # noqa: F401
from video_stream_segmenetation_tpu.runtime.presets import (  # noqa: F401
    describe,
    list_presets,
    preset,
)
