"""Service layer: serving engine, counters, health."""

from video_stream_segmenetation_tpu.service.counters import Counters, LatencyWindow  # noqa: F401
from video_stream_segmenetation_tpu.service.engine import Engine  # noqa: F401
from video_stream_segmenetation_tpu.service.health import EngineHealth, HealthMonitor  # noqa: F401
