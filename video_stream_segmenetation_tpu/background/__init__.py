"""Personalized background generator (the customization engine)."""

from video_stream_segmenetation_tpu.background.schema import (  # noqa: F401
    AppData,
    Employee,
    PRIVACY_RANK,
    Shadow,
    Template,
    TemplateLayer,
    text_for_layer,
)
from video_stream_segmenetation_tpu.background.render import BackgroundRenderer  # noqa: F401
from video_stream_segmenetation_tpu.background.data import sample_app_data  # noqa: F401
