"""Model zoo: JAX/Flax re-implementations of the reference's ONNX models
(SURVEY.md section 2.7), NHWC + bf16, batched over a stream axis."""

from video_stream_segmenetation_tpu.models.modnet import MatteNet  # noqa: F401
from video_stream_segmenetation_tpu.models.mattenet_hd import MatteNetHD  # noqa: F401
from video_stream_segmenetation_tpu.models.quantized import (  # noqa: F401
    QuantizedMatteNetHD,
    quantize_mattenet_hd,
)
from video_stream_segmenetation_tpu.models.blazeface import FaceFinder  # noqa: F401
from video_stream_segmenetation_tpu.models.facemesh import LandmarkNet, NUM_LANDMARKS  # noqa: F401
from video_stream_segmenetation_tpu.models.rvm import (  # noqa: F401
    RecurrentMatteNet,
    RecurrentState,
    init_state,
)
from video_stream_segmenetation_tpu.models.u2net import SaliencyNet  # noqa: F401
from video_stream_segmenetation_tpu.models.registry import (  # noqa: F401
    ModelSpec,
    get_spec,
    list_models,
)
