"""Core tensor ops: the reference's per-pixel JS loops as batched XLA programs.

Every op here is pure, shape-static, jit-compatible, and batched over
arbitrary leading dimensions (a stream axis `[S, ...]` in production).
Numerics are pinned to the reference implementation (file:line citations in
each docstring) and covered by NumPy-oracle golden tests in tests/.
"""

from video_stream_segmenetation_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_bilinear_mxu,
    resize_nearest,
    crop_and_resize,
    crop_and_resize_mxu,
)
from video_stream_segmenetation_tpu.ops.color import (  # noqa: F401
    normalize_frame,
    denormalize_to_u8,
    mask_to_f32,
    u8_mask_to_f32,
    quantize_alpha_u8,
)
from video_stream_segmenetation_tpu.ops.temporal import (  # noqa: F401
    temporal_ema,
    hole_filling_ema,
    affine_lowpass,
)
from video_stream_segmenetation_tpu.ops.morphology import (  # noqa: F401
    erode3x3,
    dilate3x3,
    morphological_opening,
    morphological_closing_in_prior,
)
from video_stream_segmenetation_tpu.ops.bilateral import joint_bilateral3x3  # noqa: F401
from video_stream_segmenetation_tpu.ops.warp import (  # noqa: F401
    invert_affine,
    warp_affine_nearest,
    warp_affine_separable,
    warp_translate,
)
from video_stream_segmenetation_tpu.ops.refine import refine_alpha  # noqa: F401
from video_stream_segmenetation_tpu.ops.prior import (  # noqa: F401
    face_prior_mask,
    face_prior_params,
    prior_plane_from_params,
)
from video_stream_segmenetation_tpu.ops.geometry import (  # noqa: F401
    estimate_similarity_transform,
    affine_video_to_mask,
    letterbox_params,
    letterbox_inverse_map,
    pad_box,
)
from video_stream_segmenetation_tpu.ops.detect import (  # noqa: F401
    best_box_decode,
    box_iou,
    nms,
    blazeface_anchors,
)
from video_stream_segmenetation_tpu.ops.composite import (  # noqa: F401
    alpha_composite,
    binarize_alpha,
    multiclass_composite,
    upsample_alpha,
)
from video_stream_segmenetation_tpu.ops.blur import (  # noqa: F401
    gaussian_blur,
    gaussian_blur_auto,
    gaussian_blur_mxu,
    box_blur,
)
from video_stream_segmenetation_tpu.ops.layout import (  # noqa: F401
    space_to_depth,
    depth_to_space,
    guide_from_s2d,
    guide_s2d_sel,
    guide_from_gathered,
    guide_lanes_s2d,
    alpha_composite_s2d,
    multiclass_composite_s2d,
    packed_color,
)
