"""Import the reference's shipped face ONNX weights into checkpoints/.

Parses the protobuf directly (utils/onnx_lite.py; no onnx package in this
image) and caches initializers as checkpoints/face_ref/*.npz plus the
graph files (the architecture definition) so serving never needs the
reference checkout.

Run: python tools/import_reference_weights.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_segmenetation_tpu.models.reference_face import (  # noqa: E402
    cache_reference_weights,
)


def main() -> None:
    paths = cache_reference_weights()
    if not paths:
        print("no reference assets found (nothing imported)")
        return
    for kind, p in paths.items():
        print(f"{kind}: {p} ({os.path.getsize(p) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
