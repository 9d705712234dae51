"""Mesh / sharding layer: stream-batch data parallelism over TPU meshes."""

from video_stream_segmenetation_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    replicate_tree,
    replicated,
    shard_stream_tree,
    sharded_step,
    stream_sharding,
)
