"""Native IO runtime: ring buffers, batch assembly, YUV conversion, threads."""

import threading

import numpy as np
import pytest

from video_stream_segmenetation_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable"
)

H, W = 32, 48


def test_push_and_assemble(rng):
    pool = native.FramePool(2, H, W)
    f0 = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    f1 = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    assert pool.push_rgb(0, f0) == 1
    assert pool.push_rgb(1, f1) == 1
    batch, ids = pool.assemble()
    assert batch.shape == (2, H, W, 3)
    np.testing.assert_array_equal(batch[0], f0)
    np.testing.assert_array_equal(batch[1], f1)
    np.testing.assert_array_equal(ids, [1, 1])
    pool.close()


def test_latest_frame_wins(rng):
    pool = native.FramePool(1, H, W)
    for i in range(5):
        f = np.full((H, W, 3), i * 10, np.uint8)
        pool.push_rgb(0, f)
    batch, ids = pool.assemble()
    assert ids[0] == 5
    assert batch[0, 0, 0, 0] == 40  # freshest
    pool.close()


def test_empty_stream_zero_filled():
    pool = native.FramePool(2, H, W)
    pool.push_rgb(1, np.full((H, W, 3), 7, np.uint8))
    batch, ids = pool.assemble()
    assert ids[0] == 0 and batch[0].max() == 0
    assert ids[1] == 1 and batch[1].min() == 7
    pool.close()


def test_double_buffering(rng):
    pool = native.FramePool(1, H, W)
    a = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    b = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    pool.push_rgb(0, a)
    batch1, _ = pool.assemble()
    snap1 = batch1.copy()
    pool.push_rgb(0, b)
    batch2, _ = pool.assemble()
    # batch1's buffer is the *other* buffer: still holds the old frame
    np.testing.assert_array_equal(batch1, snap1)
    np.testing.assert_array_equal(batch2[0], b)
    pool.close()


def test_i420_conversion_grey():
    pool = native.FramePool(1, H, W)
    # Y=128, U=V=128 -> mid grey (BT.601: (128-16)*1.164 ~ 130)
    y = np.full((H, W), 128, np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = np.full((H // 2, W // 2), 128, np.uint8)
    pool.push_i420(0, y, u, v)
    batch, _ = pool.assemble()
    px = batch[0, 0, 0]
    assert abs(int(px[0]) - 130) <= 2
    assert abs(int(px[0]) - int(px[1])) <= 1 and abs(int(px[1]) - int(px[2])) <= 1
    pool.close()


def test_i420_red():
    pool = native.FramePool(1, H, W)
    # pure-ish red in BT.601: R=255 -> Y~81, U~90, V~240
    y = np.full((H, W), 81, np.uint8)
    u = np.full((H // 2, W // 2), 90, np.uint8)
    v = np.full((H // 2, W // 2), 240, np.uint8)
    pool.push_i420(0, y, u, v)
    batch, _ = pool.assemble()
    r, g, b = (int(c) for c in batch[0, 0, 0])
    assert r > 220 and g < 40 and b < 40
    pool.close()


def test_concurrent_producers(rng):
    pool = native.FramePool(4, H, W)
    n_frames = 50

    def producer(s):
        for i in range(n_frames):
            pool.push_rgb(s, np.full((H, W, 3), (s * 37 + i) % 256, np.uint8))

    threads = [threading.Thread(target=producer, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    # consumer races with producers
    for _ in range(20):
        batch, ids = pool.assemble()
        # every snapshot is internally consistent: constant-valued frames
        for s in range(4):
            if ids[s]:
                vals = np.unique(batch[s])
                assert vals.size == 1
    for t in threads:
        t.join()
    batch, ids = pool.assemble()
    np.testing.assert_array_equal(ids, [n_frames] * 4)
    pool.close()


def test_rgb_i420_roundtrip(rng):
    """RGB -> I420 -> RGB through the native converters stays close."""
    pool = native.FramePool(1, H, W)
    # smooth gradient: 2x2 chroma subsampling loses almost nothing
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.stack(
        [60 + xx / W * 120, 80 + yy / H * 100, 100 + (xx + yy) / (H + W) * 80],
        axis=-1,
    ).astype(np.uint8)
    y, u, v = native.rgb_to_i420(rgb)
    assert y.shape == (H, W) and u.shape == (H // 2, W // 2)
    pool.push_i420(0, y, u, v)
    batch, _ = pool.assemble()
    diff = np.abs(batch[0].astype(np.int16) - rgb.astype(np.int16))
    assert diff.mean() < 3.0 and diff.max() <= 12
    pool.close()


def test_drop_counter(rng):
    pool = native.FramePool(1, H, W)
    f = np.zeros((H, W, 3), np.uint8)
    for _ in range(10):
        pool.push_rgb(0, f)
    assert pool.drops(0) >= 1  # ring overwritten without consumption
    pool.close()


def test_native_s2d_pack_matches_ops(rng):
    """Native s2d batch assembly == ops.space_to_depth of the same frames."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime import native

    if not native.native_available():
        import pytest

        pytest.skip("native lib unavailable")
    pool = native.FramePool(2, 30, 40, s2d_block=5)
    frames = (rng.random((2, 30, 40, 3)) * 255).astype(np.uint8)
    pool.push_rgb(0, frames[0])
    pool.push_rgb(1, frames[1])
    batch, ids = pool.assemble()
    assert batch.shape == (2, 6, 8, 75)
    want = np.asarray(ops.space_to_depth(jnp.asarray(frames), 5))
    np.testing.assert_array_equal(batch, want)
    pool.close()


def test_native_s2d_encode_matches_natural(rng):
    """Packed-output I420 encode == natural-layout encode of the unpacked
    frame (bit-exact: same arithmetic, different walk order)."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime import native

    if not native.native_available():
        import pytest

        pytest.skip("native lib unavailable")
    frame = (rng.random((20, 40, 3)) * 255).astype(np.uint8)
    packed = np.asarray(ops.space_to_depth(jnp.asarray(frame[None]), 5))[0]
    y1, u1, v1 = native.rgb_to_i420(frame)
    y2, u2, v2 = native.s2d_rgb_to_i420(packed, (20, 40), 5)
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(v1, v2)


def test_assemble_range_matches_full(rng):
    """Ranged assemble (latency-mode group packing) returns exactly the
    group rows of a full assemble, ids included."""
    from video_stream_segmenetation_tpu.runtime.native import FramePool

    pool = FramePool(4, 16, 24)
    frames = (rng.random((4, 16, 24, 3)) * 255).astype(np.uint8)
    for s in range(4):
        pool.push_rgb(s, frames[s])
    full, full_ids = pool.assemble()
    full = full.copy()
    grp, grp_ids = pool.assemble_range(1, 3)
    np.testing.assert_array_equal(grp, full[1:3])
    np.testing.assert_array_equal(grp_ids, full_ids[1:3])
    pool.close()


def test_assemble_range_s2d(rng):
    from video_stream_segmenetation_tpu.runtime.native import FramePool

    pool = FramePool(4, 16, 24, s2d_block=2)
    frames = (rng.random((4, 16, 24, 3)) * 255).astype(np.uint8)
    for s in range(4):
        pool.push_rgb(s, frames[s])
    full, _ = pool.assemble()
    full = full.copy()
    grp, _ = pool.assemble_range(2, 4)
    np.testing.assert_array_equal(grp, full[2:4])
    pool.close()


def test_native_guide_lanes_match_ops(rng):
    """Pool guide-lane emission == ops.guide_lanes_s2d of the packed
    batch (the guide_source='host' ingestion contract), full and ranged."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime import native

    if not native.native_available():
        pytest.skip("native lib unavailable")
    fh, fw, blk, mhw = 40, 80, 10, (16, 32)
    sel = ops.guide_s2d_sel((fh, fw), mhw, blk, planar=True)
    assert sel is not None
    pool = native.FramePool(4, fh, fw, s2d_block=blk, guide_lanes=sel)
    frames = (rng.random((4, fh, fw, 3)) * 255).astype(np.uint8)
    for s in range(4):
        pool.push_rgb(s, frames[s])
    batch, _ = pool.assemble()
    lanes = pool.lanes()
    want, geom = ops.guide_lanes_s2d(
        jnp.asarray(batch.copy()), (fh, fw), mhw, blk
    )
    assert lanes.shape == want.shape == (len(sel), 4, fh // blk, fw // blk)
    np.testing.assert_array_equal(lanes, np.asarray(want))

    grp, _ = pool.assemble_range(1, 3)
    glanes = pool.lanes()
    assert glanes.shape == (len(sel), 2, fh // blk, fw // blk)
    np.testing.assert_array_equal(glanes, np.asarray(want)[:, 1:3])
    pool.close()


def test_native_guide_lanes_empty_stream_zeroed():
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime import native

    if not native.native_available():
        pytest.skip("native lib unavailable")
    sel = ops.guide_s2d_sel((40, 80), (16, 32), 10, planar=True)
    pool = native.FramePool(2, 40, 80, s2d_block=10, guide_lanes=sel)
    pool.push_rgb(0, np.full((40, 80, 3), 200, np.uint8))
    pool.assemble()
    lanes = pool.lanes()
    assert (lanes[:, 0] == 200).all()
    assert (lanes[:, 1] == 0).all()
    pool.close()
