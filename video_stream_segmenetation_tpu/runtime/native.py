"""ctypes bindings to the native frame-ingestion runtime (native/framebuf.cpp).

FramePool: N per-stream lock-free rings + double-buffered [S, H, W, 3]
batch assembly + YUV420->RGB conversion, all in C++.  The assembled batch
is exposed as a zero-copy NumPy view for `jax.device_put` (the HBM staging
side overlaps with compute via JAX's async dispatch; see SURVEY.md §7
step 6).

Builds on demand with `make` if the shared library is missing (g++ is in
the image; no pip/pybind11 involved).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvstio.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "framebuf.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vst_pool_create.restype = ctypes.c_void_p
    lib.vst_pool_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vst_pool_create_s2d.restype = ctypes.c_void_p
    lib.vst_pool_create_s2d.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vst_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.vst_pool_set_depth.restype = ctypes.c_int
    lib.vst_pool_set_depth.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.vst_push_rgb.restype = ctypes.c_uint64
    lib.vst_push_rgb.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    lib.vst_push_i420.restype = ctypes.c_uint64
    lib.vst_push_i420.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.vst_assemble_batch.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.vst_assemble_batch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.vst_assemble_range.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.vst_assemble_range.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.vst_pool_enable_lanes.restype = ctypes.c_int
    lib.vst_pool_enable_lanes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.vst_lanes_ptr.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.vst_lanes_ptr.argtypes = [ctypes.c_void_p]
    lib.vst_stream_drops.restype = ctypes.c_uint64
    lib.vst_stream_drops.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.vst_frame_bytes.restype = ctypes.c_int
    lib.vst_frame_bytes.argtypes = [ctypes.c_void_p]
    lib.vst_rgb_to_i420.restype = None
    lib.vst_rgb_to_i420.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.vst_s2d_rgb_to_i420.restype = None
    lib.vst_s2d_rgb_to_i420.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    _lib = lib
    return lib


def rgb_to_i420(frame: np.ndarray):
    """uint8 [H, W, 3] -> (Y [H, W], U [H/2, W/2], V [H/2, W/2]) planes
    (BT.601) -- the encoder-handoff side of the native IO pipeline."""
    lib = _load()
    h, w, _ = frame.shape
    frame = np.ascontiguousarray(frame, np.uint8)
    y = np.empty((h, w), np.uint8)
    u = np.empty((h // 2, w // 2), np.uint8)
    v = np.empty((h // 2, w // 2), np.uint8)
    lib.vst_rgb_to_i420(
        frame.ctypes.data_as(ctypes.c_char_p), w, h,
        y.ctypes.data_as(ctypes.c_char_p),
        u.ctypes.data_as(ctypes.c_char_p),
        v.ctypes.data_as(ctypes.c_char_p),
    )
    return y, u, v


def s2d_rgb_to_i420(packed: np.ndarray, frame_hw, block: int):
    """s2d-packed composite output uint8 [H/b, W/b, b*b*3] -> I420 planes.

    The unpack rides inside the encode pass (the device never pays the
    ~27 ms/batch depth_to_space; see ops/layout.py + framebuf.cpp)."""
    lib = _load()
    h, w = frame_hw
    packed = np.ascontiguousarray(packed, np.uint8)
    y = np.empty((h, w), np.uint8)
    u = np.empty((h // 2, w // 2), np.uint8)
    v = np.empty((h // 2, w // 2), np.uint8)
    lib.vst_s2d_rgb_to_i420(
        packed.ctypes.data_as(ctypes.c_char_p), w, h, block,
        y.ctypes.data_as(ctypes.c_char_p),
        u.ctypes.data_as(ctypes.c_char_p),
        v.ctypes.data_as(ctypes.c_char_p),
    )
    return y, u, v


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class FramePool:
    """Host-side frame staging for S streams of HxW RGB frames."""

    def __init__(self, num_streams: int, height: int, width: int,
                 s2d_block: int = 0, guide_lanes=None, depth: int = 2):
        """s2d_block=b > 0: assembled batches come out space-to-depth
        packed [S, H/b, W/b, b*b*3] (the TPU ingestion layout,
        ops/layout.py) -- the pack replaces the assembly memcpy, so the
        permutation is host-free.

        depth: size of the assembly-buffer ring.  Views returned by
        assemble()/assemble_range() (and the matching lanes()) stay valid
        for ``depth - 1`` subsequent assembles.  The default 2 is classic
        double buffering; a fused-round scheduler that assembles G groups
        before one dispatch and collects a round late needs ``2 * G``
        (runtime/scheduler.py step_round).

        guide_lanes: optional int sequence of per-patch tap offsets
        (ops.guide_s2d_sel(..., planar=True)); the assembler then also
        emits the raw guide-lane tensor [nl, rows, H/b, W/b] during the
        pack (read via :meth:`lanes` after each assemble) -- the
        device-side guide gather's frame re-read never happens
        (pipeline guide_source='host')."""
        self._lib = _load()
        self.num_streams = num_streams
        self.height = height
        self.width = width
        self.s2d_block = s2d_block
        if s2d_block and (height % s2d_block or width % s2d_block):
            raise ValueError("s2d_block must divide height and width")
        self._pool = self._lib.vst_pool_create_s2d(
            num_streams, height, width, s2d_block
        )
        if not self._pool:
            raise RuntimeError("vst_pool_create failed")
        if depth != 2:
            if self._lib.vst_pool_set_depth(self._pool, int(depth)) != 0:
                raise ValueError(f"bad pool depth {depth}")
        self.depth = depth
        self._ids = (ctypes.c_uint64 * num_streams)()
        self.num_lanes = 0
        self._last_rows = num_streams
        if guide_lanes is not None:
            sel = np.ascontiguousarray(guide_lanes, np.int32)
            if not s2d_block:
                raise ValueError("guide_lanes requires s2d_block > 0")
            rc = self._lib.vst_pool_enable_lanes(
                self._pool,
                sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(sel),
            )
            if rc != 0:
                raise ValueError("vst_pool_enable_lanes rejected the taps")
            self.num_lanes = len(sel)

    def close(self):
        if self._pool:
            self._lib.vst_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def push_rgb(self, stream: int, frame: np.ndarray) -> int:
        """frame: uint8 [H, W, 3] contiguous.  Returns the frame id."""
        if frame.shape != (self.height, self.width, 3) or frame.dtype != np.uint8:
            raise ValueError(f"expected uint8 [{self.height},{self.width},3]")
        frame = np.ascontiguousarray(frame)
        return self._lib.vst_push_rgb(
            self._pool, stream, frame.ctypes.data_as(ctypes.c_char_p)
        )

    def push_i420(self, stream: int, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> int:
        """Planar YUV420 planes (uint8); converted to RGB natively (BT.601)."""
        y = np.ascontiguousarray(y, np.uint8)
        u = np.ascontiguousarray(u, np.uint8)
        v = np.ascontiguousarray(v, np.uint8)
        return self._lib.vst_push_i420(
            self._pool, stream,
            y.ctypes.data_as(ctypes.c_char_p),
            u.ctypes.data_as(ctypes.c_char_p),
            v.ctypes.data_as(ctypes.c_char_p),
            y.shape[1], u.shape[1],
        )

    def assemble(self) -> tuple[np.ndarray, np.ndarray]:
        """Snapshot the freshest frame of every stream.

        Returns (batch, frame_ids): batch is a zero-copy uint8
        [S, H, W, 3] view into the pool's buffer ring -- valid for the
        next ``depth - 1`` assembles -- and frame_ids the per-stream
        capture ids (0 where a stream has produced nothing yet).
        """
        ptr = self._lib.vst_assemble_batch(self._pool, self._ids)
        self._last_rows = self.num_streams
        n = self.num_streams * self.height * self.width * 3
        buf = np.ctypeslib.as_array(ptr, shape=(n,))
        if self.s2d_block:
            b = self.s2d_block
            batch = buf.reshape(
                self.num_streams, self.height // b, self.width // b, b * b * 3
            )
        else:
            batch = buf.reshape(self.num_streams, self.height, self.width, 3)
        return batch, np.asarray(self._ids, dtype=np.uint64).copy()

    def assemble_range(self, begin: int, end: int) -> tuple[np.ndarray, np.ndarray]:
        """Snapshot only streams ``[begin, end)`` (group-scheduled latency
        mode): packs just the group's rows instead of the full batch, so a
        groups>1 scheduler does 1/groups of the assembly bandwidth per
        tick.  Returns (batch [end-begin, ...], frame_ids [end-begin])."""
        if not (0 <= begin < end <= self.num_streams):
            raise ValueError(f"bad range [{begin}, {end})")
        g = end - begin
        ptr = self._lib.vst_assemble_range(self._pool, begin, end, self._ids)
        self._last_rows = g
        n = g * self.height * self.width * 3
        buf = np.ctypeslib.as_array(ptr, shape=(n,))
        if self.s2d_block:
            b = self.s2d_block
            batch = buf.reshape(g, self.height // b, self.width // b, b * b * 3)
        else:
            batch = buf.reshape(g, self.height, self.width, 3)
        return batch, np.asarray(self._ids[:g], dtype=np.uint64).copy()

    def lanes(self) -> np.ndarray:
        """Guide-lane tensor of the CURRENT batch (the last assemble /
        assemble_range): zero-copy uint8 view [nl, rows, H/b, W/b], rows =
        S for assemble() or end-begin for assemble_range().  Rides the
        same buffer ring as the batch: valid for ``depth - 1`` subsequent
        assembles."""
        if not self.num_lanes:
            raise RuntimeError("pool created without guide_lanes")
        ptr = self._lib.vst_lanes_ptr(self._pool)
        b = self.s2d_block
        hp, wp = self.height // b, self.width // b
        n = self.num_lanes * self._last_rows * hp * wp
        return np.ctypeslib.as_array(ptr, shape=(n,)).reshape(
            self.num_lanes, self._last_rows, hp, wp
        )

    def drops(self, stream: int) -> int:
        """Frames overwritten before ever being batched (producer faster
        than consumer) -- the backpressure counter."""
        return int(self._lib.vst_stream_drops(self._pool, stream))
