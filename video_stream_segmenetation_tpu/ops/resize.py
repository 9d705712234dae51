"""Resize ops with explicitly controlled coordinate-transform semantics.

The reference mixes three distinct resize conventions, and mask-edge parity
depends on reproducing each one exactly (the lesson of the reference's ONNX
patcher, client/src/patch.py:35-50, which rewrites Resize
coordinate_transformation_mode for WebGPU):

* ``asymmetric``   -- tf.js ``tf.image.resizeBilinear`` default
  (alignCorners=false, halfPixelCenters=false), used for every model
  preprocess in the reference (client/src/core/frameProcessorTest.ts:80,
  frameProcessor.ts:69, frameProcessorRVM.ts resize).
  src = dst * (in_size / out_size).
* ``half_pixel``   -- Canvas2D ``drawImage`` sampling and the patched ONNX
  Resize nodes (patch.py:42-50).  src = (dst + 0.5) * scale - 0.5.
* ``align_corners`` -- the reference's hand-written ``bilinearUpscale``
  (client/src/core/frameProcessor.ts:213-242).
  src = dst * (in-1) / (out-1).

All functions operate on ``[..., H, W]`` or ``[..., H, W, C]`` arrays with
static shapes, and are jit/vmap friendly.  Gather indices/weights are
computed at trace time with NumPy (static), so XLA sees constant gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Method = str  # 'asymmetric' | 'half_pixel' | 'align_corners'


def _axis_coords(out_size: int, in_size: int, method: Method) -> np.ndarray:
    d = np.arange(out_size, dtype=np.float64)
    if method == "asymmetric":
        return d * (in_size / out_size)
    if method == "half_pixel":
        return (d + 0.5) * (in_size / out_size) - 0.5
    if method == "align_corners":
        if out_size == 1:
            return np.zeros((1,), dtype=np.float64)
        return d * (in_size - 1) / (out_size - 1)
    raise ValueError(f"unknown resize method: {method}")


def _linear_taps(out_size: int, in_size: int, method: Method):
    """Static (idx0, idx1, w1) per output position for 1-D linear resize."""
    src = _axis_coords(out_size, in_size, method)
    x0 = np.floor(src)
    w1 = src - x0
    i0 = np.clip(x0, 0, in_size - 1).astype(np.int32)
    i1 = np.clip(x0 + 1, 0, in_size - 1).astype(np.int32)
    # When src < 0 (half_pixel upscale at the border) both taps clamp to 0 and
    # the weight must not extrapolate: clamp weight into [0, 1].
    w1 = np.clip(w1, 0.0, 1.0).astype(np.float32)
    return i0, i1, w1


def _nearest_taps(out_size: int, in_size: int, method: Method) -> np.ndarray:
    src = _axis_coords(out_size, in_size, method)
    # JS Math.round / round-half-up semantics (warpAffineNearest uses the
    # same convention, client/src/core/frameProcessorTest.ts:348).
    idx = np.floor(src + 0.5)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def _resize_axis_linear(x: jnp.ndarray, axis: int, out_size: int, method: Method) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size and method != "half_pixel":
        return x
    i0, i1, w1 = _linear_taps(out_size, in_size, method)
    lo = jnp.take(x, jnp.asarray(i0), axis=axis)
    hi = jnp.take(x, jnp.asarray(i1), axis=axis)
    w = jnp.asarray(w1, dtype=x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return lo * (1 - w) + hi * w


def resize_bilinear(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    method: Method = "asymmetric",
    channel_last: bool = True,
) -> jnp.ndarray:
    """Separable bilinear resize of ``[..., H, W, C]`` (or ``[..., H, W]``).

    ``channel_last=False`` treats the array as ``[..., H, W]`` (no channel
    dim); with ``channel_last=True`` the last dim is channels.
    """
    h_axis = img.ndim - (3 if channel_last else 2)
    w_axis = h_axis + 1
    out = _resize_axis_linear(img, h_axis, out_hw[0], method)
    out = _resize_axis_linear(out, w_axis, out_hw[1], method)
    return out


@functools.lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int, method: Method) -> np.ndarray:
    """Dense [out, in] linear-interpolation matrix (<= 2 nonzeros/row)
    with exactly the same taps as the gather path."""
    i0, i1, w1 = _linear_taps(out_size, in_size, method)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w1)
    np.add.at(m, (rows, i1), w1)
    return m


def resize_bilinear_mxu(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    method: Method = "asymmetric",
    channel_last: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Bilinear resize as two dense matmuls on the MXU.

    Numerically the same taps as `resize_bilinear`, evaluated as
    ``A_h @ img @ A_w^T`` -- on TPU a big batched matmul beats the
    gather lowering by a wide margin.  ``precision`` defaults to
    float32-accurate passes ('highest') so results match the gather path
    to ~1e-6; pass jax.lax.Precision.DEFAULT for maximum speed where
    bf16-mantissa accuracy suffices (e.g. model preprocess).
    """
    h_axis = img.ndim - (3 if channel_last else 2)
    w_axis = h_axis + 1
    in_h, in_w = img.shape[h_axis], img.shape[w_axis]
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    a_h = jnp.asarray(_interp_matrix(out_hw[0], in_h, method))
    a_w = jnp.asarray(_interp_matrix(out_hw[1], in_w, method))
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dt)
    if channel_last:
        # [..., H, W, C]: contract H then W
        x = jnp.einsum("oh,...hwc->...owc", a_h.astype(dt), x, precision=prec)
        x = jnp.einsum("pw,...hwc->...hpc", a_w.astype(dt), x, precision=prec)
        return x
    x = jnp.einsum("oh,...hw->...ow", a_h.astype(dt), x, precision=prec)
    x = jnp.einsum("pw,...hw->...hp", a_w.astype(dt), x, precision=prec)
    return x


def resize_nearest(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    method: Method = "asymmetric",
    channel_last: bool = True,
) -> jnp.ndarray:
    """Nearest-neighbor resize with the same coordinate conventions."""
    h_axis = img.ndim - (3 if channel_last else 2)
    w_axis = h_axis + 1
    iy = jnp.asarray(_nearest_taps(out_hw[0], img.shape[h_axis], method))
    ix = jnp.asarray(_nearest_taps(out_hw[1], img.shape[w_axis], method))
    out = jnp.take(img, iy, axis=h_axis)
    out = jnp.take(out, ix, axis=w_axis)
    return out


def crop_and_resize(
    img: jnp.ndarray,
    box: jnp.ndarray,
    out_hw: tuple[int, int],
    fill: float = 0.0,
) -> jnp.ndarray:
    """Crop ``box`` = [x0, y0, x1, y1] (pixels, float) and resize to out_hw.

    TPU-native replacement for the reference's dynamic Canvas ROI crop +
    drawImage resample chain (cropFaceROI + preprocessToNCHW,
    client/src/core/frameProcessorTest.ts:451-470, 357-391).  Because XLA
    requires static shapes, the dynamic crop is expressed as a bilinear
    *sampling* of the source at box-dependent coordinates (half-pixel
    centers, matching drawImage).  Out-of-frame samples read ``fill``.

    img: ``[H, W, C]`` float. box: ``[4]`` float array (can be traced).
    Returns ``[out_h, out_w, C]``.
    """
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = out_hw
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x1 - x0, 1e-6)
    bh = jnp.maximum(y1 - y0, 1e-6)
    # destination pixel center -> source coordinate (half-pixel convention)
    ys = y0 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (bh / out_h) - 0.5
    xs = x0 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (bw / out_w) - 0.5

    def gather_1d(coords, size):
        c0 = jnp.floor(coords)
        frac = (coords - c0).astype(img.dtype)
        i0 = jnp.clip(c0, 0, size - 1).astype(jnp.int32)
        i1 = jnp.clip(c0 + 1, 0, size - 1).astype(jnp.int32)
        valid = (coords >= -0.5) & (coords <= size - 0.5)
        return i0, i1, frac, valid

    yi0, yi1, fy, vy = gather_1d(ys, h)
    xi0, xi1, fx, vx = gather_1d(xs, w)

    top = jnp.take(img, yi0, axis=-3)
    bot = jnp.take(img, yi1, axis=-3)
    row = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    left = jnp.take(row, xi0, axis=-2)
    right = jnp.take(row, xi1, axis=-2)
    out = left * (1 - fx)[None, :, None] + right * fx[None, :, None]
    valid = (vy[:, None] & vx[None, :])[..., None]
    return jnp.where(valid, out, jnp.asarray(fill, dtype=img.dtype))


def crop_and_resize_mxu(
    img: jnp.ndarray,
    box: jnp.ndarray,
    out_hw: tuple[int, int],
    fill: float = 0.0,
) -> jnp.ndarray:
    """Batched MXU lowering of :func:`crop_and_resize` -- identical
    numerics (same half-pixel taps, edge clamp, out-of-frame fill), but
    the dynamic 2-D gather becomes two dense interp matmuls whose weight
    matrices are built on the fly from hat functions
    ``clip(1 - |src_u - y|, 0, 1)`` (exactly the 2-tap linear weights).
    Dynamic gathers at ROI size are VPU-bound and slow on v5e; these
    matmuls are ~free (K x 192 x 288 x 512 ~ 1 GFLOP at K=11).

    img: ``[K, H, W, C]``. box: ``[K, 4]`` = [x0, y0, x1, y1] float px.
    """
    k, h, w, _ = img.shape
    out_h, out_w = out_hw
    bw = jnp.maximum(box[:, 2] - box[:, 0], 1e-6)[:, None]
    bh = jnp.maximum(box[:, 3] - box[:, 1], 1e-6)[:, None]
    ys = box[:, 1:2] + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (bh / out_h) - 0.5
    xs = box[:, 0:1] + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (bw / out_w) - 0.5
    vy = (ys >= -0.5) & (ys <= h - 0.5)
    vx = (xs >= -0.5) & (xs <= w - 0.5)

    def hat(coords, size):  # [K, out] -> [K, out, size]
        s = jnp.clip(coords, 0.0, size - 1.0)[..., None]
        grid = jnp.arange(size, dtype=jnp.float32)
        return jnp.clip(1.0 - jnp.abs(s - grid), 0.0, 1.0).astype(img.dtype)

    wy = hat(ys, h)
    wx = hat(xs, w)
    row = jnp.einsum("kuh,khwc->kuwc", wy, img)
    out = jnp.einsum("kvw,kuwc->kuvc", wx, row)
    mask = (vy[:, :, None] & vx[:, None, :])[..., None]
    return jnp.where(mask, out, jnp.asarray(fill, img.dtype))
