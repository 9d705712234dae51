"""Separable blurs for background-blur compositing.

The reference has no in-code blur (its background is a generated image via
CSS stacking), but background-blur is a named capability of the rebuild
(BASELINE.json configs: "binary mask + background-blur composite").
Separable Gaussian = two 1-D convs; kernels are built at trace time
(static sigma) so XLA sees constant weights and fuses freely.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _conv_axis(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D 'same' convolution with edge-replicate padding along ``axis``."""
    r = len(kernel) // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode="edge")
    out = jnp.zeros_like(x)
    size = x.shape[axis]
    for i, kv in enumerate(kernel):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + size)
        out = out + xp[tuple(sl)] * jnp.asarray(kv, x.dtype)
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of ``[..., H, W, C]`` (channel-last)."""
    k = _gaussian_kernel(float(sigma), radius)
    out = _conv_axis(img, k, img.ndim - 3)
    out = _conv_axis(out, k, img.ndim - 2)
    return out


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, sigma: float, radius: int | None = None) -> np.ndarray:
    """Dense banded [size, size] 1-D Gaussian matrix with edge-replicate
    boundary handling -- exactly the taps of `_conv_axis`."""
    k = _gaussian_kernel(sigma, radius)
    r = len(k) // 2
    m = np.zeros((size, size), np.float32)
    for i in range(size):
        for j, kv in enumerate(k):
            m[i, min(max(i + j - r, 0), size - 1)] += kv
    return m


def gaussian_blur_mxu(
    img: jnp.ndarray, sigma: float, radius: int | None = None, precision=None
) -> jnp.ndarray:
    """Separable Gaussian blur as planar banded matmuls.

    Numerically identical taps to :func:`gaussian_blur` (same kernel,
    same edge replication), but each axis pass is a dense matmul per
    channel plane -- the shifted-slice formulation materializes ~2*taps
    channel-minormost intermediates, which is pathological on TPU at
    720p (the same layout lesson as ops/resize.py::resize_bilinear_mxu).
    """
    import jax

    h, w = img.shape[-3], img.shape[-2]
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    bh = jnp.asarray(_blur_matrix(h, float(sigma), radius))
    bw = jnp.asarray(_blur_matrix(w, float(sigma), radius))
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    planes = []
    for c in range(img.shape[-1]):
        x = img[..., c].astype(dt)
        x = jnp.einsum("oh,...hw->...ow", bh.astype(dt), x, precision=prec)
        x = jnp.einsum("pw,...hw->...hp", bw.astype(dt), x, precision=prec)
        planes.append(x)
    return jnp.stack(planes, axis=-1)


def gaussian_blur_planar_mxu(
    plane: jnp.ndarray, sigma: float, radius: int | None = None,
    precision=None,
) -> jnp.ndarray:
    """Planar (no channel axis) Gaussian blur of ``[..., H, W]`` as two
    banded matmuls -- same taps as :func:`gaussian_blur_mxu` but the
    caller manages channels (e.g. as a leading batch axis), so no
    channel-minormost stack/relayout ever happens (the multiclass packed
    composite keeps everything planar until its final interleave,
    ops/layout.py::multiclass_composite_s2d)."""
    import jax

    h, w = plane.shape[-2], plane.shape[-1]
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    bh = jnp.asarray(_blur_matrix(h, float(sigma), radius))
    bw = jnp.asarray(_blur_matrix(w, float(sigma), radius))
    dt = (
        plane.dtype
        if jnp.issubdtype(plane.dtype, jnp.floating)
        else jnp.float32
    )
    x = jnp.einsum("oh,...hw->...ow", bh.astype(dt), plane.astype(dt), precision=prec)
    return jnp.einsum("pw,...hw->...hp", bw.astype(dt), x, precision=prec)


def gaussian_blur_auto(
    img: jnp.ndarray, sigma: float, radius: int | None = None
) -> jnp.ndarray:
    """Backend-dispatched Gaussian blur: the banded-matmul formulation on
    TPU (MXU-bound, avoids channel-minormost intermediates), the separable
    shifted-slice formulation elsewhere (the dense [H,H]/[W,W] matmuls are
    O(H^2 W) and much slower than separable conv on CPU).  Backend is
    resolved at trace time, so jitted callers specialize per platform."""
    import jax

    if jax.default_backend() == "tpu":
        return gaussian_blur_mxu(img, sigma, radius)
    return gaussian_blur(img, sigma, radius)


def box_blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable box blur of ``[..., H, W, C]`` -- the cheap large-radius
    path (3 box passes ~ Gaussian)."""
    k = np.full((2 * radius + 1,), 1.0 / (2 * radius + 1), dtype=np.float32)
    out = _conv_axis(img, k, img.ndim - 3)
    out = _conv_axis(out, k, img.ndim - 2)
    return out
