"""Shared conv building blocks (Flax linen, NHWC, bf16-friendly).

The reference consumes opaque ONNX CNNs (MODNet / BlazeFace / FaceMesh /
RVM / U2Net, SURVEY.md section 2.7); here the equivalent model zoo is built
from scratch with TPU-native choices: NHWC layout, channel counts that tile
the MXU/VPU well, static shapes, and a `compute_dtype` knob so the whole
forward runs in bfloat16 with float32 params.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PatchifiedConv(nn.Module):
    """``nn.Conv`` stand-in for the stride==kernel case when the input
    arrives space-to-depth packed ``[.., H/k, W/k, k*k*cin]`` (uint8 or
    [0,1] float): the conv collapses to one ``[k*k*cin, features]``
    matmul the MXU runs at full tilt -- no im2col, no layout shuffle
    (tools/bench_stem.py: 5.4 ms -> 1.5 ms for the 720p stem at S=64).

    The kernel param has the same name ("kernel") and HWIO shape as
    ``nn.Conv``'s, and the patch order (dy,dx,c) matches the HWIO
    row-major reshape, so checkpoints are interchangeable between the
    natural-layout and s2d paths (instantiate with ``name="Conv_0"`` to
    share ``nn.Conv``'s auto-name).

    uint8 inputs are consumed directly; the reference's /255 preprocess
    scale (client/src/core/frameProcessorTest.ts:82) folds into the
    weights.
    """

    features: int
    kernel: tuple[int, int]
    in_features: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, self.in_features, self.features),
            jnp.float32,
        )
        w = k.reshape(kh * kw * self.in_features, self.features)
        if x.dtype == jnp.uint8:
            w = w / 255.0
        return x.astype(self.dtype) @ w.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv + BatchNorm + optional activation.

    Normalization note: BN runs with use_running_average=True in BOTH
    serving and training -- i.e. frozen unit statistics with a learned
    scale/bias (gradients flow through them).  This keeps every forward
    identical between training and serving (no stats side-channel, no
    mutable collections through jit/shard_map) at some normalization
    power; the synthetic-data fits reach IoU 0.97+ under it
    (tools/train_flagship.py).  Swapping in GroupNorm is a one-line
    change here if future training needs it.
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    dilation: tuple[int, int] = (1, 1)
    act: bool = True
    dtype: Any = jnp.bfloat16
    # input arrives space-to-depth packed (see PatchifiedConv); requires
    # kernel == strides, groups == 1, dilation == 1
    patch_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.patch_input:
            if (
                self.kernel != self.strides
                or self.groups != 1
                or self.dilation != (1, 1)
            ):
                raise ValueError("patch_input needs kernel==strides, no groups/dilation")
            cin = x.shape[-1] // (self.kernel[0] * self.kernel[1])
            x = PatchifiedConv(
                self.features, self.kernel, in_features=cin,
                dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding="SAME",
                feature_group_count=self.groups,
                kernel_dilation=self.dilation,
                use_bias=False,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu6(x)
        return x


class SEBlock(nn.Module):
    """Squeeze-excitation (channel attention)."""

    reduce: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Dense(max(8, c // self.reduce), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class InvertedResidual(nn.Module):
    """MobileNetV2-style inverted residual (expand -> depthwise -> project)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    expand: int = 6
    use_se: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = inp * self.expand
        h = x
        if self.expand != 1:
            h = ConvBN(mid, (1, 1), dtype=self.dtype)(h, train)
        h = ConvBN(
            mid, (3, 3), strides=self.strides, groups=mid, dtype=self.dtype
        )(h, train)
        if self.use_se:
            h = SEBlock(dtype=self.dtype)(h)
        h = ConvBN(self.features, (1, 1), act=False, dtype=self.dtype)(h, train)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


class MobileEncoder(nn.Module):
    """MobileNetV2-class encoder emitting a feature pyramid.

    Returns features at strides 2, 4, 8, 16 (f2, f4, f8, f16).  Channel
    plan defaults to multiples of 8 that pack well on the VPU lanes.
    """

    width: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(n):
            return max(8, int(n * self.width) // 8 * 8)

        x = ConvBN(c(16), strides=(2, 2), dtype=self.dtype)(x, train)  # /2
        x = InvertedResidual(c(16), expand=1, dtype=self.dtype)(x, train)
        f2 = x
        x = InvertedResidual(c(24), strides=(2, 2), dtype=self.dtype)(x, train)  # /4
        x = InvertedResidual(c(24), dtype=self.dtype)(x, train)
        f4 = x
        x = InvertedResidual(c(40), strides=(2, 2), use_se=True, dtype=self.dtype)(x, train)  # /8
        x = InvertedResidual(c(40), use_se=True, dtype=self.dtype)(x, train)
        f8 = x
        x = InvertedResidual(c(96), strides=(2, 2), use_se=True, dtype=self.dtype)(x, train)  # /16
        x = InvertedResidual(c(96), use_se=True, dtype=self.dtype)(x, train)
        x = InvertedResidual(c(128), use_se=True, dtype=self.dtype)(x, train)
        f16 = x
        return f2, f4, f8, f16


class EASPP(nn.Module):
    """Efficient ASPP: parallel depthwise dilated branches + SE fusion --
    the TPU translation of MODNet's e-ASPP context head."""

    features: int
    rates: Sequence[int] = (1, 2, 4, 8)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        branches = []
        for r in self.rates:
            b = ConvBN(
                c, (3, 3), groups=c, dilation=(r, r), act=False, dtype=self.dtype
            )(x, train)
            branches.append(b)
        h = jnp.concatenate(branches, axis=-1)
        h = ConvBN(self.features, (1, 1), dtype=self.dtype)(h, train)
        return SEBlock(dtype=self.dtype)(h)


def nearest_x2(x: jnp.ndarray, times: int = 1) -> jnp.ndarray:
    """Cheap x2 nearest upsample (repeat); stays fusable in XLA."""
    for _ in range(times):
        b = x.shape[:-3]
        h, w, c = x.shape[-3:]
        x = jnp.broadcast_to(
            x[..., :, None, :, None, :], b + (h, 2, w, 2, c)
        ).reshape(b + (2 * h, 2 * w, c))
    return x
