"""Pallas int8 fused 3x3 conv kernel for the MatteNetHD serving trunk.

The int8 model body is the dominant step cost (benchmarks/RESULTS.md:
~10.5 of 16.95 ms at S=64); XLA's s8xs8->s32 convs measured ~209
TFLOP/s-equiv with an f32 dequant epilogue materialized between layers.
This kernel fuses, per conv: the 9-tap int8 matmul accumulation (int32),
the per-channel dequant multiply + bias, an optional int8 residual add,
relu6, and requantization onto the 6/127 lattice -- input and output stay
int8 end to end, so inter-layer traffic is 1 byte/elem and the MXU sees
back-to-back s8 matmuls.

Formulation (9-matmul im2col-free): for tap (dy, dx)

    acc += X_pad[h+dy, dx : dx+W, :] @ W[dy, dx]     (per row block)

with X resident in VMEM ([H+2, W+2, C] int8; 72x128x128 = 1.2 MB, well
inside the ~16 MB budget), weights [3, 3, C, C'] int8 in VMEM, output
[H, W, C'] int8.  The row dimension folds into the matmul M axis by
reshaping [H, W, C] -> [H*W, C] (leading-dim merge; W stays the sublane
axis so no relayout).

Mosaic constraints observed (ARCHITECTURE.md): no scatter, no
center-slice-then-pad -- the halo pad happens OUTSIDE the kernel (XLA
fuses it into the producer); slices here are plain contiguous reads.

Stride-2 variant: stride-2 3x3 convs decompose into 4 parity planes
(even/odd rows x cols) each seeing a subset of taps; served by XLA for
now (they are ~7% of model FLOPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RELU6_SCALE = 127.0 / 6.0


def _kernel(x_ref, w_ref, mult_ref, bias_ref, res_ref, out_ref, *, h, w,
            cin, cout, with_residual, act, dil=1):
    """One stream's fused conv.  x_ref: [H+2d, W+2d, Cin] int8
    (pre-padded by the dilation d); w_ref: [9, Cin, Cout] int8;
    mult/bias: [1, Cout] f32; res_ref: [H, W, Cout] int8 or None;
    out_ref: [H, W, Cout] int8."""
    acc = jnp.zeros((h * w, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            # rows [dy*d, dy*d+h), cols [dx*d, dx*d+w): contiguous slice
            # of the padded plane; reshape merges (h, w) into the matmul
            # M axis
            a = x_ref[0, dy * dil:dy * dil + h, dx * dil:dx * dil + w, :]
            a = a.reshape(h * w, cin)
            wk = w_ref[dy * 3 + dx]
            acc = acc + jax.lax.dot_general(
                a, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    y = acc.astype(jnp.float32) * mult_ref[0] + bias_ref[0]
    if with_residual:
        y = y + res_ref[0].reshape(h * w, cout).astype(jnp.float32) * (6.0 / 127.0)
    if act:
        y = jnp.clip(y, 0.0, 6.0)
        out_ref[0] = jnp.round(y * RELU6_SCALE).astype(jnp.int8).reshape(h, w, cout)
    else:
        # no-act variant returns the 6/127-lattice quantization of the
        # *linear* output clamped to int8 range (callers keep f32 path
        # for heads; this variant exists for symmetric epilogues)
        out_ref[0] = jnp.clip(
            jnp.round(y * RELU6_SCALE), -127, 127
        ).astype(jnp.int8).reshape(h, w, cout)


@functools.partial(
    jax.jit, static_argnames=("with_residual", "act", "dilation", "interpret")
)
def conv3x3_i8_fused(
    x_i8: jnp.ndarray,
    wq: jnp.ndarray,
    mult: jnp.ndarray,
    bias: jnp.ndarray,
    residual: jnp.ndarray | None = None,
    with_residual: bool = False,
    act: bool = True,
    dilation: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 3x3 SAME conv + dequant + [residual] + relu6 + requant.

    x_i8 ``[S, H, W, Cin]`` int8 (6/127-lattice activations); wq
    ``[3, 3, Cin, Cout]`` int8; mult/bias ``[Cout]`` f32 (mult = sx*sw per
    channel).  residual: ``[S, H, W, Cout]`` int8 on the same lattice.
    Returns ``[S, H, W, Cout]`` int8 on the 6/127 lattice.

    Numerics == models/quantized.py::_requant(_conv_i8(...) [+ res]),
    including the dilated (rhs_dilation) variants used by the context
    block (dilation=2/4).
    """
    s, h, w, cin = x_i8.shape
    cout = wq.shape[-1]
    d = int(dilation)
    xp = jnp.pad(x_i8, ((0, 0), (d, d), (d, d), (0, 0)))
    w9 = wq.reshape(9, cin, cout)
    mult2 = mult.reshape(1, cout).astype(jnp.float32)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)
    res = residual if with_residual else jnp.zeros((s, 1, 1, cout), jnp.int8)

    kern = functools.partial(
        _kernel, h=h, w=w, cin=cin, cout=cout,
        with_residual=with_residual, act=act, dil=d,
    )
    grid = (s,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2 * d, w + 2 * d, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec(
                (1, h if with_residual else 1, w if with_residual else 1, cout),
                lambda i: (i, 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, h, w, cout), jnp.int8),
        interpret=interpret,
    )(xp, w9, mult2, bias2, res)
