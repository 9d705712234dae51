"""Fused int8 decoder-level Pallas kernel (split_conv_up in one pass).

The plan C/D/E int8 decoders compute, per level (models/quantized.py::
split_conv_up):

    out = requant( nearest_x2(small @ Wa * mult + bias) + skip @ Wb * mult )

XLA executes this as two s8 convs plus an f32 broadcast/add/requant
chain whose intermediates all materialize at the BIG resolution -- at
the u1 level ([S,72,128,128]) that is ~1.2 GB of f32 HBM traffic and
1.59 ms of the 3.4 ms trunk forward (tools/bench_trunk_layers.py,
2026-08-17).  This kernel runs the whole level VMEM-resident, one
program per stream: two int8 MXU matmuls, the x2 nearest upsample as a
4-parity loop, and the relu6/127-lattice requant -- int8 in, int8 out,
1 byte/elem of HBM traffic at each boundary.

Layout trick (VMEM-tiling-safe): the big-res skip and output ride as
``[S, sh, 2, sw, 2*C]`` -- a zero-cost row-major reshape of
``[S, 2*sh, 2*sw, C]`` (row parity becomes a free leading dim; column
parity folds into the LANE axis, so the per-parity views are contiguous
lane slices ``[..., dx*C:(dx+1)*C]``).  A naive ``[.., 2, sw, 2, C]``
block form puts a size-2 dim in the sublane slot and pads 16x,
OOM-ing VMEM (observed: 27.5 MB for a 1.2 MB block).

Numerics are bit-exact vs the XLA path: the matmuls accumulate in s32,
and the f32 epilogue (mult, bias, add, clip, round) applies in the same
order (tests/test_kernels.py::test_decoder_level_fused_matches_xla).

Role in the reference: part of the quantized flagship serving body
(model_q4f16.onnx, client/src/core/main.ts:6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RELU6_SCALE = 127.0 / 6.0


def _kernel(small_ref, skip_ref, wa_ref, wb_ref, mult_ref, bias_ref,
            out_ref, *, sh, sw, ca, cb, cout, mxu):
    """One stream's decoder level.

    small_ref: [1, sh, sw, ca] int8; skip_ref: [1, sh, 2, sw, 2*cb] int8
    (parity-folded big-res skip); wa: [ca, cout] int8; wb: [cb, cout]
    int8; mult/bias: [1, cout] f32; out_ref: [1, sh, 2, sw, 2*cout] int8.

    ``mxu`` selects the matmul path: 's8' (s8xs8->s32, the default) or
    'bf16' (s8 values cast to bf16, f32 accumulation).  The bf16 path
    is BIT-EXACT for this op class: s8 values are exactly representable
    in bf16, each product (<= 127*127) is exact in the MXU's f32
    product, and the f32 accumulation stays integral below 2^24 (max
    |sum| here is K*127^2 = 192*16129 ~= 3.1e6).  Measured isolated at
    the u1 level (S=64): s8 0.172 ms, bf16 0.215 ms -- Mosaic's s8 dot
    is already the faster lowering here, so s8 stays the default and
    bf16 is kept as a documented probe.
    """
    mult = mult_ref[0]
    bias = bias_ref[0]

    def dot(x, w_ref):
        if mxu == "bf16":
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    a = small_ref[0].reshape(sh * sw, ca)
    yaf = dot(a, wa_ref) * mult + bias  # [sh*sw, cout] f32, exact ints pre-scale

    for dy in range(2):
        row = skip_ref[0, :, dy]  # [sh, sw, 2*cb]
        for dx in range(2):
            b = row[..., dx * cb : (dx + 1) * cb].reshape(sh * sw, cb)
            y = yaf + dot(b, wb_ref) * mult
            q = jnp.round(jnp.clip(y, 0.0, 6.0) * RELU6_SCALE).astype(jnp.int8)
            out_ref[0, :, dy, :, dx * cout : (dx + 1) * cout] = q.reshape(
                sh, sw, cout
            )


@functools.partial(jax.jit, static_argnames=("interpret", "mxu"))
def _run(small, skip_pf, wa, wb, mult, bias, *, interpret, mxu):
    s, sh, sw, ca = small.shape
    cb = skip_pf.shape[-1] // 2
    cout = wa.shape[-1]
    kern = functools.partial(
        _kernel, sh=sh, sw=sw, ca=ca, cb=cb, cout=cout, mxu=mxu
    )
    return pl.pallas_call(
        kern,
        grid=(s,),
        in_specs=[
            pl.BlockSpec(
                (1, sh, sw, ca), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sh, 2, sw, 2 * cb), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ca, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sh, 2, sw, 2 * cout), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((s, sh, 2, sw, 2 * cout), jnp.int8),
        interpret=interpret,
    )(small, skip_pf, wa, wb, mult, bias)


def fused_decoder_level(small, skip, layer, interpret=None, mxu="s8"):
    """requant(nearest_x2(conv1x1_a(small)) + conv1x1_b(skip)) fused.

    small: [S, sh, sw, Ca] int8; skip: [S, 2*sh, 2*sw, Cb] int8;
    layer: {"wq": [1, 1, Ca+Cb, Cout] int8, "mult": [Cout] f32,
    "bias": [Cout] f32} (models/quantized.py split layout: the first Ca
    input channels are the up path).  Returns [S, 2*sh, 2*sw, Cout] int8.

    mxu='bf16' (default) computes the matmuls as bf16 x bf16 -> f32 --
    bit-exact for s8 operands at these contraction depths (see _kernel)
    and much faster than Mosaic's s8 dot lowering on this chip; 's8'
    keeps the literal int8 MXU path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, sh, sw, ca = small.shape
    _, bh, bw, cb = skip.shape
    if (bh, bw) != (2 * sh, 2 * sw):
        raise ValueError(f"skip {skip.shape} is not the x2 of small {small.shape}")
    wq = layer["wq"].reshape(ca + cb, -1)
    wa, wb = wq[:ca], wq[ca:]
    mult = layer["mult"].reshape(1, -1).astype(jnp.float32)
    bias = layer["bias"].reshape(1, -1).astype(jnp.float32)
    skip_pf = skip.reshape(s, sh, 2, sw, 2 * cb)  # row-major no-op reshape
    out_pf = _run(small, skip_pf, wa, wb, mult, bias, interpret=interpret,
                  mxu=mxu)
    return out_pf.reshape(s, bh, bw, -1)
