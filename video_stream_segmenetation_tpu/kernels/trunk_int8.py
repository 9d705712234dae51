"""Fused int8 nano-trunk Pallas megakernel (everything between the stem
and the heads, one VMEM-resident pass per stream).

Motivation (tools/inspect_step_hlo.py census + HLO layout dump): XLA
lowers the trunk's s8 convs with an exotic {3,0,2,1} activation layout,
while Pallas custom-calls require default {3,2,1,0} layouts -- so every
XLA-conv <-> kernel boundary pays an s8 relayout copy (27 MB for the d2
skip, 72 MB for u1 into the heads), the d3-level conv epilogues
materialize 3x 37.7 MB s32 accumulators, and each custom-call is a
scheduling barrier.  Running the WHOLE decoder stack (d2dn -> d2b ->
d3dn -> d3b -> ctx -> SE -> u2red -> u1red) inside one kernel leaves a
single boundary on each side: the stem output (default layout, zero
copy) in, u1 out.

Layout strategy (every op here is Mosaic-probe-verified on v5e):
no strided value slicing exists in Mosaic, so stride-2 convs consume
QUAD-PARITY-FOLDED activations instead -- x0 rides as
``[18, 4, 32, 4*128]`` (a FREE row-major reshape of ``[72, 128, 128]``:
row%4 becomes an outer dim, col%4 folds into lanes).  Then:

* d2dn (stride 2, 3x3): each 36x64-grid output parity (py,px) reads 9
  taps, each a shift-padded lane-slice plane of x0 -- 36 small MXU dots.
* d2b (stride 1 on the 36x64 grid, parity form): the standard
  parity-conv routing -- tap (r,s) for output parity (dy,dx) sources
  plane ((dy+r-1)&1, (dx+s-1)&1) shifted by ((dy+r-1)>>1, ...).
* d3dn (stride 2 -> NATURAL 18x32): input rows 2i+r on the 36-grid are
  parity plane (r&1) at block i+(r>>1) -- no striding needed.
* d3b / ctx(dil 3) / SE: natural 18x32 ops.
* u2red/u1red (x2-upsample split convs): 1x1 convs commute with any
  pixel partition, so u2 STAYS in parity planes and u1 emerges as 16
  quad planes == the quad-folded output ``[18, 4, 32, 4*128]`` (a free
  reshape back to ``[72, 128, 128]`` outside).

Numerics are exact vs the XLA path (models/quantized.py) except inside
SE, where the f32 mean's accumulation order differs (worst case one
6/127-lattice step on values at a rounding knife edge); the parity test
pins alpha agreement (tests/test_kernels.py).

Role in the reference: the quantized flagship serving body
(model_q4f16.onnx, client/src/core/main.ts:6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RELU6_SCALE = 127.0 / 6.0
ACT_SCALE = 6.0 / 127.0


def _shift2(x, oy, ox):
    """out[i, j] = x[i + oy, j + ox], zero outside (SAME conv padding).

    x: [H, W, C]; oy/ox static ints.  Implemented as pad + slice (the
    only shift Mosaic supports); outer-dim (H) and sublane (W) only.
    """
    h, w = x.shape[0], x.shape[1]
    if oy:
        x = jnp.pad(x, ((max(-oy, 0), max(oy, 0)), (0, 0), (0, 0)))[
            max(oy, 0) : max(oy, 0) + h
        ]
    if ox:
        x = jnp.pad(x, ((0, 0), (max(-ox, 0), max(ox, 0)), (0, 0)))[
            :, max(ox, 0) : max(ox, 0) + w
        ]
    return x


def _dot_i8(x, w):
    """[M, K] s8 @ [K, N] s8 -> [M, N] i32 (exact, MXU s8 path)."""
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _requant(y):
    return jnp.round(jnp.clip(y, 0.0, 6.0) * RELU6_SCALE).astype(jnp.int8)


def _kernel(x0_ref, wd2dn_ref, md2dn_ref, wd2b_ref, md2b_ref,
            wd3dn_ref, md3dn_ref, wd3b_ref, md3b_ref, wctx_ref, mctx_ref,
            se0k_ref, se0b_ref, se1k_ref, se1b_ref,
            u2w_ref, mu2_ref, u1w_ref, mu1_ref,
            *refs, bh, bw, c0, c2, c3, head, fold):
    """One stream.  Shapes (nano plan, 720p/block-10: bh=18, bw=32,
    c0=128, c2=192, c3=256):

    x0_ref  [1, bh, 4, bw, 4*c0] s8   quad-folded stem output
    w*_ref  [3, 3, Cin, Cout] s8      conv weights
    m*_ref  [2, Cout] f32             rows: (mult, bias)
    se*_ref SE dense params f32
    u2w_ref [c3 + c2, c2] s8;  mu2 [2, c2] f32
    u1w_ref [c2 + c0, c0] s8;  mu1 [2, c0] f32

    head=False: refs = (out_ref,) with out_ref [1, bh, 4, bw, 4*c0] s8
    (quad-folded u1).
    head=True: refs = (va_ref, ma_ref, out_ref): the int8 3x3 alpha head
    runs in-kernel on the quad planes (u1 never leaves VMEM).  The 3x3
    conv over the 72-grid decomposes per output quad-parity qo=(qy,qx)
    into 9 taps, tap (r,s) sourcing quad plane ((qy+r-1)%4, ...) shifted
    by ((qy+r-1)//4, ...); grouping taps by source (ty, tx) in -1..4
    gives 36 dots [m, c0] @ va[ty+1, tx+1] with va [6, 6, c0, 16] s8
    (column qo carries walpha[ty-qy+1, tx-qx+1] or 0) -- exact s32, no
    column shuffling.  ma_ref [2, 16] f32 = (mult, bias) rows of the
    alpha head; out_ref [1, bh, bw, 16] f32 quad-folded logits.

    fold=True: the quad-parity fold happens IN VMEM instead of in XLA.
    x0_ref is the ROW-folded stem output [1, bh, 4, wp, c0] s8 (a free
    XLA bitcast of [hp, wp, c0]: only outer dims split, the minormost
    (wp, c0) tile is untouched -- so the pallas boundary is zero-copy),
    refs is prefixed with (perm_ref [wp, wp] s8 one-hot,) and suffixed
    with a scratch ref xp [bh, 4, wp, c0] s8.  The COLUMN parity fold
    (w%4 into lanes -- the 128->512 lane retiling XLA cannot bitcast
    and pays ~108 MB of HBM copy for at S=96) is done here as 4*bh
    one-hot MXU dots perm @ x0[i, qy] (exact s8 selection, ~0.04 ms at
    S=96): xp[i, qy, qx*bw + j] = x0[i, qy, 4j + qx], after which
    xplane(qy, qx) is an aligned sublane slice of xp.
    """
    m = bh * bw  # rows per parity plane

    if fold:
        perm_ref = refs[0]
        xp_ref = refs[-1]
        refs = refs[1:-1]
        perm = perm_ref[...]
        for i in range(bh):
            for qy in range(4):
                xp_ref[i, qy] = _dot_i8(perm, x0_ref[0, i, qy]).astype(
                    jnp.int8
                )

        def xplane(qy, qx):
            return xp_ref[:, qy, qx * bw : (qx + 1) * bw, :]  # [bh, bw, c0]

    else:

        def xplane(qy, qx):
            # [bh, bw, c0]
            return x0_ref[0, :, qy, :, qx * c0 : (qx + 1) * c0]

    # ---- d2dn: stride-2 3x3 over the 72-grid -> 36x64 parity planes.
    # SAME/stride-2 pads (0, 1): out[y] = sum_r in[2y + r], r in 0..2.
    mult, bias = md2dn_ref[0], md2dn_ref[1]
    d2p = [[None, None], [None, None]]
    for py in range(2):
        for px in range(2):
            acc = jnp.zeros((m, c2), jnp.int32)
            for r in range(3):
                ty = 2 * py + r  # 72-grid row offset within the quad
                for s in range(3):
                    tx = 2 * px + s
                    tap = _shift2(xplane(ty % 4, tx % 4), ty // 4, tx // 4)
                    acc += _dot_i8(tap.reshape(m, c0), wd2dn_ref[r, s])
            d2p[py][px] = _requant(acc.astype(jnp.float32) * mult + bias)

    # ---- d2b: stride-1 3x3 on the 36x64 grid, parity form.
    mult, bias = md2b_ref[0], md2b_ref[1]
    d2bp = [[None, None], [None, None]]
    for py in range(2):
        for px in range(2):
            acc = jnp.zeros((m, c2), jnp.int32)
            for r in range(3):
                ty = py + r - 1
                for s in range(3):
                    tx = px + s - 1
                    tap = _shift2(d2p[ty % 2][tx % 2].reshape(bh, bw, c2),
                                  ty // 2, tx // 2)
                    acc += _dot_i8(tap.reshape(m, c2), wd2b_ref[r, s])
            d2bp[py][px] = _requant(acc.astype(jnp.float32) * mult + bias)

    # ---- d3dn: stride-2 3x3, 36-grid -> NATURAL 18x32.
    # in rows 2i + r: parity r&1, block i + (r>>1) -- no striding.
    mult, bias = md3dn_ref[0], md3dn_ref[1]
    acc = jnp.zeros((m, c3), jnp.int32)
    for r in range(3):
        for s in range(3):
            tap = _shift2(d2bp[r % 2][s % 2].reshape(bh, bw, c2),
                          r // 2, s // 2)
            acc += _dot_i8(tap.reshape(m, c2), wd3dn_ref[r, s])
    d3 = _requant(acc.astype(jnp.float32) * mult + bias)  # [m, c3]

    # ---- d3b: stride-1 3x3 at 18x32.
    mult, bias = md3b_ref[0], md3b_ref[1]
    acc = jnp.zeros((m, c3), jnp.int32)
    for r in range(3):
        for s in range(3):
            tap = _shift2(d3.reshape(bh, bw, c3), r - 1, s - 1)
            acc += _dot_i8(tap.reshape(m, c3), wd3b_ref[r, s])
    d3 = _requant(acc.astype(jnp.float32) * mult + bias)

    # ---- ctx: dilation-3 3x3, no act; residual + relu6; SE.
    mult, bias = mctx_ref[0], mctx_ref[1]
    acc = jnp.zeros((m, c3), jnp.int32)
    for r in range(3):
        for s in range(3):
            tap = _shift2(d3.reshape(bh, bw, c3), 3 * (r - 1), 3 * (s - 1))
            acc += _dot_i8(tap.reshape(m, c3), wctx_ref[r, s])
    c3f = acc.astype(jnp.float32) * mult + bias
    ctx_f = jnp.clip(c3f + d3.astype(jnp.float32) * ACT_SCALE, 0.0, 6.0)
    s = jnp.mean(ctx_f, axis=0, keepdims=True)  # [1, c3]
    s = jax.nn.relu(s @ se0k_ref[...] + se0b_ref[...])
    s = s @ se1k_ref[...] + se1b_ref[...]
    ctx_f = ctx_f * jax.nn.sigmoid(s)
    ctx = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * RELU6_SCALE).astype(jnp.int8)

    # ---- u2red: x2 upsample + split 1x1 (models/quantized.py
    # split_conv_up semantics).  u2 stays in parity planes.
    mu2, bu2 = mu2_ref[0], mu2_ref[1]
    wa2, wb2 = u2w_ref[:c3], u2w_ref[c3:]
    yaf = _dot_i8(ctx, wa2).astype(jnp.float32) * mu2 + bu2  # [m, c2]
    u2p = [[None, None], [None, None]]
    for dy in range(2):
        for dx in range(2):
            yb = _dot_i8(d2bp[dy][dx], wb2).astype(jnp.float32) * mu2
            u2p[dy][dx] = _requant(yaf + yb)

    # ---- u1red: same, u1 emerges as 16 quad planes == the folded out.
    mu1, bu1 = mu1_ref[0], mu1_ref[1]
    wa1, wb1 = u1w_ref[:c2], u1w_ref[c2:]
    u1q = [[None] * 4 for _ in range(4)]
    for dy in range(2):
        for dx in range(2):
            yaf1 = _dot_i8(u2p[dy][dx], wa1).astype(jnp.float32) * mu1 + bu1
            for ey in range(2):
                for ex in range(2):
                    qy, qx = 2 * dy + ey, 2 * dx + ex
                    yb = _dot_i8(
                        xplane(qy, qx).reshape(m, c0), wb1
                    ).astype(jnp.float32) * mu1
                    u1q[qy][qx] = _requant(yaf1 + yb)

    if not head:
        out_ref = refs[0]
        for qy in range(4):
            for qx in range(4):
                out_ref[0, :, qy, :, qx * c0 : (qx + 1) * c0] = u1q[qy][
                    qx
                ].reshape(bh, bw, c0)
        return

    # ---- in-kernel int8 3x3 alpha head on the quad planes (K classes:
    # the 16 quad columns widen to 16*K, column qo*K + k).
    va_ref, ma_ref, out_ref = refs
    n = va_ref.shape[-1]
    acc = jnp.zeros((m, n), jnp.int32)
    for ty in range(-1, 5):
        for tx in range(-1, 5):
            tap = _shift2(
                u1q[ty % 4][tx % 4].reshape(bh, bw, c0), ty // 4, tx // 4
            )
            acc += _dot_i8(tap.reshape(m, c0), va_ref[ty + 1, tx + 1])
    logits = acc.astype(jnp.float32) * ma_ref[0] + ma_ref[1]
    out_ref[0] = logits.reshape(bh, bw, n)


@functools.partial(jax.jit, static_argnames=("interpret", "head", "fold"))
def _run(x0q, *consts, interpret, head, fold=False):
    if fold:
        # x0q is ROW-folded [s, bh, 4, wp, c0]; column fold runs in VMEM
        s, bh, _, wp, c0 = x0q.shape
        bw = wp // 4
        l = c0
    else:
        s, bh, _, bw, l = x0q.shape
        c0 = l // 4
        wp = bw
    c2 = consts[0].shape[-1]
    c3 = consts[4].shape[-1]
    kern = functools.partial(
        _kernel, bh=bh, bw=bw, c0=c0, c2=c2, c3=c3, head=head, fold=fold
    )

    def whole(x):
        return pl.BlockSpec(
            x.shape, lambda i: tuple(0 for _ in x.shape),
            memory_space=pltpu.VMEM,
        )

    if head:
        n = consts[-2].shape[-1]  # va [6, 6, c0, 16*K]
        out_spec = pl.BlockSpec(
            (1, bh, bw, n), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((s, bh, bw, n), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (1, bh, 4, bw, l), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((s, bh, 4, bw, l), jnp.int8)
    return pl.pallas_call(
        kern,
        grid=(s,),
        in_specs=[
            pl.BlockSpec(
                (1, bh, 4, wp, l), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [whole(c) for c in consts],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((bh, 4, wp, c0), jnp.int8)] if fold else []
        ),
        interpret=interpret,
    )(x0q, *consts)


def _mb(layer):
    """(mult, bias) rows as one [2, C] f32 array."""
    return jnp.stack([
        jnp.asarray(layer["mult"], jnp.float32).reshape(-1),
        jnp.asarray(layer["bias"], jnp.float32).reshape(-1),
    ])


def _trunk_consts(q):
    return (
        q["d2dn"]["wq"], _mb(q["d2dn"]),
        q["d2b"]["wq"], _mb(q["d2b"]),
        q["d3dn"]["wq"], _mb(q["d3dn"]),
        q["d3b"]["wq"], _mb(q["d3b"]),
        q["ctx"]["wq"], _mb(q["ctx"]),
        jnp.asarray(q["ctxse/Dense_0"]["kernel"], jnp.float32),
        jnp.asarray(q["ctxse/Dense_0"]["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(q["ctxse/Dense_1"]["kernel"], jnp.float32),
        jnp.asarray(q["ctxse/Dense_1"]["bias"], jnp.float32).reshape(1, -1),
        q["u2red"]["wq"].reshape(-1, q["u2red"]["wq"].shape[-1]),
        _mb(q["u2red"]),
        q["u1red"]["wq"].reshape(-1, q["u1red"]["wq"].shape[-1]),
        _mb(q["u1red"]),
    )


def fused_nano_trunk(x0, q, interpret=None):
    """x0 [S, H, W, C0] s8 (stem output, H%4 == W%4 == 0) + the nano
    qparams dict (models/quantized.py::quantize_mattenet_hd) -> u1
    [S, H, W, C0] s8.  Covers d2dn..u1red in one VMEM pass per stream.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, h, w, c0 = x0.shape
    x0q = x0.reshape(s, h // 4, 4, w // 4, 4 * c0)  # free row-major fold
    out = _run(x0q, *_trunk_consts(q), interpret=interpret, head=False)
    return out.reshape(s, h, w, c0)


def fused_nano_trunk_alpha_q(x0q, q, interpret=None):
    """As :func:`fused_nano_trunk_alpha`, but taking the stem output
    ALREADY quad-parity-folded (x0q [S, H/4, 4, W/4, 4*C0] s8 -- e.g.
    produced directly by the 5D-view stem dot in models/quantized.py so
    the 72 MB x0 relayout copy at the pallas boundary never exists)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, bh, _, bw, l = x0q.shape
    c0 = l // 4
    h, w = bh * 4, bw * 4
    va, ma = _alpha_head_consts(q, c0)
    k = q["alpha_q"]["wq"].shape[-1]
    out = _run(x0q, *_trunk_consts(q), va, ma,
               interpret=interpret, head=True)  # [S, bh, bw, 16*K]
    # unfold quad logits -> [S, H, W(, K)] (4.7 MB f32 transpose at K=1;
    # negligible)
    if k == 1:
        return (
            out.reshape(s, bh, bw, 4, 4)
            .transpose(0, 1, 3, 2, 4)
            .reshape(s, h, w)
        )
    return (
        out.reshape(s, bh, bw, 4, 4, k)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(s, h, w, k)
    )


def _alpha_head_consts(q, c0):
    wq = q["alpha_q"]["wq"]  # [3, 3, c0, K]
    k = wq.shape[-1]
    # va[tyc, txc, :, qo*K + kc] = walpha[tyc - qy, txc - qx, :, kc] (or 0
    # outside the 3x3 window), qo = 4*qy + qx -- see _kernel docstring.
    # K classes widen the quad columns; the dot stays a single [m, c0] @
    # [c0, 16*K] (64 lanes at K=4 -- still one MXU pass).
    wpad = jnp.pad(wq, ((3, 3), (3, 3), (0, 0), (0, 0)))  # [9, 9, c0, K]
    va = jnp.stack([
        jnp.stack([
            jnp.concatenate([
                wpad[tyc - (qo // 4) + 3, txc - (qo % 4) + 3]
                for qo in range(16)
            ], axis=-1)
            for txc in range(6)
        ])
        for tyc in range(6)
    ])  # [6, 6, c0, 16*K]
    mult = jnp.asarray(q["alpha_q"]["mult"], jnp.float32).reshape(-1)
    bias = jnp.asarray(q["alpha_q"]["bias"], jnp.float32).reshape(-1)
    if mult.shape[0] == 1 and k > 1:
        mult = jnp.broadcast_to(mult, (k,))
    if bias.shape[0] == 1 and k > 1:
        bias = jnp.broadcast_to(bias, (k,))
    ma = jnp.stack([
        jnp.tile(mult, 16),  # column qo*K + kc -> per-class epilogue
        jnp.tile(bias, 16),
    ])
    return va, ma


def fused_nano_trunk_alpha(x0, q, interpret=None):
    """As :func:`fused_nano_trunk`, but with the int8 3x3 alpha head
    fused in -- u1 never leaves VMEM.  Returns the alpha LOGITS at u1
    resolution, [S, H, W] f32 for one class / [S, H, W, K] for K classes
    (exact s32 conv + the same f32 epilogue as
    models/quantized.py::_conv_i8)."""
    s, h, w, c0 = x0.shape
    x0q = x0.reshape(s, h // 4, 4, w // 4, 4 * c0)
    return fused_nano_trunk_alpha_q(x0q, q, interpret=interpret)


@functools.lru_cache(maxsize=4)
def _col_fold_perm_np(wp: int):
    """One-hot [wp, wp] s8 permutation for the in-VMEM column parity
    fold: row d = qx*bw + j selects source column 4*j + qx (bw = wp//4),
    so perm @ x[wp, c0] regroups w%4 into contiguous bw-blocks.

    Cached as HOST numpy: jnp.asarray inside a jit trace yields a
    TRACER, and caching that leaks it into later traces
    (UnexpectedTracerError when a second program reuses the entry)."""
    import numpy as np

    bw = wp // 4
    perm = np.zeros((wp, wp), np.int8)
    d = np.arange(wp)
    perm[d, 4 * (d % bw) + d // bw] = 1
    return perm


def _col_fold_perm(wp: int):
    return jnp.asarray(_col_fold_perm_np(wp))


def fused_nano_trunk_alpha_rowfold(x0r, q, interpret=None):
    """As :func:`fused_nano_trunk_alpha_q`, but taking the stem output
    only ROW-folded (x0r [S, H/4, 4, W, C0] s8 -- a FREE bitcast of
    [S, H, W, C0]: only outer dims split, the minormost (W, C0) tile is
    untouched).  The column parity fold -- the 128->512 lane retiling
    XLA cannot bitcast and pays a ~108 MB HBM copy for at S=96 when the
    stem requant sits in a kOutput dot fusion (commit ec901c6 probe) --
    happens INSIDE the kernel as one-hot MXU dots over a [W, W] s8
    permutation (exact s8 selection)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, bh, _, wp, c0 = x0r.shape
    bw = wp // 4
    h, w = bh * 4, wp
    va, ma = _alpha_head_consts(q, c0)
    k = q["alpha_q"]["wq"].shape[-1]
    out = _run(x0r, *_trunk_consts(q), _col_fold_perm(wp), va, ma,
               interpret=interpret, head=True, fold=True)
    if k == 1:
        return (
            out.reshape(s, bh, bw, 4, 4)
            .transpose(0, 1, 3, 2, 4)
            .reshape(s, h, w)
        )
    return (
        out.reshape(s, bh, bw, 4, 4, k)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(s, h, w, k)
    )
