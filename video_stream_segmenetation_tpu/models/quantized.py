"""int8 serving graph for MatteNetHD plan B (the quantized flagship).

The reference ships its flagship as a *quantized* model (model_q4f16.onnx,
client/src/core/main.ts:6) and treats quantized inference as the serving
default; this is the TPU equivalent: symmetric per-output-channel int8
weights + static int8 activations, executed on the MXU's s8xs8->s32 path
(measured 209 vs 118 TFLOP/s-equiv on v5e for the 3x3/128ch conv class,
/tmp/int8_conv probe 2026-08-16).

Design (post-training static quantization -- no calibration pass needed):

* every trunk activation is a relu6 output, so the activation scale is a
  *constant* 6/127 everywhere: requantization is one fused multiply.
* BatchNorm folds into the conv weights/bias before weight quantization
  (per-output-channel scales keep the fold lossless to ~1e-3).
* elementwise segments (SE gating, residual adds, the alpha head) stay
  float: they fuse into conv epilogues, and the head's logits need the
  dynamic range.
* the uint8 packed stem stays a bf16 matmul (it is ~0.3 ms and its /255
  input scale does not match the relu6 lattice).

`quantize_mattenet_hd(model, params)` converts a trained flax checkpoint
(no retraining); `QuantizedMatteNetHD.apply(qparams, frames)` mirrors the
bundle interface so the pipeline swaps it in via
``PipelineStatics.matting_precision = 'int8'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu.models.mattenet_hd import NANO_WIDTHS

ACT_SCALE = 6.0 / 127.0  # relu6 output lattice


def _fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    inv = bn_scale / np.sqrt(bn_var + eps)
    w = np.asarray(kernel, np.float64) * inv[None, None, None, :]
    b = np.asarray(bn_bias, np.float64) - np.asarray(bn_mean, np.float64) * inv
    return w, b


def _quant_w(w):
    """Per-output-channel symmetric int8."""
    amax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
    sw = amax / 127.0
    q = np.clip(np.round(w / sw[None, None, None, :]), -127, 127).astype(np.int8)
    return q, sw


def _qconvbn(tree, path, stats, sx):
    """ConvBN params at `path` -> {'wq', 'mult', 'bias'} with input scale sx."""
    conv = tree
    st = stats
    for p in path:
        conv = conv[p]
        st = st[p]
    k = np.asarray(conv["Conv_0"]["kernel"], np.float64)
    bn = conv["BatchNorm_0"]
    bst = st["BatchNorm_0"]
    w, b = _fold_bn(
        k, np.asarray(bn["scale"], np.float64), np.asarray(bn["bias"], np.float64),
        np.asarray(bst["mean"], np.float64), np.asarray(bst["var"], np.float64),
    )
    wq, sw = _quant_w(w)
    return {
        "wq": jnp.asarray(wq),
        "mult": jnp.asarray((sx * sw).astype(np.float32)),
        "bias": jnp.asarray(b.astype(np.float32)),
    }


def _conv_i8(x_i8, layer, strides=(1, 1), dilation=(1, 1)):
    """int8 conv + dequantized float epilogue input: returns f32 pre-act."""
    y = jax.lax.conv_general_dilated(
        x_i8, layer["wq"], strides, "SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * layer["mult"] + layer["bias"]


def _requant(y_f32):
    """relu6 + quantize onto the 6/127 lattice."""
    y = jnp.clip(y_f32, 0.0, 6.0)
    return jnp.round(y * (127.0 / 6.0)).astype(jnp.int8)


def _se_f32(x_f32, dense0, dense1):
    s = jnp.mean(x_f32, axis=(-3, -2), keepdims=True)
    s = jax.nn.relu(s @ dense0["kernel"] + dense0["bias"])
    s = s @ dense1["kernel"] + dense1["bias"]
    return x_f32 * jax.nn.sigmoid(s)


def _qconv(x_i8, layer, conv_impl="xla", dilation=1, interpret=None):
    """int8 3x3/1x1 conv + relu6 requant, routed to XLA or the fused
    Pallas kernel (kernels/conv_int8.py) per ``conv_impl``.  Only
    stride-1 3x3 convs are Pallas-eligible; everything else stays XLA."""
    if conv_impl == "pallas" and layer["wq"].shape[:2] == (3, 3):
        import jax as _jax

        from video_stream_segmenetation_tpu.kernels.conv_int8 import (
            conv3x3_i8_fused,
        )

        if interpret is None:
            interpret = _jax.default_backend() != "tpu"
        return conv3x3_i8_fused(
            x_i8, layer["wq"], layer["mult"], layer["bias"],
            dilation=dilation, interpret=interpret,
        )
    return _requant(_conv_i8(x_i8, layer, dilation=(dilation, dilation)))


def _block(x_i8, lp, stats, pfx, conv_impl="xla"):
    """_Block: ConvBN(act) -> ConvBN(no act) -> [SE] -> +res -> relu6."""
    h = _qconv(x_i8, lp[pfx + "/ConvBN_0"], conv_impl)
    y = _conv_i8(h, lp[pfx + "/ConvBN_1"])  # f32, no act
    if pfx + "/SEBlock_0/Dense_0" in lp:
        y = _se_f32(
            y, lp[pfx + "/SEBlock_0/Dense_0"], lp[pfx + "/SEBlock_0/Dense_1"]
        )
    y = y + x_i8.astype(jnp.float32) * ACT_SCALE  # residual (same width)
    return _requant(y)


def _nearest_x2(x):
    b = x.shape[:-3]
    h, w, c = x.shape[-3:]
    return jnp.broadcast_to(
        x[..., :, None, :, None, :], b + (h, 2, w, 2, c)
    ).reshape(b + (2 * h, 2 * w, c))


def quantize_mattenet_hd(model, params):
    """Trained plan-B MatteNetHD flax params -> int8 serving qparams.

    Returns a pytree of device arrays; feed to QuantizedMatteNetHD.apply.
    """
    if model.stem_stride < 8:
        raise ValueError("int8 serving path targets plan B (stem_stride >= 8)")
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    st = jax.tree_util.tree_map(np.asarray, params["batch_stats"])

    q = {}
    # stem stays bf16 (u8-scale input); fold its BN into matmul scale/bias
    k = np.asarray(p["ConvBN_0"]["Conv_0"]["kernel"], np.float64)
    bn, bst = p["ConvBN_0"]["BatchNorm_0"], st["ConvBN_0"]["BatchNorm_0"]
    w, b = _fold_bn(
        k, np.asarray(bn["scale"], np.float64), np.asarray(bn["bias"], np.float64),
        np.asarray(bst["mean"], np.float64), np.asarray(bst["var"], np.float64),
    )
    ss = model.stem_stride
    wm = w.reshape(ss * ss * 3, -1) / 255.0  # applied to u8-scale input
    q["stem_w"] = jnp.asarray(wm.astype(np.float32)).astype(jnp.bfloat16)
    q["stem_b"] = jnp.asarray(b.astype(np.float32))
    # int8 stem variant (stem_impl='int8'): the uint8 input shifts to s8
    # via x - 128 (a free xor+bitcast), the matmul runs on the MXU s8
    # path, and the +128 shift folds into the bias:
    #   x @ W == (x - 128) @ (Wq * sw) + 128 * colsum(Wq) * sw
    amax = np.maximum(np.abs(wm).max(axis=0), 1e-12)
    sw = amax / 127.0
    wq8 = np.clip(np.round(wm / sw[None, :]), -127, 127).astype(np.int8)
    q["stem_wq"] = jnp.asarray(wq8)
    q["stem_mult"] = jnp.asarray(sw.astype(np.float32))
    q["stem_b2"] = jnp.asarray(
        (b + 128.0 * sw * wq8.astype(np.float64).sum(axis=0)).astype(np.float32)
    )

    def cb(name, path):
        q[name] = _qconvbn(p, path, st, ACT_SCALE)

    plan = getattr(model, "decoder", "full")
    if plan in NANO_WIDTHS:
        # plan E module order (mattenet_hd.py::_plan_d docstring)
        blocks = ()
        cb("d2dn", ("ConvBN_1",))
        cb("d2b", ("ConvBN_2",))
        cb("d3dn", ("ConvBN_3",))
        cb("d3b", ("ConvBN_4",))
        cb("ctx", ("ConvBN_5",))
        cb("u2red", ("ConvBN_6",))
        cb("u1red", ("ConvBN_7",))
    elif plan == "micro":
        # plan D module order (mattenet_hd.py::_plan_d docstring)
        blocks = (("_Block_0", "d2b"), ("_Block_1", "d3b"))
        cb("d2dn", ("ConvBN_1",))
        cb("d3dn", ("ConvBN_2",))
        cb("ctx", ("ConvBN_3",))
        cb("u2red", ("ConvBN_4",))
        cb("u1red", ("ConvBN_5",))
    elif plan == "light":
        # plan C module order (mattenet_hd.py::_plan_c docstring)
        blocks = (("_Block_0", "d2b"), ("_Block_1", "d3b"))
        cb("b1c", ("ConvBN_1",))
        cb("d2dn", ("ConvBN_2",))
        cb("d3dn", ("ConvBN_3",))
        cb("ctx2", ("ConvBN_4",))
        cb("ctx4", ("ConvBN_5",))
        cb("u2red", ("ConvBN_6",))
        cb("u2", ("ConvBN_7",))
        cb("u1red", ("ConvBN_8",))
    else:
        blocks = (("_Block_0", "b1"), ("_Block_1", "d2b"), ("_Block_2", "d3b"))
        cb("d2dn", ("ConvBN_1",))
        cb("d3dn", ("ConvBN_2",))
        cb("ctx2", ("ConvBN_3",))
        cb("ctx4", ("ConvBN_4",))
        cb("u2", ("ConvBN_5",))
        cb("u1", ("ConvBN_6",))
    for blk, pfx in blocks:
        q[pfx + "/ConvBN_0"] = _qconvbn(p, (blk, "ConvBN_0"), st, ACT_SCALE)
        q[pfx + "/ConvBN_1"] = _qconvbn(p, (blk, "ConvBN_1"), st, ACT_SCALE)
        if "SEBlock_0" in p[blk]:
            for d in ("Dense_0", "Dense_1"):
                dd = p[blk]["SEBlock_0"][d]
                q[f"{pfx}/SEBlock_0/{d}"] = {
                    "kernel": jnp.asarray(dd["kernel"], jnp.float32),
                    "bias": jnp.asarray(dd["bias"], jnp.float32),
                }
    for d in ("Dense_0", "Dense_1"):
        dd = p["SEBlock_0"][d]
        q[f"ctxse/{d}"] = {
            "kernel": jnp.asarray(dd["kernel"], jnp.float32),
            "bias": jnp.asarray(dd["bias"], jnp.float32),
        }
    # float heads
    for name, cv in (("sem", "Conv_0"), ("det", "Conv_1"), ("alpha", "Conv_2")):
        q[name] = {
            "kernel": jnp.asarray(p[cv]["kernel"], jnp.float32),
            "bias": jnp.asarray(p[cv]["bias"], jnp.float32),
        }
    # int8 head variants (head_impl='int8'): the alpha/det heads read u1
    # as int8 directly, so the [S,72,128,C] bf16 dequant view (u1f) never
    # materializes (144 MB at S=64; HLO census tools/inspect_trunk_hlo.py)
    for name, cv in (("det_q", "Conv_1"), ("alpha_q", "Conv_2")):
        ka = np.asarray(p[cv]["kernel"], np.float64)  # [kh,kw,C,K]
        wq, sw = _quant_w(ka)
        q[name] = {
            "wq": jnp.asarray(wq),
            "mult": jnp.asarray((ACT_SCALE * sw).astype(np.float32)),
            "bias": jnp.asarray(np.asarray(p[cv]["bias"], np.float32)),
        }
    return q


class QuantizedMatteNetHD:
    """Bundle-compatible int8 serving graph (apply(qparams, x) -> dict).

    num_classes > 1 serves the multiclass configuration (BASELINE
    config 5): same int8 trunk, K-channel heads, per-class planar
    upsample, softmax over the class axis."""

    def __init__(self, stem_stride: int, head_upsample: int,
                 num_classes: int = 1, decoder: str = "full",
                 conv_impl: str = "xla", decoder_impl: str = "auto",
                 stem_impl: str = "bf16", head_impl: str = "int8",
                 trunk_fold: str = "xla"):
        self.stem_stride = stem_stride
        self.head_upsample = head_upsample
        self.num_classes = num_classes
        self.decoder = decoder
        # 'xla' | 'pallas': stride-1 3x3 trunk convs through the fused
        # Pallas int8 kernel (kernels/conv_int8.py) -- int8 in/out, no
        # materialized f32 epilogue between layers
        self.conv_impl = conv_impl
        # 'xla' | 'pallas': the 1x1 decoder levels through the fused
        # VMEM-resident kernel (kernels/decoder_int8.py) -- removes the
        # big-resolution f32 broadcast/add/requant intermediates
        self.decoder_impl = decoder_impl
        # 'bf16' | 'int8': the patch-matmul stem.  'int8' shifts the
        # uint8 input to s8 (x - 128 = xor 128 + bitcast, folds the
        # shift into the bias) and contracts on the MXU s8 path --
        # no bf16 input cast ever materializes.  Weight quantization is
        # per-output-channel (same relative error class as bf16 weights)
        self.stem_impl = stem_impl
        # 'bf16' | 'int8': the alpha/det heads.  'int8' convolves the s8
        # u1 activation directly (per-output-channel s8 head weights, f32
        # logits out) -- the 144 MB bf16 dequant of u1 never materializes
        self.head_impl = head_impl
        # 'xla' | 'vmem': where the megakernel's quad-parity input fold
        # happens.  'xla' reshapes x0 [S,H,W,C0] -> [S,H/4,4,W/4,4C0] in
        # XLA (a 128->512 lane retiling XLA cannot bitcast: ~108 MB HBM
        # copy at S=96 because the stem requant is the dot's kOutput
        # fusion, which can't absorb a retiling reshape -- commit
        # ec901c6 probe).  'vmem' hands the kernel the FREE row-folded
        # bitcast [S,H/4,4,W,C0] and folds columns in VMEM via one-hot
        # MXU dots (kernels/trunk_int8.py::fused_nano_trunk_alpha_rowfold)
        self.trunk_fold = trunk_fold

    # the pipeline may ride extra one-hot gather columns on the stem
    # matmul (``stem_aux_cols``) -- see guide_s2d_sel in ops/layout.py
    supports_stem_aux = True
    # apply() also emits 'alpha_logit_lr' (head-grid pre-upsample
    # logits): the fused refine kernel can take those and run the
    # bilinear upsample + sigmoid in VMEM (refine_alpha_src='lowres' --
    # the [S, mask_hw] f32 alpha then never exists in HBM; XLA
    # dead-code-eliminates whichever output the pipeline doesn't read)
    supports_lowres_alpha = True

    def apply(self, q, x, train: bool = False, stem_aux_cols=None):
        ss = self.stem_stride
        if x.shape[-1] != 3 * ss * ss:
            from video_stream_segmenetation_tpu.ops.layout import space_to_depth

            if x.dtype != jnp.uint8:
                x = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
            x = space_to_depth(x, ss)
        # stem: patch matmul + folded BN -> relu6 lattice
        stem_aux = None
        if self.stem_impl == "int8" and x.dtype == jnp.uint8 and "stem_wq" in q:
            xs = jax.lax.bitcast_convert_type(x ^ jnp.uint8(128), jnp.int8)
            y = jax.lax.dot_general(
                xs, q["stem_wq"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            x0 = _requant(
                y.astype(jnp.float32) * q["stem_mult"] + q["stem_b2"]
            )
            if stem_aux_cols is not None:
                # aux columns can't ride the s8 dot (u8 taps overflow s8);
                # run them as their own dot off the same input
                stem_aux = (
                    x.astype(jnp.bfloat16) @ stem_aux_cols.astype(jnp.bfloat16)
                ).astype(jnp.uint8)
        elif stem_aux_cols is not None:
            # single dot: stem columns + one-hot gather columns.  Each
            # output column of a dot is an independent contraction, so
            # the stem half is bit-identical to the stem-only matmul and
            # the aux half is the exact u8 tap (u8 values and a one-tap
            # one-hot product are exact in bf16).  One read (and one
            # dot-layout copy) of the 169 MB packed frames instead of
            # two -- the guide gather's own full-tensor relayout vanishes
            # (HLO census 2026-08-18: 2x u8[64,72,128,300] copy fusions).
            nc = q["stem_w"].shape[1]
            w = jnp.concatenate(
                [q["stem_w"], stem_aux_cols.astype(jnp.bfloat16)], axis=1
            )
            y = x.astype(jnp.bfloat16) @ w
            stem_aux = y[..., nc:].astype(jnp.uint8)
            x0 = _requant(y[..., :nc].astype(jnp.float32) + q["stem_b"])
        else:
            y = x.astype(jnp.bfloat16) @ q["stem_w"]
            x0 = _requant(y.astype(jnp.float32) + q["stem_b"])

        ci = self.conv_impl
        if self.decoder in ("micro", *NANO_WIDTHS):
            # plans D/E/F: stem feeds d2dn AND the u1 skip directly
            b1 = x0
            d2 = _requant(_conv_i8(x0, q["d2dn"], strides=(2, 2)))
        else:
            if self.decoder == "light":
                b1 = _qconv(x0, q["b1c"], ci)  # plan C: single conv
            else:
                b1 = _block(x0, q, None, "b1", ci)
            d2 = _requant(_conv_i8(b1, q["d2dn"], strides=(2, 2)))
        if self.decoder in NANO_WIDTHS:
            # plans E/F: single convs instead of residual blocks
            d2 = _qconv(d2, q["d2b"], ci)
            d3 = _requant(_conv_i8(d2, q["d3dn"], strides=(2, 2)))
            d3 = _qconv(d3, q["d3b"], ci)
        else:
            d2 = _block(d2, q, None, "d2b", ci)
            d3 = _requant(_conv_i8(d2, q["d3dn"], strides=(2, 2)))
            d3 = _block(d3, q, None, "d3b", ci)

        if self.decoder in ("micro", *NANO_WIDTHS):
            c3 = _conv_i8(d3, q["ctx"], dilation=(3, 3))  # no act
            ctx_f = jax.nn.relu6(c3 + d3.astype(jnp.float32) * ACT_SCALE)
        else:
            c2 = _qconv(d3, q["ctx2"], ci, dilation=2)
            c4 = _conv_i8(c2, q["ctx4"], dilation=(4, 4))  # no act
            ctx_f = jax.nn.relu6(c4 + d3.astype(jnp.float32) * ACT_SCALE)
        ctx_f = _se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
        ctx = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)).astype(jnp.int8)

        sem_logit = ctx_f @ q["sem"]["kernel"][0, 0] + q["sem"]["bias"]

        # decoder convs over concat(skip, up) run as SPLIT convs:
        # conv(concat(a, b)) == conv_a(a) + conv_b(b) with the weight
        # sliced along input channels -- identical numerics, but the int8
        # concat tensor never materializes (13.5 -> 10.5 ms/64-batch fwd)
        def split_conv(up, skip, layer):
            ca = up.shape[-1]
            la = {"wq": layer["wq"][:, :, :ca], "mult": layer["mult"],
                  "bias": layer["bias"]}
            lb = {"wq": layer["wq"][:, :, ca:], "mult": layer["mult"],
                  "bias": jnp.zeros_like(layer["bias"])}
            return _requant(_conv_i8(up, la) + _conv_i8(skip, lb))

        impl = self.decoder_impl
        if impl == "auto":
            if jax.default_backend() == "tpu":
                impl = "trunk" if self.decoder in NANO_WIDTHS else "pallas"
            else:
                impl = "xla"

        def split_conv_up(small, skip, layer):
            """split_conv with the up-path conv hoisted BELOW the x2
            nearest upsample: a 1x1 conv commutes with nearest-neighbor
            duplication, so conv(up(x)) == up(conv(x)) bit-exactly -- and
            the broadcast-fed int8 conv at the big resolution, which XLA
            lowers at ~3% of the s8 MXU peak (u1red was 3.56 ms of the
            5.7 ms trunk, tools/bench_trunk_layers.py 2026-08-17), is
            replaced by the same conv at 1/4 the pixels plus an f32
            broadcast fused into the add epilogue."""
            if impl == "pallas":
                from video_stream_segmenetation_tpu.kernels.decoder_int8 import (
                    fused_decoder_level,
                )

                return fused_decoder_level(small, skip, layer)
            ca = small.shape[-1]
            la = {"wq": layer["wq"][:, :, :ca], "mult": layer["mult"],
                  "bias": layer["bias"]}
            lb = {"wq": layer["wq"][:, :, ca:], "mult": layer["mult"],
                  "bias": jnp.zeros_like(layer["bias"])}
            ya = _nearest_x2(_conv_i8(small, la))[
                ..., : skip.shape[-3], : skip.shape[-2], :
            ]
            return _requant(ya + _conv_i8(skip, lb))

        alpha_logit = None
        if self.decoder in NANO_WIDTHS and impl == "trunk":
            # whole-trunk megakernel (kernels/trunk_int8.py): d2dn..u1red
            # in one VMEM pass per stream -- no XLA-conv<->kernel layout
            # copies, no s32 epilogue materialization, one custom-call.
            # The XLA mirror above still feeds sem_logit; in the serving
            # step sem is unused so XLA dead-code-eliminates the mirror.
            from video_stream_segmenetation_tpu.kernels.trunk_int8 import (
                fused_nano_trunk,
                fused_nano_trunk_alpha_q,
                fused_nano_trunk_alpha_rowfold,
            )

            if self.head_impl == "int8" and "alpha_q" in q:
                # alpha head fused in too: u1 never leaves VMEM.  u1
                # below only feeds det (XLA mirror, DCE'd in serving).
                # (Negative result, kept for the record: re-running the
                # stem dot on a 6D quad-parity VIEW of the input so it
                # emits x0 pre-folded regressed 6.3 -> 7.6 ms at S=64 --
                # XLA relayouts the 6D view of its conv-layout parameter,
                # which costs MORE than the 72 MB x0 fold copy it saves.)
                sb = x0.shape[0]
                hp, wp = x0.shape[1], x0.shape[2]
                c0 = x0.shape[-1]
                if self.trunk_fold == "vmem":
                    # free bitcast: only outer dims split
                    x0r = x0.reshape(sb, hp // 4, 4, wp, c0)
                    alpha_logit = fused_nano_trunk_alpha_rowfold(x0r, q)
                else:
                    x0q = x0.reshape(sb, hp // 4, 4, wp // 4, 4 * c0)
                    alpha_logit = fused_nano_trunk_alpha_q(x0q, q)
                if self.num_classes == 1:
                    alpha_logit = alpha_logit[..., None]
                u1 = split_conv_up(
                    split_conv_up(ctx, d2, q["u2red"]), b1, q["u1red"]
                )
            else:
                u1 = fused_nano_trunk(x0, q)
        elif self.decoder in ("micro", *NANO_WIDTHS):
            # plans D/E/F: 1x1-only decoder; the u1 skip is the stem output
            u2 = split_conv_up(ctx, d2, q["u2red"])
            u1 = split_conv_up(u2, b1, q["u1red"])
        elif self.decoder == "light":
            # plan C: 1x1-reduce decoders (conv-below-upsample works for
            # 1x1 too), one 3x3 at the /2 level only
            u2 = split_conv_up(ctx, d2, q["u2red"])
            u2 = _qconv(u2, q["u2"], ci)
            u1 = split_conv_up(u2, b1, q["u1red"])
        else:
            u2 = _nearest_x2(ctx)[..., : d2.shape[-3], : d2.shape[-2], :]
            u2 = split_conv(u2, d2, q["u2"])
            u1 = _nearest_x2(u2)[..., : b1.shape[-3], : b1.shape[-2], :]
            u1 = split_conv(u1, b1, q["u1"])

        if self.head_impl == "int8" and "alpha_q" in q:
            det_logit = _conv_i8(u1, q["det_q"])
            if alpha_logit is None:
                alpha_logit = _conv_i8(u1, q["alpha_q"])
        else:
            u1f = u1.astype(jnp.bfloat16) * jnp.bfloat16(ACT_SCALE)
            det_logit = u1f @ q["det"]["kernel"][0, 0].astype(jnp.bfloat16) + q[
                "det"
            ]["bias"].astype(jnp.bfloat16)
            alpha_logit = (
                jax.lax.conv_general_dilated(
                    u1f,
                    q["alpha"]["kernel"].astype(jnp.bfloat16),
                    (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + q["alpha"]["bias"].astype(jnp.bfloat16)
            )

        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        uf = self.head_upsample
        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        k = self.num_classes
        if uf == 1:
            # native-head-res serving (mask_hw == stem grid): the
            # identity resize is K planar matmul pairs for nothing
            al = alpha_logit.astype(jnp.float32)
        else:
            al = jnp.stack(
                [
                    resize_bilinear_mxu(
                        alpha_logit[..., c].astype(jnp.float32),
                        (uf * h0, uf * w0),
                        method="half_pixel", channel_last=False,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    for c in range(k)
                ],
                axis=-1,
            )
        if k == 1:
            out = {
                "alpha": jax.nn.sigmoid(al[..., 0].astype(jnp.float32)),
                "alpha_logit_lr": alpha_logit[..., 0].astype(jnp.float32),
                "semantic": jax.nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0],
                "detail": det_logit.astype(jnp.float32)[..., 0],
            }
        else:
            out = {
                "alpha": jax.nn.softmax(al.astype(jnp.float32), axis=-1),
                "semantic": jax.nn.softmax(sem_logit.astype(jnp.float32), axis=-1),
                "detail": det_logit.astype(jnp.float32),
            }
        if stem_aux is not None:
            out["stem_aux"] = stem_aux
        return out
