"""Named pipeline presets: each of the reference's selectable pipelines
(SURVEY.md §2.3/§2.4 -- chosen there by editing the import in main.ts:4)
as a PipelineStatics configuration, plus the TPU-first fast path.

Usage:
    from video_stream_segmenetation_tpu.runtime.presets import preset
    engine = Engine(num_streams=64, statics=preset("fast"))
"""

from __future__ import annotations

import dataclasses

from video_stream_segmenetation_tpu.runtime.config import PipelineStatics

_PRESETS = {
    # the active pipeline: frameProcessorTest.ts (landmark affine warp,
    # morphology, elliptical prior, bilateral, live knobs)
    "active": dict(),
    # TPU-first fast serving configuration (same stage semantics as
    # 'active'; fast lowerings).  ema_adapt_default=1.0 on every fast
    # preset: the motion-adaptive temporal EMA (ops/temporal.py) -- OUR
    # improvement over the reference's fixed EMA lag on fast motion
    # (realistic-clip IoU 0.948 -> 0.979 at default knobs, stability
    # -0.002, flicker x1.14; tools/tune_adaptive_ema.py, round 5).  The
    # 'active' preset keeps adapt=0 = reference-exact (oracle-pinned).
    "fast": dict(
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        ema_adapt_default=1.0,
    ),
    # maximum-throughput serving: s2d packed ingestion (the native
    # framebuf assembles batches in patch order), plan-B stride-10 stem,
    # int8 matting graph, guide-sourced face path -- the bench.py
    # headline configuration (99.5 sustained 720p30 streams/chip)
    "fast_int8": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        crop_impl="mxu",
        resize_impl="mxu",
    ),
    # fast_int8 with the plan-C lite trunk (matting_decoder='light'):
    # ~43% fewer model FLOPs; edge detail rides the guided refine stage
    "fast_int8_lite": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="light",
        crop_impl="mxu",
        resize_impl="mxu",
    ),
    # fast_int8 with the plan-D micro trunk (matting_decoder='micro'):
    # ~37% fewer model FLOPs than plan C -- no full-res-level conv,
    # single dilation-3 context conv, 1x1-only decoder; edge detail
    # rides the guided refine stage (quality study: benchmarks/RESULTS.md)
    "fast_int8_micro": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="micro",
        crop_impl="mxu",
        resize_impl="mxu",
    ),
    # fast_int8 with the plan-E nano trunk (matting_decoder='nano'):
    # plan D with single 3x3 convs instead of residual blocks
    # (6.3 GFLOP/frame; study in benchmarks/RESULTS.md)
    "fast_int8_nano": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="nano",
        crop_impl="mxu",
        resize_impl="mxu",
    ),
    # plan-F pico trunk (matting_decoder='pico'): the nano structure at
    # reduced deep widths (c2 128, c3 192; ~38% fewer MACs) -- the next
    # point on the width/quality study (benchmarks/RESULTS.md).
    # refined_dtype='bf16': the refine kernel's alpha output (composite
    # reads it as bf16 anyway; EMA state stays f32) -- the only phase-2
    # boundary cut that won on the chip (2026-08-19 ablation; lowres
    # alpha src neutral, guide-lane unfold negative -- both stay opt-in).
    # int8_trunk_fold='vmem': megakernel takes the FREE row-folded
    # bitcast and column-folds in VMEM via one-hot MXU dots -- kills the
    # ~108 MB XLA lane-retiling copy (7.81 -> 7.62 ms at S=96,
    # in-context ablation 2026-08-19).
    # fd/lmk 128: the face models retrained at the smaller geometry
    # (tools/train_face.py VST_FD=128 -> checkpoints/*_128; det box IoU
    # 0.827 vs 0.84 at 256, lmk err 0.35 px) serve the face subpath
    # ~0.5-0.9 ms cheaper per S=64 step (tools/bench_face_ablate.py,
    # round 4; the no_face delta drops from ~1.45 to ~0.5-1.25 --
    # measurement-limited on the drifting chip, consistently positive)
    "fast_int8_pico": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="pico",
        crop_impl="mxu",
        resize_impl="mxu",
        refined_dtype="bf16",
        int8_trunk_fold="vmem",
        fd_size=128,
        lmk_size=128,
    ),
    # fast_int8_pico serving the reference repo's REAL shipped MediaPipe
    # face weights (models/reference_face.py; the only real-human-trained
    # weights in this environment -- PARITY.json student_vs_reference
    # shows the synthetic-trained fast students trail them on landmarks).
    # Geometry pinned to the graphs' 256/192; face stays float (the int8
    # face scheme doesn't apply to ONNX-graph models).  Step cost vs the
    # fd128 students is recorded in benchmarks/RESULTS.md.
    "fast_int8_pico_refface": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="pico",
        crop_impl="mxu",
        resize_impl="mxu",
        refined_dtype="bf16",
        int8_trunk_fold="vmem",
        fd_size=256,
        lmk_size=192,
        face_models="reference",
    ),
    # plan-G femto trunk (matting_decoder='femto'): every trunk level at
    # exactly one 128-lane group -- the knee-hunt point below pico
    "fast_int8_femto": dict(
        ema_adapt_default=1.0,
        matting_input="native",
        guide_impl="nearest_u8",
        warp_impl="separable",
        face_compact=True,
        frame_layout="s2d",
        s2d_block=10,
        face_input="guide",
        matting_precision="int8",
        matting_decoder="femto",
        crop_impl="mxu",
        resize_impl="mxu",
    ),
    # frameProcessor.ts: BlazeFace center tracking, translation warp
    # (gain 0.9, 50/50 blend), EMA 0.75, gamma 0.8, no morphology/prior;
    # detector on a plain 128 resize every frame
    "blaze_tracking": dict(
        face_tracking="translation",
        translation_gain=0.9,
        warp_blend_weight=0.5,
        lmk_interval=1,
        morphology=False,
        fd_size=128,
        background="color",
        bg_color=(20 / 255, 25 / 255, 30 / 255),  # explicitAlphaBlend bg
    ),
    # frameProcessor_branch.ts: warp + EMA + bilateral + refine, no
    # FD/LMK/morphology inside (affine supplied externally); documented
    # hole-filling temporal alternative
    "branch": dict(
        face_path=False,
        morphology=False,
        temporal_filter="hole_fill",
        warp_blend_mode="max",
        warp_blend_weight=0.75,  # max(cur, warped*0.75), branch :83-88
    ),
    # frameProcessorRVM.ts: recurrent matting + EMA(0.7) + composite only
    "rvm": dict(
        matting_arch="recurrent",
        face_path=False,
        morphology=False,
    ),
    # u2FrameProc.ts: 320-input saliency, no temporal stage, composite
    # against a constant color (soft or hard alpha via ops.binarize_alpha)
    "u2": dict(
        matting_arch="saliency",
        mask_hw=(320, 320),
        face_path=False,
        morphology=False,
        temporal_filter="none",
        background="color",
    ),
    # BASELINE config 5: multi-class with per-class effects
    "multiclass": dict(
        # adaptive simplex EMA at half strength: +0.008 realistic IoU,
        # -0.003 stability (round-5 gate on articulated clips)
        ema_adapt_default=0.5,
        num_classes=4,
        class_effects=(
            {"blur": 8.0},
            {"keep": True},
            {"tint": (0.9, 0.7, 0.3), "strength": 0.3},
            {"tint": (0.3, 0.5, 0.9), "strength": 0.3},
        ),
    ),
    # config 5 on the fast stack: s2d packed ingestion, plan-E nano int8
    # HD trunk with K-class heads (matches the mattenet_hd10_mc
    # checkpoint, tools/train_variants.py::train_multiclass_hd), packed
    # per-class composite (ops.multiclass_composite_s2d) -- no full-res
    # reconstruction
    "multiclass_fast": dict(
        # adaptive simplex EMA at half strength: +0.008 realistic IoU,
        # -0.003 stability (round-5 gate on articulated clips)
        ema_adapt_default=0.5,
        num_classes=4,
        class_effects=(
            {"blur": 8.0},
            {"keep": True},
            {"tint": (0.9, 0.7, 0.3), "strength": 0.3},
            {"tint": (0.3, 0.5, 0.9), "strength": 0.3},
        ),
        matting_input="native",
        frame_layout="s2d",
        s2d_block=10,
        matting_precision="int8",
        matting_decoder="nano",
        resize_impl="mxu",
        face_path=False,
    ),
    # config 5 on the pico trunk (the single-class headline winner --
    # nano structure at deep widths 128/192; checkpoint
    # mattenet_hd10_mc_pico, tools/train_variants.py job
    # 'multiclass_hd_pico')
    "multiclass_fast_pico": dict(
        # adaptive simplex EMA at half strength: +0.008 realistic IoU,
        # -0.003 stability (round-5 gate on articulated clips)
        ema_adapt_default=0.5,
        num_classes=4,
        class_effects=(
            {"blur": 8.0},
            {"keep": True},
            {"tint": (0.9, 0.7, 0.3), "strength": 0.3},
            {"tint": (0.3, 0.5, 0.9), "strength": 0.3},
        ),
        matting_input="native",
        frame_layout="s2d",
        s2d_block=10,
        # serve the class simplex at the NATIVE head resolution (the
        # 72x128 stem grid, head_upsample=1): the K-class maps carry no
        # information above it (the 288x512 variant is itself a bilinear
        # upsample of the same logits), while EMA + renorm + the
        # composite's field contractions all scale with mask_hw -- at
        # 288x512 the composite alone measured 17.7 of the 22.9 ms step
        # (tools/bench_step_ablate.py, 2026-08-18).  The composite
        # upsamples ONCE, 72 -> 720, inside multiclass_composite_s2d.
        mask_hw=(72, 128),
        matting_precision="int8",
        matting_decoder="pico",
        resize_impl="mxu",
        face_path=False,
    ),
}


def preset(name: str, **overrides) -> PipelineStatics:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset '{name}'; have {sorted(_PRESETS)}")
    kw = {**_PRESETS[name], **overrides}
    return PipelineStatics(**kw)


def list_presets() -> list[str]:
    return sorted(_PRESETS)


def describe(name: str) -> str:
    base = PipelineStatics()
    p = preset(name)
    diffs = {
        f.name: getattr(p, f.name)
        for f in dataclasses.fields(PipelineStatics)
        if getattr(p, f.name) != getattr(base, f.name)
    }
    return f"{name}: {diffs or 'defaults (the active frameProcessorTest pipeline)'}"
