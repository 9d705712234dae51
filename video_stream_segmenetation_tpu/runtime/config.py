"""Three-tier config system, mirroring the reference's shape (SURVEY.md §5):

1. **Static build config** (`PipelineStatics`): compile-time constants --
   model geometry, cadence, warp gains (the reference's hard consts:
   MODEL_INPUT_SIZE frameProcessorTest.ts:10, FD/LMK sizes :33-34,
   LANDMARK_INTERVAL/L_MIN_MS/WARP_GAIN main.ts:10-12, WARP_BLEND_WEIGHT
   :108, FACE_SCORE_THRESH :35).  Changing these retraces/recompiles.

2. **Live per-stream knobs** (`PipelineKnobs`): the mutable `config`
   object (frameProcessorTest.ts:20-30) -- EMA, NOISE_CUTOFF,
   HIGH_THRESHOLD, GAMMA, USE_BILATERAL, BILATERAL_SIGMA_SPATIAL/RANGE.
   Here each knob is an ``[S]`` device array traced as a runtime value, so
   a slider update (script.ts:20-25) is a cheap buffer swap -- **no
   retrace** -- and every stream can have different settings (the
   reference is single-stream so its one global config is the degenerate
   S=1 case).

3. **Content data**: background templates/presets (background/schema.py),
   the data.json tier.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# defaultConfig values (frameProcessorTest.ts:12-28)
DEFAULT_EMA = 0.55
# Motion-adaptive EMA strength (OUR improvement over the reference's
# fixed EMA, frameProcessorTest.ts:218-227): per pixel, the effective
# EMA is scaled by 1 - adapt * motion, where motion ramps 0 -> 1 as
# |current - prev| crosses [EMA_ADAPT_T0, EMA_ADAPT_T1].  Static pixels
# (|d| <= T0 -- model jitter / flicker noise) keep the full smoothing;
# genuinely moving content (|d| >= T1) tracks the current frame instead
# of paying the reference's ~0.04-IoU smoothing lag on fast motion
# (PARITY.json float_pipeline_vs_gt vs _ema0).  adapt=0 is bit-exact
# reference semantics (the oracle-pinned compatibility mode); serving
# presets promote adapt=1 via PipelineStatics.ema_adapt_default.
DEFAULT_EMA_ADAPT = 0.0
EMA_ADAPT_T0 = 0.10
EMA_ADAPT_T1 = 0.40
DEFAULT_NOISE_CUTOFF = 0.06
DEFAULT_HIGH_THRESHOLD = 0.95
DEFAULT_GAMMA = 0.4
DEFAULT_USE_BILATERAL = True
DEFAULT_BILATERAL_SIGMA_SPATIAL = 1.0
DEFAULT_BILATERAL_SIGMA_RANGE = 12.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PipelineKnobs:
    """Per-stream live knobs; every field is an ``[S]`` array."""

    ema: jnp.ndarray
    ema_adapt: jnp.ndarray  # motion-adaptive EMA strength (0 = reference)
    noise_cutoff: jnp.ndarray
    high_threshold: jnp.ndarray
    gamma: jnp.ndarray
    use_bilateral: jnp.ndarray  # bool
    sigma_spatial: jnp.ndarray
    sigma_range: jnp.ndarray

    @property
    def num_streams(self) -> int:
        return self.ema.shape[0]

    def replace_stream(self, s: int, **kw) -> "PipelineKnobs":
        """Functional single-stream update (a slider move on stream s)."""
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            out[f.name] = v.at[s].set(kw[f.name]) if f.name in kw else v
        return PipelineKnobs(**out)


def default_knobs(
    num_streams: int, ema_adapt: float = DEFAULT_EMA_ADAPT
) -> PipelineKnobs:
    """All streams at defaultConfig (the reset path, script.ts:43-46).

    ``ema_adapt``: the preset-level default for the motion-adaptive EMA
    knob (PipelineStatics.ema_adapt_default; 0 = reference-exact)."""
    s = num_streams
    return PipelineKnobs(
        ema=jnp.full((s,), DEFAULT_EMA, jnp.float32),
        ema_adapt=jnp.full((s,), ema_adapt, jnp.float32),
        noise_cutoff=jnp.full((s,), DEFAULT_NOISE_CUTOFF, jnp.float32),
        high_threshold=jnp.full((s,), DEFAULT_HIGH_THRESHOLD, jnp.float32),
        gamma=jnp.full((s,), DEFAULT_GAMMA, jnp.float32),
        use_bilateral=jnp.full((s,), DEFAULT_USE_BILATERAL, bool),
        sigma_spatial=jnp.full((s,), DEFAULT_BILATERAL_SIGMA_SPATIAL, jnp.float32),
        sigma_range=jnp.full((s,), DEFAULT_BILATERAL_SIGMA_RANGE, jnp.float32),
    )


@dataclasses.dataclass(frozen=True)
class PipelineStatics:
    """Compile-time pipeline geometry and constants (tier 1)."""

    frame_hw: tuple[int, int] = (720, 1280)
    mask_hw: tuple[int, int] = (288, 512)  # MODEL_INPUT_SIZE [W,H]=[512,288]
    fd_size: int = 256  # FD_INPUT (frameProcessorTest.ts:33)
    lmk_size: int = 192  # LMK_INPUT (:34)
    lmk_interval: int = 6  # LANDMARK_INTERVAL (main.ts:10)
    warp_gain: float = 0.7  # WARP_GAIN (main.ts:12)
    warp_blend_weight: float = 0.3  # WARP_BLEND_WEIGHT (frameProcessorTest.ts:108)
    # warp blend mode: 'lerp' (active pipeline, wb*warped + (1-wb)*cur) or
    # 'max' (the branch variant: max(cur, warped*warp_blend_weight),
    # frameProcessor_branch.ts:83-88 with 0.75)
    warp_blend_mode: str = "lerp"
    face_score_thresh: float = 0.6  # FACE_SCORE_THRESH (:35)
    lmk_score_thresh: float = 0.3  # (:143)
    roi_pad: float = 0.25  # cropFaceROI pad (:139)
    affine_mode: str = "exact"  # 'exact' intent vs 'reference' parity
    background: str = "image"  # 'image' | 'blur' | 'color'
    bg_color: tuple[float, float, float] = (20 / 255, 25 / 255, 30 / 255)
    bg_blur_sigma: float = 8.0
    upsample_method: str = "half_pixel"
    compute_dtype: Any = jnp.bfloat16
    face_path: bool = True  # disable to skip FD/LMK entirely
    # face tracking mode: 'landmarks' = FD -> ROI -> 468 landmarks ->
    # Procrustes similarity (the active frameProcessorTest.ts pipeline);
    # 'translation' = detector-center delta only (the BlazeFace variant,
    # frameProcessor.ts:369-386: plain 128 resize, center delta x gain,
    # 50/50 blend, no prior/morphology)
    face_tracking: str = "landmarks"
    translation_gain: float = 0.9  # WARP_GAIN (frameProcessor.ts:26)
    # temporal filter: 'ema' (frameProcessorTest.ts:218-227) or
    # 'hole_fill' (the documented alternative,
    # frameProcessor_branch.ts:155-180)
    temporal_filter: str = "ema"
    # default value of the per-stream ema_adapt knob for engines built on
    # these statics (tier-2 seed, not a compile-time constant): 0 =
    # reference-exact fixed EMA; serving presets set 1.0 so default-knob
    # streams get the motion-adaptive filter (see DEFAULT_EMA_ADAPT)
    ema_adapt_default: float = 0.0
    # morphological opening stage toggle (the BlazeFace and branch
    # variants run without morphology)
    morphology: bool = True
    # cadence compaction: run FD/LMK only on the <= face_batch streams
    # whose cadence fires (gather/scatter); face_batch=0 -> auto
    # ceil(S / lmk_interval)
    face_compact: bool = True
    face_batch: int = 0
    # prev-alpha warp lowering: 'exact' (reference 2-D gather) or
    # 'separable' (scale+translate only; ~20x faster on TPU)
    warp_impl: str = "separable"
    # alpha upsample lowering: 'mxu' (channelless interp matmuls -- layout
    # clean, exact taps) or 'gather'
    upsample_impl: str = "mxu"
    # mxu upsample matmul precision: 'fast' (single bf16 pass; error
    # < 1 u8 step on the composited output) or 'exact' (f32 passes)
    upsample_precision: str = "fast"
    # Pallas fused stencil chain: True / False / 'auto' (= on TPU only;
    # elsewhere the XLA chain runs -- the pallas interpreter is too slow)
    use_fused_refine: Any = "auto"
    # export per-frame face evidence (prior + has_prior) in the step
    # outputs regardless of prior form -- the oracle-chain parity harness
    # (tools/parity_matting.py) replays stages 3..9 with it.  Off in
    # serving: the plane form would ship an [S,mh,mw] extra output.
    debug_face_outputs: bool = False
    # face-prior lowering on the fused temporal+refine path: 'auto' =
    # analytic (the soft ellipse is rasterized in VMEM from 4 scalars,
    # ops/prior.py::face_prior_params -- the [S,mh,mw] f32 plane never
    # exists in HBM); 'plane' forces the rendered+scattered plane (the
    # XLA chain always uses the plane)
    prior_impl: str = "auto"
    # Pallas fused composite (upsample+blend+u8). Default OFF: measured
    # slightly slower than the XLA mxu-upsample composite at S=64 (34.2 vs
    # 32.3 ms/step -- the interp-weight blocks refetch per grid step);
    # kept for future tuning. True enables; 'auto' currently = False.
    use_fused_composite: Any = False
    # bench-only stage truncation for step-cost attribution
    # (tools/bench_step_ablate.py): '' = full step; 'model_only' = skip
    # warp/EMA/refine (a = raw model alpha); 'no_composite' = full
    # refine, passthrough output.  Comma-combinable
    # ('model_only,no_composite' = bare trunk cost).  NOT a serving mode.
    debug_stage: str = ""
    # resize lowering: 'gather' = reference-exact gather path; 'mxu' =
    # dense interp matmuls (NOT recommended at 720p -- channel-minormost
    # layout makes XLA's lowering pathological; kept for small inputs)
    resize_impl: str = "gather"
    # landmark ROI crop lowering: 'gather' (dynamic 2-D gather) or
    # 'mxu' (hat-weight interp matmuls; identical numerics, much faster
    # on v5e -- ops/resize.py::crop_and_resize_mxu)
    crop_impl: str = "gather"
    # preprocess matmul precision: 'fast' (bf16 passes) | 'exact'
    preprocess_precision: str = "fast"
    # matting input: 'resized' = reference-style (resize to mask res, then
    # model); 'native' = the model ingests full-res uint8 frames directly
    # (MatteNetHD strided stem -- the TPU-first fast path)
    matting_input: str = "resized"
    # face-subpath image source: 'frames' (reference-exact: the FD
    # letterbox and the landmark ROI crop sample the full-res frame,
    # frameProcessorTest.ts:397-404,451-470) or 'guide' (sample the
    # mask-res guide image instead -- the detector input is only 256px
    # and the ROI 192px, so mask-res source loses little, and in s2d
    # mode it avoids reconstructing the natural frame layout on device
    # entirely, ~9 ms/64-stream step)
    face_input: str = "frames"
    # device frame layout: 'natural' [S,H,W,3] or 's2d' space-to-depth
    # packed [S,H/b,W/b,b*b*3] (b = s2d_block = the MatteNetHD stem
    # stride).  's2d' is the TPU-first ingestion format: the native
    # framebuf writes batches in patch order for free and the stem
    # becomes a single MXU matmul (ops/layout.py).  Requires
    # matting_input='native'.
    frame_layout: str = "natural"
    s2d_block: int = 5
    # matting serving precision: 'bf16' (flax forward) or 'int8'
    # (models/quantized.py: BN-folded per-channel int8 weights + static
    # relu6-lattice activations on the MXU s8 path; requires
    # matting_input='native' with the plan-B stem, s2d_block >= 8).
    # The reference's own flagship ships quantized (model_q4f16.onnx).
    matting_precision: str = "bf16"
    # face-subpath serving precision: 'bf16' (flax FaceFinder/LandmarkNet
    # forwards) or 'int8' (models/quantized_face.py: the same BN-fold +
    # per-channel int8 + relu6-lattice scheme as the trunk, on the MXU s8
    # path; detection boxes/landmarks parity-pinned vs the float models)
    face_precision: str = "bf16"
    # face model source: 'fast' (our trained dense-conv
    # FaceFinder/LandmarkNet) or 'reference' -- the reference repo's REAL
    # shipped MediaPipe ONNX weights (the only real-human-trained weights
    # available here), served natively via models/reference_face.py.
    # 'reference' requires fd_size=256 / lmk_size=192 (the graphs'
    # geometry) and float face serving; the Engine swaps the graphs in at
    # build (use_reference_face_models).
    face_models: str = "fast"
    # int8 trunk conv lowering: 'xla' (lax.conv s8 path) or 'pallas'
    # (kernels/conv_int8.py fused conv+dequant+relu6+requant -- int8
    # in/out, no f32 epilogue materialized between layers)
    int8_conv_impl: str = "xla"
    # 1x1 decoder-level lowering: 'auto' (= 'pallas' on TPU, 'xla'
    # elsewhere), 'xla', or 'pallas' (kernels/decoder_int8.py: both split
    # matmuls + x2 nearest upsample + requant VMEM-resident per stream --
    # no big-res f32 intermediates; -1.2 ms on the S=64 nano step)
    int8_decoder_impl: str = "auto"
    # int8 graph stem lowering: 'bf16' (u8 -> bf16 cast + bf16 patch
    # matmul) or 'int8' (x - 128 shift folded into the bias, MXU s8
    # matmul; per-output-channel int8 stem weights)
    int8_stem_impl: str = "bf16"
    # int8 graph alpha/det head lowering: 'int8' (s8 conv on u1 directly,
    # f32 logits; the bf16 u1 dequant never materializes -- 144 MB at
    # S=64) or 'bf16' (dequant + bf16 conv)
    int8_head_impl: str = "int8"
    # where the trunk megakernel's quad-parity input fold happens:
    # 'xla' (x0 reshape in XLA -- pays a ~108 MB lane-retiling HBM copy
    # at S=96 since the stem requant's kOutput dot fusion can't absorb
    # it) or 'vmem' (free row-fold bitcast in, column fold as one-hot
    # MXU dots inside the kernel -- kernels/trunk_int8.py)
    int8_trunk_fold: str = "xla"
    # packed-composite lowering (ops/layout.py::alpha_composite_s2d):
    # 'per_dy' (b per-dy matmuls; XLA pays ~700 MB/step of f32 relayout
    # copies re-packing each [S,hp,fw] output into (wp,b,c) lanes) or
    # 'dot30' (the (j,dx) packing + c-triplication baked into the weight
    # matrix so the blend fuses as the dot epilogue; 3x MACs, zero
    # relayout -- in-context step 8.97 -> 8.13 ms at S=64, the default)
    s2d_composite_impl: str = "dot30"
    # stream-axis chunk for the packed composite: above ~64 streams XLA
    # relayout-copies BOTH packed u8 operands (337.5 MB each at S=128 --
    # the S=128 per-stream degradation, HLO census 2026-08-19); chunking
    # keeps every blend dot at the copy-free S<=64 shape.  'auto' = 64 on
    # TPU when S > 96 (the measured cliff; pipeline.py only engages
    # chunking past it, so auto is a no-op for 64 < S <= 96), off
    # otherwise; None/0 disables; an int forces that chunk.
    s2d_composite_s_chunk: Any = "auto"
    # MatteNetHD decoder plan ('full' = plan B; 'light' = plan C lite
    # trunk, ~43% fewer FLOPs with edge detail delegated to the guided
    # refine stage -- see models/mattenet_hd.py)
    matting_decoder: str = "full"
    # matting architecture: 'feedforward', 'recurrent' (RVM-class model
    # threading ConvGRU state through StreamState.rec), or 'saliency'
    # (U2Net-class SaliencyNet at its canonical square geometry)
    matting_arch: str = "feedforward"
    # multi-class mode (BASELINE config 5): number of segmentation classes
    # (1 = plain matting). With K > 1 the model emits [S,h,w,K] softmax
    # maps; per-class EMA; composite applies `class_effects` (one dict per
    # class, ops.multiclass_composite semantics; class 0 = background)
    num_classes: int = 1
    class_effects: tuple = ()
    # bilateral guide source: 'bilinear' (tf.js-parity resize of the f32
    # frame) or 'nearest_u8' (single-take u8 resample; fast path)
    guide_impl: str = "bilinear"
    # ride the planar guide gather on the matting stem matmul as extra
    # one-hot columns (bf16 stem only).  Bit-exact, but a NEGATIVE result
    # on v5e (2026-08-18): XLA materializes the combined ~198 MB bf16 dot
    # output instead of multi-output-fusing the stem-requant and aux-u8
    # epilogues, and adds a 72 MB s8 copy of x0 — 6.07 ms vs 5.62 ms
    # step at S=64 on fast_int8_pico.  Kept off by default as a pinned,
    # tested option in case a future XLA fuses it.
    guide_stem_aux: bool = False
    # alpha source for the fused temporal+refine kernel: 'full' feeds the
    # model's [S,mask_hw] f32 alpha; 'lowres' feeds the HEAD-GRID logits
    # (models/quantized.py 'alpha_logit_lr') and runs the bilinear
    # upsample + sigmoid in VMEM -- the full-res f32 alpha_raw never
    # exists in HBM (~150 MB/step round trip at S=64).  'auto' = lowres
    # on the TPU fast path (analytic prior + planar guide + native int8
    # matting), full elsewhere.
    refine_alpha_src: str = "full"
    # feed the fused kernel the RAW gathered guide lanes [nl,S,hp,wp]
    # (ops/layout.py::guide_lanes_s2d) and unfold them in VMEM -- the
    # planar guide reassembly relayout never exists in HBM.  'auto' =
    # on for the TPU fast path, off elsewhere; False/True force.
    guide_kernel_unfold: Any = False
    # where the raw guide lanes come from when guide_kernel_unfold is on:
    # 'gather' = one-hot MXU dot off the packed frames on device
    # (ops/layout.py::guide_lanes_s2d, re-reads the 176 MB frame batch);
    # 'host' = the step takes frames as a (packed, lanes) tuple -- the
    # native framebuf emits the <=48 tap lanes during its s2d pack
    # (native/framebuf.cpp) at ingestion, like the packing itself, so the
    # device never re-reads the frames for the guide.
    guide_source: str = "gather"
    # dtype of the kernel's refined-alpha output: 'f32' (exact) or
    # 'bf16' (halves its HBM write + the composite's read; the packed
    # composite dot reads it as bf16 anyway, so the composite output is
    # nearly unchanged -- within one u8 rounding step)
    refined_dtype: str = "f32"
