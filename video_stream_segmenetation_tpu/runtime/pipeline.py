"""The fused per-batch pipeline step: the reference's whole per-frame hot
path (SURVEY.md §3.2) as ONE jitted XLA program over ``[S, ...]`` stream-
major tensors.

Reference loop (client/src/core/frameProcessorTest.ts:60-186 +
main.ts:52-111) makes six GPU<->CPU round-trips per frame; here a frame
enters as uint8 in HBM and leaves as a composited uint8 frame without ever
touching the host:

    uint8 frames [S,H,W,3]
      -> preprocess (tf.js-parity resize + /255)               stage 1
      -> MatteNet forward (bf16)                               stage 2
      -> warp prev alpha by per-stream affine + 0.3/0.7 blend  stage 3
      -> temporal EMA (per-stream knob)                        stage 4
      -> morphological opening                                 stage 5
      -> face subpath (detector -> prior -> ROI -> landmarks -> Procrustes
         affine), computed batched, *applied* only on cadence  stage 6
      -> prior-gated closing                                   stage 7
      -> joint bilateral (per-stream toggle + sigmas)          stage 8
      -> threshold/gamma/prior refine                          stage 9
      -> alpha upsample + composite                            stage 10

The landmark cadence (every LANDMARK_INTERVAL frames + host min-interval +
in-flight exclusion, main.ts:55-64) becomes a per-stream boolean gate: the
face models run on the whole batch (they are tiny next to MatteNet) and
their *outputs* are merged with `where` only for streams whose cadence
fires this step.  The host-side ms gate rides in via `face_gate`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.models.facemesh import NUM_LANDMARKS
from video_stream_segmenetation_tpu.ops.geometry import (
    affine_from_landmarks,
    letterbox_params,
    pad_box,
)
from video_stream_segmenetation_tpu.runtime.config import PipelineKnobs, PipelineStatics
from video_stream_segmenetation_tpu.runtime.state import IDENTITY_AFFINE, StreamState


@dataclasses.dataclass
class ModelBundle:
    """The three live sessions of the reference orchestrator
    (main.ts:39-41), as (module, params) pairs."""

    matte_model: Any
    matte_params: Any
    face_model: Any = None
    face_params: Any = None
    lmk_model: Any = None
    lmk_params: Any = None

    @property
    def params(self):
        return {
            "matte": self.matte_params,
            "face": self.face_params,
            "lmk": self.lmk_params,
        }


def _letterbox_to_square(
    frames: jnp.ndarray, frame_hw, target: int, impl: str = "gather"
) -> jnp.ndarray:
    """Static letterbox (toSquareLetterbox semantics,
    frameProcessorTest.ts:613-642): fit-resize then pad with black."""
    _, dw, dh, off_x, off_y = letterbox_params(frame_hw, target)
    if impl == "mxu":
        small = ops.resize_bilinear_mxu(frames, (dh, dw), method="half_pixel")
    else:
        small = ops.resize_bilinear(frames, (dh, dw), method="half_pixel")
    pads = [(0, 0)] * (frames.ndim - 3) + [
        (off_y, target - dh - off_y),
        (off_x, target - dw - off_x),
        (0, 0),
    ]
    return jnp.pad(small, pads)


def _face_subpath(bundle, params, frames_f32, fire, statics: PipelineStatics,
                  prior_form: str = "plane"):
    """Batched stage 6: detector -> prior -> ROI -> landmarks -> affine.

    fire: [S] bool -- the per-stream cadence+gate decision.
    Returns (prior, has_prior [S], affine_update [S,6], has_update [S],
    det_score [S]).  prior is [S,h,w] (prior_form='plane') or [S,4]
    ellipse scalars for in-kernel rasterization (prior_form='params';
    values are only meaningful where has_prior -- the kernel gates).
    """
    s = frames_f32.shape[0]
    mh, mw = statics.mask_hw
    fh, fw = statics.frame_hw
    zero_prior = (
        jnp.zeros((s, 4), jnp.float32) if prior_form == "params"
        else jnp.zeros((s, mh, mw), jnp.float32)
    )

    # -- detector @ fd_size, letterboxed (the *intended* behavior; the
    # reference's active file has the letterboxMap bug, SURVEY.md App. A)
    fd_in = _letterbox_to_square(
        frames_f32, (fh, fw), statics.fd_size, impl=statics.resize_impl
    )
    if "fd_stub" in statics.debug_stage:
        # bench-only attribution: gather + letterbox WITHOUT the detector
        # forward.  An fd_in-dependent epsilon keeps the input path alive
        # (no DCE); combine with fd_only for the pure ingest cost, and
        # fd_only minus fd_only,fd_stub = the FaceFinder forward itself.
        eps = jnp.sum(fd_in.astype(jnp.float32)) * 1e-20
        box = (
            jnp.broadcast_to(
                jnp.asarray(
                    [fw * 0.3, fh * 0.2, fw * 0.7, fh * 0.8], jnp.float32
                ),
                (s, 4),
            )
            + eps
        )
        score = jnp.full((s,), 0.9, jnp.float32) + eps
        det_valid = jnp.ones((s,), bool)
    else:
        det = bundle.face_model.apply(params["face"], fd_in)
        box, score, det_valid = ops.best_box_decode(
            det["box_coords"], det["box_scores"], (fh, fw), statics.fd_size, letterboxed=True
        )
    det_ok = fire & det_valid & (score >= statics.face_score_thresh)

    if "fd_only" in statics.debug_stage:
        # bench-only attribution: detector alone (prior render + ROI +
        # landmarks + Procrustes all skipped)
        z = jnp.zeros((s,), jnp.float32)
        return (
            zero_prior, det_ok & False,
            jnp.zeros((s, 6), jnp.float32), det_ok & False,
            jnp.where(fire, score, z),
        )

    # -- elliptical prior (frameProcessorTest.ts:136)
    if prior_form == "params":
        prior = ops.face_prior_params(box, (fh, fw), (mh, mw))
    else:
        prior = ops.face_prior_mask(box, (fh, fw), (mh, mw))
        prior = jnp.where(det_ok[:, None, None], prior, 0.0)

    if "no_lmk" in statics.debug_stage:
        # bench-only attribution: detector + prior, no landmark branch
        return (
            prior, det_ok, jnp.zeros((s, 6), jnp.float32), det_ok & False,
            jnp.where(fire, score, 0.0),
        )

    # -- ROI crop + landmarks (:139-143)
    roi = pad_box(box, statics.roi_pad, (fh, fw))
    if statics.crop_impl == "mxu":
        roi_img = ops.crop_and_resize_mxu(
            frames_f32, roi, (statics.lmk_size, statics.lmk_size)
        )
    else:
        roi_img = jax.vmap(
            lambda img, b: ops.crop_and_resize(
                img, b, (statics.lmk_size, statics.lmk_size)
            )
        )(frames_f32, roi)
    lmk = bundle.lmk_model.apply(params["lmk"], roi_img)
    lmk_ok = det_ok & (lmk["scores"] >= statics.lmk_score_thresh)

    # landmarks: normalized -> ROI px -> full-frame px (:490-497, :468)
    rw = (roi[:, 2] - roi[:, 0])[:, None]
    rh = (roi[:, 3] - roi[:, 1])[:, None]
    pts_full = jnp.stack(
        [
            lmk["landmarks"][..., 0] * rw + roi[:, 0:1],
            lmk["landmarks"][..., 1] * rh + roi[:, 1:2],
        ],
        axis=-1,
    )  # [S, 468, 2]

    affine_update = affine_from_landmarks(
        pts_full, (fh, fw), (mh, mw), mode=statics.affine_mode
    )
    # score reported only for streams whose cadence actually ran
    return prior, det_ok, affine_update, lmk_ok, jnp.where(fire, score, 0.0)


def _face_subpath_compact(
    bundle, params, frames, state, statics, face_gate, s2d_block=None,
    src_planar=False, prior_form: str = "plane", src_lanes_geom=None,
):
    """Cadence-compacted stage 6: gather the <= K streams whose cadence
    fires this step (K = ceil(S / lmk_interval) with staggered admission,
    runtime/scheduler.py), run the face models on that compact batch, and
    scatter the results back.  Saves (interval-1)/interval of the FD/LMK
    FLOPs + the per-stream 720p letterbox resize (~19 ms -> ~3 ms at
    S=64 on v5e).

    If more than K streams fire in one step (unstaggered admission), the
    overflow streams simply skip this round -- the reference's own
    in-flight gate drops landmark rounds the same way (main.ts:55-64).

    ``frames`` may be natural [S,H,W,3] or (s2d_block set) space-to-depth
    packed; the natural layout is reconstructed only for the gathered
    cadence subset.  With ``src_lanes_geom=(fy, fx)``, ``frames`` is the
    raw guide-lane tensor [nl, S, hp, wp] u8 (ops/layout.py::
    guide_lanes_s2d, the guide_kernel_unfold fast path where no planar
    guide exists in HBM): the cadence subset is gathered on the stream
    axis and only those <= K streams pay the interleave reassembly.
    """
    s = frames.shape[1] if src_lanes_geom else frames.shape[0]
    mh, mw = statics.mask_hw
    cadence = (state.frame_idx % statics.lmk_interval) == 0
    fire = cadence & face_gate

    def lanes_to_planar(x):
        # [nl, K, hp, wp] -> [K, 3, mh, mw] (guide_from_gathered with
        # block=1: hp/wp ARE the patch grid here)
        fy, fx = src_lanes_geom
        hp, wp = x.shape[-2], x.shape[-1]
        g = jnp.moveaxis(x, 0, -1)  # [K, hp, wp, nl]
        return ops.guide_from_gathered(
            g, (hp, wp), (hp * fy, wp * fx), 1, planar=True
        )

    def to_f32(x):
        if src_lanes_geom:
            x = lanes_to_planar(x)
        if s2d_block:
            x = ops.depth_to_space(x, s2d_block)
        if src_planar:
            # channel-leading [.., 3, h, w] -> HWC; applied post-gather so
            # only the <= K cadence streams pay the relayout
            x = jnp.moveaxis(x, -3, -1)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return x

    k = statics.face_batch or max(1, -(-s // statics.lmk_interval))
    if k >= s:
        return _face_subpath(
            bundle, params, to_f32(frames), fire, statics,
            prior_form=prior_form,
        )

    (idxs,) = jnp.where(fire, size=k, fill_value=s)
    sel_valid = idxs < s
    safe = jnp.minimum(idxs, s - 1)
    # gather in uint8 FIRST, then convert: keeps the full-batch f32 frame
    # conversion out of the hot path (700 MB at S=64x720p)
    f_sel = to_f32(jnp.take(frames, safe, axis=1 if src_lanes_geom else 0))

    prior_k, has_prior_k, aff_k, has_upd_k, score_k = _face_subpath(
        bundle, params, f_sel, sel_valid, statics, prior_form=prior_form
    )

    # scatter back (OOB fill index s is dropped by jnp scatter semantics)
    if prior_form == "params":
        prior = jnp.zeros((s, 4), jnp.float32).at[idxs].set(prior_k)
    else:
        prior = jnp.zeros((s, mh, mw), jnp.float32).at[idxs].set(prior_k)
    has_prior = jnp.zeros((s,), bool).at[idxs].set(has_prior_k)
    affine_update = jnp.zeros((s, 6), jnp.float32).at[idxs].set(aff_k)
    has_update = jnp.zeros((s,), bool).at[idxs].set(has_upd_k)
    det_score = jnp.zeros((s,), jnp.float32).at[idxs].set(score_k)
    return prior, has_prior, affine_update, has_update, det_score


def _face_translation_subpath(bundle, params, frames_f32, state, statics, face_gate):
    """Translation-only tracking (the BlazeFace variant, runBlazeFace +
    warpTranslate, client/src/core/frameProcessor.ts:244-342,369-386):
    detector on a plain fd_size resize (no letterbox), best box center in
    mask coords, delta vs the previous center scaled by WARP_GAIN, applied
    as an integer-translation affine.  No landmarks, no prior.

    Returns (affine_update [S,6], has_update [S], det_score [S],
    new_center [S,2], new_has_center [S]).
    """
    s = frames_f32.shape[0]
    mh, mw = statics.mask_hw
    fh, fw = statics.frame_hw
    cadence = (state.frame_idx % statics.lmk_interval) == 0
    fire = cadence & face_gate

    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

    fd_in = resize_bilinear(
        frames_f32, (statics.fd_size, statics.fd_size), method="asymmetric"
    )
    det = bundle.face_model.apply(params["face"], fd_in)
    box, score, det_valid = ops.best_box_decode(
        det["box_coords"], det["box_scores"], (fh, fw), statics.fd_size,
        letterboxed=False,
    )
    det_ok = fire & det_valid & (score >= statics.face_score_thresh)

    # center in mask coords with JS round+clamp (frameProcessor.ts:331-335)
    cx = jnp.clip(
        jnp.floor((box[:, 0] + box[:, 2]) / 2 / fw * mw + 0.5), 0, mw - 1
    )
    cy = jnp.clip(
        jnp.floor((box[:, 1] + box[:, 3]) / 2 / fh * mh + 0.5), 0, mh - 1
    )
    center = jnp.stack([cx, cy], axis=-1)

    has_prev = det_ok & state.has_center
    delta = (center - state.face_center) * statics.translation_gain
    # integer translation (warpTranslate truncates, frameProcessor.ts:102)
    dxi = jnp.trunc(delta[:, 0])
    dyi = jnp.trunc(delta[:, 1])
    one = jnp.ones((s,), jnp.float32)
    zero = jnp.zeros((s,), jnp.float32)
    affine_update = jnp.stack([one, zero, dxi, zero, one, dyi], axis=-1)

    new_center = jnp.where(det_ok[:, None], center, state.face_center)
    new_has_center = state.has_center | det_ok
    return affine_update, has_prev, jnp.where(fire, score, 0.0), new_center, new_has_center


def make_multiclass_step(bundle: ModelBundle, statics: PipelineStatics):
    """Multi-class pipeline (BASELINE config 5): K-way softmax maps ->
    per-class temporal EMA -> per-class composite effects.

    The reference has no multi-class path; the refinement stages that
    assume a single matte (morphology/prior/bilateral) are bypassed --
    temporal smoothing happens on the class simplex (renormalized after
    EMA), and the composite applies statics.class_effects.
    """
    mh, mw = statics.mask_hw
    fh, fw = statics.frame_hw
    k = statics.num_classes
    effects = list(statics.class_effects) or (
        [{"blur": statics.bg_blur_sigma}] + [{"keep": True}] * (k - 1)
    )

    s2d = statics.frame_layout == "s2d"

    def step(params, state: StreamState, frames_u8, background, knobs: PipelineKnobs, face_gate):
        s = frames_u8.shape[0]
        if s2d:
            # fast stack (same design as the single-class fast_int8 path):
            # packed ingestion feeds the HD trunk directly; the model
            # emits the class maps at mask resolution
            ca = bundle.matte_model.apply(params["matte"], frames_u8)["alpha"]
        else:
            frames_f32 = frames_u8.astype(jnp.float32) / 255.0
            # planar MXU resize (same taps; the 720p gather lowering is
            # the dominant cost of the multiclass step otherwise)
            small = jnp.stack(
                [
                    ops.resize_bilinear_mxu(
                        frames_f32[..., c], (mh, mw), method="asymmetric",
                        channel_last=False,
                    )
                    for c in range(3)
                ],
                axis=-1,
            )
            ca = bundle.matte_model.apply(params["matte"], small)["alpha"]
        ca = ca.astype(jnp.float32)  # [S, mh, mw, K]

        # per-class EMA over the class simplex; prev_alpha holds class 1..
        # (person) history plus a stacked buffer is overkill -- store the
        # full map in rec-like state? prev_alpha is [S,mh,mw]; keep the
        # full [S,mh,mw,K] in state.rec for multiclass mode.
        prev = ca if isinstance(state.rec, tuple) else state.rec
        kk = knobs.ema[:, None, None, None]
        init = state.initialized[:, None, None, None]
        if "model_only" in statics.debug_stage:
            # bench-only attribution: raw class maps straight through
            # (cost(EMA + renorm) = full - this, holding composite fixed)
            blended = ca
        else:
            # motion-adaptive gate on the class simplex (same semantics
            # as ops.temporal_ema's adapt: per pixel, the effective EMA
            # shrinks where the maps moved; m = max class delta so a
            # class handoff counts as motion).  adapt=0 = plain EMA.
            from video_stream_segmenetation_tpu.runtime.config import (
                EMA_ADAPT_T0,
                EMA_ADAPT_T1,
            )

            ad = knobs.ema_adapt[:, None, None, None]
            m = jnp.clip(
                (jnp.max(jnp.abs(ca - prev), axis=-1, keepdims=True)
                 - EMA_ADAPT_T0)
                * (1.0 / (EMA_ADAPT_T1 - EMA_ADAPT_T0)),
                0.0, 1.0,
            )
            ke = kk * (1.0 - ad * m)
            blended = jnp.where(init, ke * prev + (1 - ke) * ca, ca)
            blended = blended / jnp.maximum(
                blended.sum(-1, keepdims=True), 1e-6
            )

        if "no_composite" in statics.debug_stage:
            out_u8 = frames_u8  # bench-only: passthrough output
        elif s2d:
            out_u8 = ops.multiclass_composite_s2d(
                frames_u8, blended, effects, (fh, fw), statics.s2d_block,
                method=statics.upsample_method,
                # the EMA renorm above guarantees the simplex
                assume_simplex=True,
            )
        else:
            out_u8 = ops.multiclass_composite(
                frames_f32, blended, effects,
                upsample_method=statics.upsample_method, out_u8=True,
            )
        new_state = StreamState(
            prev_alpha=blended[..., 1:2].sum(-1) if k > 1 else blended[..., 0],
            affine=state.affine,
            has_affine=state.has_affine,
            initialized=jnp.ones_like(state.initialized),
            frame_idx=state.frame_idx + 1,
            rec=blended,
            face_center=state.face_center,
            has_center=state.has_center,
        )
        outputs = {
            "frame": out_u8,
            "alpha": blended[..., 1:2].sum(-1) if k > 1 else blended[..., 0],
            "class_alpha": blended,
            "det_score": jnp.zeros((s,), jnp.float32),
            "face_applied": jnp.zeros((s,), bool),
        }
        return new_state, outputs

    return step


def make_step(bundle: ModelBundle, statics: PipelineStatics):
    """Build the jittable step.

    step(params, state, frames_u8 [S,H,W,3], background [S or 1,H,W,3] f32
    0..1, knobs, face_gate [S] bool) -> (new_state, outputs dict)
    """
    if statics.num_classes > 1:
        if statics.frame_layout == "s2d" and statics.matting_input != "native":
            raise ValueError("multiclass s2d requires matting_input='native'")
        return make_multiclass_step(bundle, statics)
    mh, mw = statics.mask_hw
    fh, fw = statics.frame_hw
    s2d = statics.frame_layout == "s2d"
    if s2d and statics.matting_input != "native":
        raise ValueError("frame_layout='s2d' requires matting_input='native'")

    import jax as _jax

    if statics.resize_impl == "mxu":
        _pre_prec = (
            _jax.lax.Precision.DEFAULT
            if statics.preprocess_precision == "fast"
            else _jax.lax.Precision.HIGHEST
        )
        _resize_down = lambda f: ops.resize_bilinear_mxu(
            f, (mh, mw), method="asymmetric", precision=_pre_prec
        )
    else:
        _resize_down = lambda f: ops.resize_bilinear(f, (mh, mw), method="asymmetric")

    # fused-kernel routing is pure statics (+ backend), resolved once at
    # build time.  use_fused_tr = the full stages-3-9 kernel; planar_guide
    # additionally feeds it channel-leading u8 guide planes (half the
    # guide HBM traffic, no channel-minormost u8 relayout) -- only when
    # nothing else in the step needs an HWC/f32 guide view.
    use_fused = statics.use_fused_refine
    if use_fused == "auto":
        use_fused = _jax.default_backend() == "tpu"
    use_fused = use_fused and statics.morphology
    use_fused_tr = (
        use_fused
        and statics.warp_impl == "separable"
        and statics.temporal_filter == "ema"
        and statics.warp_blend_mode == "lerp"
    )
    # analytic prior: on the fused kernel path the face prior rides as 4
    # scalars per stream and is rasterized in VMEM -- the [S,mh,mw] f32
    # plane (render + scatter + kernel read, ~75 MB/step at S=64) never
    # exists (ops/prior.py::face_prior_params, kernels/refine_fused.py)
    analytic_prior = use_fused_tr and statics.prior_impl != "plane"
    prior_form = "params" if analytic_prior else "plane"
    planar_guide = (
        use_fused_tr
        and s2d
        and statics.matting_input == "native"
        and statics.matting_arch == "feedforward"
        and statics.guide_impl == "nearest_u8"
        and (
            not statics.face_path
            or (statics.face_compact and statics.face_tracking != "translation")
        )
    )
    # fast-kernel boundary cuts (kernels/refine_fused.py), resolved once
    # at build time.  'auto' = on for the TPU serving fast path only.
    _on_tpu = _jax.default_backend() == "tpu"
    _ra = statics.refine_alpha_src
    use_lowres_alpha = (
        use_fused_tr
        and analytic_prior
        and statics.matting_arch == "feedforward"
        and statics.matting_input == "native"
        and "model_only" not in statics.debug_stage
        and getattr(bundle.matte_model, "supports_lowres_alpha", False)
        and getattr(bundle.matte_model, "head_upsample", 1) > 1
        and not statics.guide_stem_aux
        and (_ra == "lowres" or (_ra == "auto" and _on_tpu))
    )
    _gk = statics.guide_kernel_unfold
    use_guide_lanes = (
        planar_guide
        and analytic_prior
        and not statics.guide_stem_aux
        and (_gk is True or (_gk == "auto" and _on_tpu))
        and ops.guide_s2d_sel(
            (fh, fw), (mh, mw), statics.s2d_block, planar=True
        )
        is not None
    )
    lane_geom = (
        (mh // (fh // statics.s2d_block), mw // (fw // statics.s2d_block))
        if use_guide_lanes
        else None
    )
    out_dtype_tr = (
        jnp.bfloat16
        if (statics.refined_dtype == "bf16" and use_fused_tr)
        else None
    )
    # host-produced guide lanes: the step takes frames as a
    # (packed, lanes) tuple -- the native framebuf emits the tap lanes
    # during its s2d pack, so the device never re-reads the frame batch
    # for the guide (config.py guide_source)
    host_lanes = use_guide_lanes and statics.guide_source == "host"

    def step(params, state: StreamState, frames_u8, background, knobs: PipelineKnobs, face_gate):
        """frames_u8: [S,H,W,3] natural, or s2d-packed [S,H/b,W/b,b*b*3]
        when statics.frame_layout == 's2d' (ops/layout.py); with
        guide_source='host' a (packed, guide_lanes [nl,S,hp,wp]) tuple."""
        host_guide_lanes = None
        if host_lanes:
            frames_u8, host_guide_lanes = frames_u8
        s = frames_u8.shape[0]
        # natural-layout view: the matting model consumes frames_u8 as
        # delivered (the packed layout feeds the stem matmul directly);
        # the composite / face-resize stages read the natural layout
        frames_nat = (
            ops.depth_to_space(frames_u8, statics.s2d_block) if s2d else frames_u8
        )
        frames_f32 = frames_nat.astype(jnp.float32) / 255.0

        # ---- stages 1+2: preprocess + matting forward
        new_rec = state.rec
        if statics.matting_arch == "recurrent":
            # RVM-class stateful matting (the frameProcessorRVM.ts variant):
            # resize to mask res, thread the ConvGRU state pytree
            small = _resize_down(frames_f32)
            out_m = bundle.matte_model.apply(params["matte"], small, state.rec)
            alpha_raw = out_m["alpha"].astype(jnp.float32)
            new_rec = out_m["state"]
        elif statics.matting_input == "native":
            # TPU-first: the model ingests uint8 frames; its strided stem
            # IS the resize (see models/mattenet_hd.py).  Optionally the
            # planar guide gather rides the stem matmul as extra one-hot
            # columns so the packed frames are read -- and relayout-copied
            # for the dot -- ONCE instead of twice.  Default OFF: measured
            # slower on v5e (see PipelineStatics.guide_stem_aux).
            guide_sel = None
            if (
                statics.guide_stem_aux
                and s2d
                and planar_guide
                and getattr(bundle.matte_model, "supports_stem_aux", False)
                and getattr(bundle.matte_model, "stem_impl", "bf16") == "bf16"
            ):
                guide_sel = ops.guide_s2d_sel(
                    (fh, fw), (mh, mw), statics.s2d_block, planar=True
                )
            if guide_sel is not None:
                onehot = np.zeros(
                    (frames_u8.shape[-1], len(guide_sel)), np.float32
                )
                onehot[np.asarray(guide_sel), np.arange(len(guide_sel))] = 1.0
                out_m = bundle.matte_model.apply(
                    params["matte"], frames_u8,
                    stem_aux_cols=jnp.asarray(onehot, jnp.bfloat16),
                )
                alpha_raw = out_m["alpha"]
                guide_pl_u8 = ops.guide_from_gathered(
                    out_m["stem_aux"], (fh, fw), (mh, mw), statics.s2d_block,
                    planar=True,
                )
                small = None
            else:
                out_m = bundle.matte_model.apply(params["matte"], frames_u8)
                # lowres: head-grid logits go straight to the fused
                # kernel (upsample+sigmoid in VMEM); XLA DCEs the unused
                # full-res 'alpha' output
                alpha_raw = (
                    out_m["alpha_logit_lr"] if use_lowres_alpha
                    else out_m["alpha"]
                )
            guide_lanes = None
            if statics.guide_impl == "nearest_u8" and guide_sel is not None:
                pass  # planar guide already gathered off the stem dot
            elif statics.guide_impl == "nearest_u8":
                if s2d and planar_guide and use_guide_lanes:
                    # raw lanes: the planar reassembly happens in VMEM
                    # inside the fused kernel (and per cadence-subset in
                    # the face path) -- no full-batch planar guide in HBM
                    if host_guide_lanes is not None:
                        guide_lanes = host_guide_lanes
                    else:
                        guide_lanes, _ = ops.guide_lanes_s2d(
                            frames_u8, (fh, fw), (mh, mw), statics.s2d_block
                        )
                    guide_pl_u8 = None
                    small = None
                elif s2d and planar_guide:
                    # channel-leading u8 planes [S,3,mh,mw]: the fused
                    # kernel converts in VMEM and the face path gathers
                    # its cadence subset post-hoc -- the full-batch
                    # HWC/f32 guide views never materialize
                    guide_pl_u8 = ops.guide_from_s2d(
                        frames_u8, (fh, fw), (mh, mw), statics.s2d_block,
                        planar=True,
                    )
                    small = None
                elif s2d:
                    # periodic-tap lane gather straight off the packed
                    # frames -- no natural-layout round trip
                    guide_u8 = ops.guide_from_s2d(
                        frames_u8, (fh, fw), (mh, mw), statics.s2d_block
                    )
                    small = guide_u8.astype(jnp.float32) / 255.0
                else:
                    guide_u8 = ops.resize_nearest(
                        frames_u8, (mh, mw), method="half_pixel"
                    )
                    small = guide_u8.astype(jnp.float32) / 255.0
            else:
                small = _resize_down(frames_f32)
        else:
            # reference-style (tf.js resizeBilinear parity, :79-84)
            small = _resize_down(frames_f32)
            alpha_raw = bundle.matte_model.apply(params["matte"], small)["alpha"]
        alpha_raw = alpha_raw.astype(jnp.float32)

        # ---- stage 6 (computed early; applied by masks below)
        # face-source selection: full-res frames (reference-exact) or the
        # mask-res guide (face_input='guide': FD/ROI sample `small`,
        # coordinates live in mask space so frame_hw := mask_hw)
        face_planar = False
        face_lanes_geom = None
        if statics.face_input == "guide":
            fstat = dataclasses.replace(statics, frame_hw=(mh, mw))
            if planar_guide and use_guide_lanes:
                # compact path gathers the <= K cadence streams from the
                # raw lane tensor and reassembles only that tiny subset
                face_src, face_src_u8, face_blk = None, guide_lanes, None
                face_planar = True
                face_lanes_geom = lane_geom
            elif planar_guide:
                # compact path gathers the <= K cadence streams from the
                # planar u8 guide and relayouts only that tiny subset
                face_src, face_src_u8, face_blk = None, guide_pl_u8, None
                face_planar = True
            elif (
                statics.matting_arch == "feedforward"
                and statics.matting_input == "native"
                and statics.guide_impl == "nearest_u8"
            ):
                # gather the cadence subset from the u8 guide (4x less
                # HBM traffic than the f32 view; with the fused refine
                # kernel consuming a bf16 guide, the full-batch f32
                # guide then never materializes at all)
                face_src, face_src_u8, face_blk = small, guide_u8, None
            else:
                face_src, face_src_u8, face_blk = small, small, None
        else:
            fstat = statics
            face_src, face_src_u8 = frames_f32, frames_u8
            face_blk = statics.s2d_block if s2d else None
        new_center, new_has_center = state.face_center, state.has_center
        if (
            statics.face_path
            and bundle.face_model is not None
            and statics.face_tracking == "translation"
        ):
            (affine_update, has_update, det_score, new_center, new_has_center
             ) = _face_translation_subpath(
                bundle, params, face_src, state, fstat, face_gate
            )
            prior = jnp.zeros(
                (s, 4) if analytic_prior else (s, mh, mw), jnp.float32
            )
            has_prior = jnp.zeros((s,), bool)
        elif statics.face_path and bundle.face_model is not None:
            if statics.face_compact:
                # pass raw u8 where possible: the compact path converts
                # post-gather
                prior, has_prior, affine_update, has_update, det_score = (
                    _face_subpath_compact(
                        bundle, params, face_src_u8, state, fstat, face_gate,
                        s2d_block=face_blk, src_planar=face_planar,
                        prior_form=prior_form, src_lanes_geom=face_lanes_geom,
                    )
                )
            else:
                fire = ((state.frame_idx % statics.lmk_interval) == 0) & face_gate
                prior, has_prior, affine_update, has_update, det_score = (
                    _face_subpath(
                        bundle, params, face_src, fire, fstat,
                        prior_form=prior_form,
                    )
                )
        else:
            prior = jnp.zeros(
                (s, 4) if analytic_prior else (s, mh, mw), jnp.float32
            )
            has_prior = jnp.zeros((s,), bool)
            affine_update = jnp.zeros((s, 6), jnp.float32)
            has_update = jnp.zeros((s,), bool)
            det_score = jnp.zeros((s,), jnp.float32)

        # canvas-u8-scale RGB guide, quantized to integer pixel values
        # (the reference guide is u8 canvas data, frameProcessorTest.ts:315-321);
        # in planar mode the u8 planes go to the kernel directly
        guide = None if planar_guide else jnp.floor(small * 255.0 + 0.5)
        # use_fused / use_fused_tr / planar_guide resolved at build time

        if "model_only" in statics.debug_stage:
            # bench-only attribution: raw model alpha straight to the
            # composite (cost(refine chain) = full - this)
            new_prev, a = alpha_raw, alpha_raw
        elif use_fused_tr:
            from video_stream_segmenetation_tpu.kernels.refine_fused import (
                fused_temporal_refine,
            )

            kdebug = tuple(
                t for t in ("no_morph", "no_bilateral")
                if t in statics.debug_stage
            )
            kguide = (
                guide_lanes if use_guide_lanes
                else (guide_pl_u8 if planar_guide else guide)
            )
            if "no_guide" in statics.debug_stage and planar_guide:
                # bench-only: constant guide -- the gather off the packed
                # frames is DCE'd, attributing its cost
                kguide = jnp.zeros_like(kguide)
            new_prev, a = fused_temporal_refine(
                alpha_raw, state.prev_alpha, state.affine,
                state.has_affine & state.initialized, state.initialized,
                statics.warp_blend_weight,
                kguide, None if analytic_prior else prior,
                knobs.ema, knobs.noise_cutoff, knobs.high_threshold,
                knobs.gamma, knobs.use_bilateral, knobs.sigma_spatial,
                knobs.sigma_range, has_prior,
                knobs_ema_adapt=knobs.ema_adapt,
                guide_planar=planar_guide, debug=kdebug,
                prior_params=prior if analytic_prior else None,
                alpha_lowres_hw=(mh, mw) if use_lowres_alpha else None,
                guide_lanes_geom=lane_geom if use_guide_lanes else None,
                out_dtype=out_dtype_tr,
            )
            base = None  # consumed inside the kernel
        else:
            # ---- stage 3: motion-compensated warp of prev alpha (:102-112)
            if statics.warp_impl == "separable":
                warped = ops.warp_affine_separable(state.prev_alpha, state.affine)
            else:
                warped = ops.warp_affine_nearest(state.prev_alpha, state.affine)
            w_blend = statics.warp_blend_weight
            use_warp = (state.has_affine & state.initialized)[:, None, None]
            if statics.warp_blend_mode == "max":
                blended = jnp.maximum(alpha_raw, warped * w_blend)
            else:
                blended = warped * w_blend + alpha_raw * (1 - w_blend)
            base = jnp.where(use_warp, blended, alpha_raw)

            # ---- stage 4: temporal filter (:115 / branch variant :155-180;
            # 'none' = the U2Net variant, which has no temporal stage)
            if statics.temporal_filter == "none":
                new_prev, a = base, base
            elif statics.temporal_filter == "hole_fill":
                new_prev, a = ops.hole_filling_ema(
                    state.prev_alpha, base, knobs.ema, state.initialized
                )
            else:
                new_prev, a = ops.temporal_ema(
                    state.prev_alpha, base, knobs.ema, state.initialized,
                    adapt=knobs.ema_adapt,
                )

        if use_fused_tr or "model_only" in statics.debug_stage:
            pass  # refinement already applied / skipped (bench attribution)
        elif use_fused:
            # stages 5/7/8/9 in one VMEM-resident Pallas kernel
            from video_stream_segmenetation_tpu.kernels.refine_fused import fused_refine

            a = fused_refine(
                a, guide, prior,
                knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
                knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
                has_prior,
            )
        else:
            if statics.morphology:
                # ---- stage 5: morphological opening (:118)
                a = ops.morphological_opening(a)

                # ---- stage 7: prior-gated closing (:157)
                a = ops.morphological_closing_in_prior(a, prior, has_prior)

            # ---- stage 8: joint bilateral, per-stream toggle (:160-163)
            a_bi = ops.joint_bilateral3x3(a, guide, knobs.sigma_spatial, knobs.sigma_range)
            a = jnp.where(knobs.use_bilateral[:, None, None], a_bi, a)

            # ---- stage 9: threshold/gamma/prior refine (:166)
            a = ops.refine_alpha(
                a, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma, prior, has_prior
            )

        # ---- stage 10: upsample + composite (:169-178 + CSS stacking)
        from video_stream_segmenetation_tpu.kernels.composite_fused import (
            ROW_BLOCK,
            fused_composite,
        )

        use_fc = statics.use_fused_composite
        if use_fc == "auto":
            use_fc = False  # see config note: XLA path currently faster
        use_fc = (
            use_fc
            and statics.background in ("image", "color")
            and fh % ROW_BLOCK == 0
        )
        if "no_composite" in statics.debug_stage:
            out_u8 = frames_u8  # bench-only: passthrough output
        elif s2d and statics.background in ("image", "color"):
            # packed-layout composite: upsample + blend without ever
            # reconstructing the natural layout on device (ops/layout.py;
            # a full-batch depth_to_space costs ~27 ms at S=64x720p)
            blk = statics.s2d_block
            if statics.background == "color":
                bg_p = jnp.broadcast_to(
                    ops.packed_color(statics.bg_color, blk), frames_u8.shape
                )
            else:
                bg_p = background
                if bg_p.shape[-1] == 3:  # direct step callers: pack here
                    if bg_p.dtype != jnp.uint8:
                        bg_p = jnp.clip(
                            jnp.floor(bg_p.astype(jnp.float32) * 255.0 + 0.5),
                            0, 255,
                        ).astype(jnp.uint8)
                    bg_p = ops.space_to_depth(bg_p, blk)
                bg_p = jnp.broadcast_to(bg_p, frames_u8.shape)
            prec = (
                _jax.lax.Precision.DEFAULT
                if statics.upsample_precision == "fast"
                else _jax.lax.Precision.HIGHEST
            )
            _sc = statics.s2d_composite_s_chunk
            if _sc == "auto":
                # the relayout cliff starts between S=96 (clean, and
                # chunking 64+32 there LOSES 0.9 ms) and S=112; engage
                # only above it (benchmarks/RESULTS.md 2026-08-19 sweep)
                _sc = 64 if (_on_tpu and frames_u8.shape[0] > 96) else None
            out_u8 = ops.alpha_composite_s2d(
                frames_u8, a, bg_p, (fh, fw), blk,
                method=statics.upsample_method, precision=prec,
                impl=statics.s2d_composite_impl, s_chunk=_sc,
            )
        elif use_fc:
            if statics.background == "color":
                bg_u8 = jnp.broadcast_to(
                    jnp.floor(
                        jnp.asarray(statics.bg_color, jnp.float32) * 255.0 + 0.5
                    ).astype(jnp.uint8),
                    frames_nat.shape,
                )
            else:
                bg_u8 = background
                if bg_u8.dtype != jnp.uint8:
                    bg_u8 = jnp.clip(
                        jnp.floor(bg_u8 * 255.0 + 0.5), 0, 255
                    ).astype(jnp.uint8)
                bg_u8 = jnp.broadcast_to(bg_u8, frames_nat.shape)
            out_u8 = fused_composite(
                frames_nat, a, bg_u8, method=statics.upsample_method
            )
        else:
            if statics.background == "blur":
                bg = ops.gaussian_blur_auto(frames_f32, statics.bg_blur_sigma)
            elif statics.background == "color":
                bg = jnp.broadcast_to(
                    jnp.asarray(statics.bg_color, jnp.float32), frames_f32.shape
                )
            else:
                bg = background
                if bg.dtype == jnp.uint8:
                    bg = bg.astype(jnp.float32) / 255.0
                bg = jnp.broadcast_to(bg, frames_f32.shape)
            a_out = a
            if statics.upsample_impl == "mxu":
                import jax as ____jax

                prec = (
                    ____jax.lax.Precision.DEFAULT
                    if statics.upsample_precision == "fast"
                    else ____jax.lax.Precision.HIGHEST
                )
                # channelless planar resize contracts cleanly on the MXU
                # (exact taps; the channel-last variant is pathological)
                a_out = jnp.clip(
                    ops.resize_bilinear_mxu(
                        a, (fh, fw), method=statics.upsample_method,
                        channel_last=False, precision=prec,
                    ),
                    0.0,
                    1.0,
                )
            out_u8 = ops.alpha_composite(
                frames_f32,
                a_out,
                background=bg,
                upsample_method=statics.upsample_method,
                out_u8=True,
            )

        # ---- affine merge for next frame
        if statics.face_tracking == "translation":
            # per-frame displacement, not a persistent transform: apply
            # once, then identity (frameProcessor.ts:375-384 semantics)
            ident = jnp.tile(jnp.asarray(IDENTITY_AFFINE, jnp.float32), (s, 1))
            new_affine = jnp.where(has_update[:, None], affine_update, ident)
            new_has_affine = has_update
        else:
            # low-pass merge (main.ts:77-94)
            new_affine, new_has_affine = ops.affine_lowpass(
                state.affine, affine_update, statics.warp_gain, state.has_affine, has_update
            )

        new_state = StreamState(
            prev_alpha=new_prev,
            affine=new_affine,
            has_affine=new_has_affine,
            initialized=jnp.ones_like(state.initialized),
            frame_idx=state.frame_idx + 1,
            rec=new_rec,
            face_center=new_center,
            has_center=new_has_center,
        )
        outputs = {
            "frame": out_u8,
            "alpha": a,
            "det_score": det_score,
            "face_applied": has_update,
        }
        if analytic_prior or statics.debug_face_outputs:
            # intra-step face evidence for the oracle-chain parity harness
            # (tools/parity_matting.py): the prior used by stages 7/9 is
            # computed inside the step, so it must ride the outputs to be
            # observable.  Analytic form: [S,4] + [S] scalars -- free, so
            # always on; plane form only under debug_face_outputs.
            key = ("face_prior_params" if analytic_prior
                   else "face_prior_plane")
            outputs[key] = prior
            outputs["face_has_prior"] = has_prior
        return new_state, outputs

    return step


def make_range_step(bundle: ModelBundle, statics: PipelineStatics):
    """Group-ranged step over the FULL stream state, built for the
    multiplexed group rotation (StreamScheduler ``group_sizes``; the
    production form of the reference's rAF serving loop,
    client/src/core/main.ts:52-111, at many-stream scale).

    ``range_step(params, full_state, i0, frames, full_backgrounds,
    full_knobs, face_gate[gs]) -> (new_full_state, outputs)``

    The group's rows ``[i0, i0+gs)`` are sliced out of the full state ON
    DEVICE (``lax.dynamic_slice``), stepped, and written back with
    ``lax.dynamic_update_slice`` -- so when the caller jits this with the
    full state donated, XLA aliases the output buffer onto the input and
    the group update happens IN PLACE.  The eager host-side alternative
    (``rows(state)`` + ``state.at[i0:i1].set(g)``, Engine.process_range)
    rewrites the whole state every tick: ~230 MB of HBM traffic for a
    400-stream EMA state, which is the difference between the raw-step
    round and a production round that fits the 33.33 ms budget.

    ``gs`` is static per trace (one compile per distinct group size, like
    the shape-polymorphic plain step); ``i0`` is a traced scalar, so the
    rotation's different offsets share one executable.

    The face min-interval bookkeeping is IN-GRAPH: ``face_last`` [S] f32
    (seconds since the engine epoch of each stream's last face
    application, device-resident) and the scalar ``now`` ride the same
    program -- the gate compare and the applied-scatter cost nothing,
    and the serving loop makes exactly ONE dispatch per tick (any extra
    per-tick host->device round trip is the difference between a 33 ms
    and a ~60 ms round on a tunneled transport, and real latency even on
    local PCIe).
    """
    step = make_step(bundle, statics)
    import jax as _jax

    def range_step(params, full_state, i0, frames, full_bgs, full_knobs,
                   face_last, now, min_interval, gs: int):
        sl = lambda x: _jax.lax.dynamic_slice_in_dim(x, i0, gs, axis=0)
        gstate = _jax.tree_util.tree_map(sl, full_state)
        gknobs = _jax.tree_util.tree_map(sl, full_knobs)
        gbgs = full_bgs if full_bgs.shape[0] == 1 else sl(full_bgs)
        last_g = sl(face_last)
        face_gate = (now - last_g) >= min_interval
        new_g, out = step(params, gstate, frames, gbgs, gknobs, face_gate)
        upd = lambda f, g: _jax.lax.dynamic_update_slice_in_dim(f, g, i0, axis=0)
        new_full = _jax.tree_util.tree_map(upd, full_state, new_g)
        new_last_g = jnp.where(
            out["face_applied"], now.astype(last_g.dtype), last_g
        )
        new_face_last = upd(face_last, new_last_g)
        return new_full, new_face_last, out

    return range_step


def make_round_step(bundle: ModelBundle, statics: PipelineStatics,
                    group_sizes: "list[int]"):
    """One FULL rotation round as a single program: every group's ranged
    step (make_range_step semantics: in-graph slice/scatter over the full
    donated state, device-resident face gate) unrolled over the
    schedule's static offsets.

    ``round(params, full_state, frames_list, full_bgs, full_knobs,
    face_last, now, min_interval) -> (new_full_state, new_face_last,
    [outputs per group])``

    Why: dispatching the round as ONE executable lets the device overlap
    the groups' independent stages — group g+1's matting forward reads
    only its frames while group g's tail writes disjoint state rows — so
    a 4x96 round measures ~25 ms on v5e where per-group dispatch rounds
    measure ~32 (tools/bench_rollout_ablate.py, 2026-08-20), and the
    host pays ONE dispatch per round instead of one per group (the
    difference between a 33 ms and a ~60+ ms round on a tunneled
    transport).  Semantics note: the whole round shares one staged-knob
    snapshot and one ``now`` — per-round rather than per-tick
    granularity for knob application and the face min-interval clock
    (the reference applies config at frame granularity, script.ts:20-25;
    a round IS the frame interval here).
    """
    import numpy as _np

    rstep = make_range_step(bundle, statics)
    offs = _np.concatenate([[0], _np.cumsum(group_sizes)]).astype(int)

    def round_step(params, full_state, frames_list, full_bgs, full_knobs,
                   face_last, now, min_interval):
        outs = []
        for g, gs in enumerate(group_sizes):
            full_state, face_last, out = rstep(
                params, full_state, int(offs[g]), frames_list[g],
                full_bgs, full_knobs, face_last, now, min_interval,
                gs=int(gs),
            )
            outs.append(out)
        return full_state, face_last, outs

    return round_step


def segment_once(bundle: ModelBundle, statics: PipelineStatics):
    """Single-shot `segment(frame) -> mask` (the public surface named in
    BASELINE.json): preprocess + matting forward, no temporal state."""

    def seg(params, frames_u8):
        frames_f32 = frames_u8.astype(jnp.float32) / 255.0
        small = ops.resize_bilinear(frames_f32, statics.mask_hw, method="asymmetric")
        return bundle.matte_model.apply(params["matte"], small)["alpha"].astype(
            jnp.float32
        )

    return seg
