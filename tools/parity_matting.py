"""Flagship matting parity -- the BASELINE ">= 0.99 mask IoU vs reference
model" metric, closed as far as this environment permits (VERDICT r2 #3).

ACQUISITION RECORD (dated 2026-08-19, re-verified 2026-08-20)
-------------------------------------------------------------
The reference serves `client/src/assets/model_q4f16.onnx`
(client/src/core/main.ts:6) but does NOT commit it: only the face ONNX
graphs ship (`client/src/assets/`: MediaPipeFaceDetector.onnx,
MediaPipeFaceLandmarkDetector.onnx, blaze.onnx -- imported losslessly in
PARITY.json).  The upstream public MODNet weights the file derives from
exist on the open internet, but this build environment has NO network
egress: DNS resolution fails (`urllib.request.urlopen('https://pypi.org')`
-> URLError 'Name or service not known', checked 2026-08-19), and no
MODNet artifact exists anywhere on the image
(`find / -iname '*modnet*'` matches only our own models/modnet.py).
Direct mask-vs-reference-model parity is therefore STRUCTURALLY
UNMEASURABLE here; `tools/parity_check.py --onnx-ref <weights>` closes
the loop with zero code changes the day weights (or exported masks,
--ref masks.npz) exist.

STRONGEST AVAILABLE SUBSTITUTE (measured by this tool)
------------------------------------------------------
Agreement numbers on realistic clips -- ARTICULATED procedural people
(train/person.py: capsule skeleton, hair fringe, clothing texture,
occluders, camera shake; utils/clips.py::articulated_clip) moving over
the reference repo's own committed real photographs
(client/src/assets/backgrounds/, train/realdata.py):

1. int8_vs_float_pipeline: the int8 fast-stack serving pipeline (the
   role model_q4f16.onnx plays: quantized serving of the flagship) vs
   the SAME trained flagship served in float -- full production
   pipeline both sides.  This is exactly the quantized-vs-model
   relationship the reference metric pins, with only the model identity
   substituted (weights unavailable, above).
2. engine_vs_reference_semantics_oracle: the engine's temporal+refine
   chain vs the LITERAL per-pixel NumPy port of the reference's JS
   formulas (tests/oracles.py, file:line-cited), fed the same model
   alpha -- end-to-end stage-semantics parity on moving video rather
   than single-op unit fixtures (stage order per
   frameProcessorTest.ts: warp/blend :102-112 -> EMA :218-227 ->
   opening :644-685 -> prior closing :743-787 -> joint bilateral
   :230-266 -> threshold/gamma :270-313).  Run twice: without the face
   path, and WITH it on a clip whose synthetic face the trained
   detector fires on -- the warp + face-prior stages are then pinned on
   moving video using the engine's own captured per-frame face evidence
   (affine state + analytic prior params).
3. iou_vs_ground_truth for both pipelines (the quality floor; the
   held-out headline lives in benchmarks/RESULTS.json).

Writes the 'matting' section of PARITY.json.

Run: python tools/parity_matting.py            (CPU, ~20-40 min)
     JAX_PLATFORMS= VST_TPU=1 python tools/parity_matting.py  (real chip)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("VST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The flagship checkpoints are fine-tuned AT SERVING RESOLUTION
# (tools/train_flagship.py: the fine-tune phase is mandatory, IoU
# 0.20 -> 0.99) -- parity MUST run at serving geometry or the agreement
# numbers describe garbage masks.  VST_SMALL=1 runs a reduced-geometry
# smoke test of the harness itself (numbers not meaningful for quality).
if os.environ.get("VST_SMALL"):
    FRAME_HW, MASK_HW, T, T_ORACLE = (240, 320), (96, 128), 8, 4
else:
    FRAME_HW, MASK_HW, T, T_ORACLE = (720, 1280), (288, 512), 32, 12
CKPT_NAME = os.environ.get("VST_CKPT", "mattenet_hd10_pico")
CKPT = os.path.join(ROOT, "checkpoints", CKPT_NAME)


def build_engine(face: bool = False, **overrides):
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    base = preset("fast_int8_pico")
    statics = dataclasses.replace(
        base,
        frame_hw=FRAME_HW, mask_hw=MASK_HW, background="color",
        face_path=face,
        # face engines keep the preset's serving geometry (trained
        # checkpoints are geometry-suffixed); non-face engines shrink
        # the unused face models to cut build time
        fd_size=base.fd_size if face else 64,
        lmk_size=base.lmk_size if face else 48,
        **overrides,
    )
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.load_matting_params(CKPT)
    if face:
        from video_stream_segmenetation_tpu.utils import (
            face_checkpoint_paths,
        )

        eng.load_face_params(*face_checkpoint_paths(
            os.path.join(ROOT, "checkpoints"),
            statics.fd_size, statics.lmk_size,
        ))
    eng.admit()
    return eng


def run_with_capture(eng, clip):
    """Feed a clip through stream 0, capturing per-frame the face
    evidence the refine chain consumed: the PRE-step affine state (what
    stage 3 warps with) and the intra-step analytic prior params
    (pipeline outputs face_prior_params/face_has_prior)."""
    fh, fw = eng.statics.frame_hw
    batch = np.zeros((eng.num_streams, fh, fw, 3), np.uint8)
    masks, caps = [], []
    for t in range(len(clip.frames)):
        pre = {
            "affine": np.asarray(eng.state.affine)[0].astype(np.float64),
            "has_affine": bool(np.asarray(eng.state.has_affine)[0])
            and bool(np.asarray(eng.state.initialized)[0]),
        }
        batch[0] = clip.frames[t]
        out = eng.process(batch)
        masks.append(np.asarray(out["alpha"])[0])
        if "face_prior_params" in out:
            pre["prior"] = np.asarray(out["face_prior_params"])[0]
            pre["has_prior"] = bool(np.asarray(out["face_has_prior"])[0])
        elif "face_prior_plane" in out:
            # XLA-chain engines carry the rendered plane (the analytic
            # params only exist on the fused-kernel path); rasterization
            # itself is pinned at unit level (tests/test_ops_refinement)
            pre["prior_plane"] = np.asarray(out["face_prior_plane"])[0]
            pre["has_prior"] = bool(np.asarray(out["face_has_prior"])[0])
        # post-step affine state: True once any detection was ever applied
        pre["face_applied"] = bool(np.asarray(eng.state.has_affine)[0])
        pre["det_score"] = float(np.asarray(out["det_score"])[0])
        caps.append(pre)
    return np.stack(masks), caps


def prior_mask_oracle(params4):
    """Rasterize the reference prior from the engine's analytic params
    by inverting ops.face_prior_params (face coords == mask coords for
    face_input='guide', so the box->prior conversion is identity-scaled)
    and feeding the box to the literal oracle."""
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import oracles

    cx, cy, rx, ry = [float(v) for v in params4]
    box = (cx - rx / 1.12, cy - ry / 1.4, cx + rx / 1.12, cy + ry / 1.4)
    mh, mw = MASK_HW
    return oracles.face_prior_oracle(box, mw, mh, mw, mh)


def oracle_chain(model_masks, frames, caps=None, warp_w=0.5):
    """The reference's refine chain as the literal per-pixel oracle port
    (tests/oracles.py), at default knob values.  With ``caps`` (the
    engine's captured per-frame face evidence) the warp/blend stage and
    the face-prior closing/clamps run too -- the full stage 3..9 chain
    on moving video; without it the no-face subset (stage 3 idle, prior
    None), matching a face_path=False engine."""
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import oracles

    from video_stream_segmenetation_tpu.runtime import config as cfg

    out = np.zeros_like(model_masks)
    prev = None
    for t in range(len(model_masks)):
        a = model_masks[t].astype(np.float64)
        prior = None
        if caps is not None:
            c = caps[t]
            # stage 3 warp/blend (:102-112): warp prev by the pre-step
            # affine, mix-blend into the raw alpha
            if c["has_affine"] and prev is not None:
                warped = oracles.warp_affine_nearest_oracle(
                    prev, tuple(c["affine"])
                )
                a = warped * warp_w + a * (1.0 - warp_w)
            if c.get("has_prior"):
                prior = (
                    prior_mask_oracle(c["prior"]) if "prior" in c
                    else c["prior_plane"].astype(np.float64)
                )
        prev, a = oracles.ema_oracle(prev, a, cfg.DEFAULT_EMA)
        a = oracles.opening_oracle(a)
        a = oracles.closing_in_prior_oracle(a, prior)
        guide = np.floor(
            oracles.resize_bilinear_tfjs_oracle(
                frames[t].astype(np.float64), *MASK_HW
            )
            + 0.5
        )
        a = oracles.bilateral_oracle(
            a, guide, cfg.DEFAULT_BILATERAL_SIGMA_SPATIAL,
            cfg.DEFAULT_BILATERAL_SIGMA_RANGE,
        )
        a = oracles.refine_oracle(
            a, cfg.DEFAULT_NOISE_CUTOFF, cfg.DEFAULT_HIGH_THRESHOLD,
            cfg.DEFAULT_GAMMA, prior,
        )
        out[t] = a
    return out


def main():
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.train.realdata import (
        load_background_bank,
    )
    from video_stream_segmenetation_tpu.utils.clips import (
        articulated_clip,
        parity_report,
        run_clip_through_engine,
    )

    bank = load_background_bank(FRAME_HW, max_images=8, oversample=2)
    # articulated people over the reference's real photos: a desk-
    # occluded clip, a waving clip (fast limb motion), a plain one, and
    # a face-featured waving clip for the face-path oracle run
    clips = [
        articulated_clip(T, FRAME_HW, seed=0, bank=bank, occluder_p=1.0),
        articulated_clip(T, FRAME_HW, seed=1, bank=bank, wave=True,
                         shake_px=3.0, occluder_p=0.0),
        articulated_clip(T, FRAME_HW, seed=2, bank=bank, occluder_p=1.0,
                         motion=1.5),
    ]
    face_clip = articulated_clip(
        T, FRAME_HW, seed=3, bank=bank, features=True, wave=True,
        occluder_p=0.0, shake_px=1.5,
    )

    print("serving pipelines...", flush=True)
    import faulthandler, time as _t

    # the tunnel makes eager init latency-bound; a periodic stack dump
    # locates any stall without guessing (stderr -> run log)
    faulthandler.dump_traceback_later(300, repeat=True)
    t0 = _t.perf_counter()
    eng_i8 = build_engine()
    print(f"engine int8 built {_t.perf_counter()-t0:.0f}s", flush=True)
    eng_f = build_engine(matting_precision="bf16")
    print(f"engine bf16 built {_t.perf_counter()-t0:.0f}s", flush=True)
    eng_model = build_engine(
        matting_precision="bf16", debug_stage="model_only"
    )
    print(f"engine model_only built {_t.perf_counter()-t0:.0f}s", flush=True)
    # the dump was added to locate engine-build stalls; cancel it so the
    # long eval phase doesn't spam full-process stacks every 5 minutes
    faulthandler.cancel_dump_traceback_later()

    import jax.numpy as jnp

    downs = jax.jit(
        lambda a: ops.resize_bilinear(a[..., None], MASK_HW,
                                      method="asymmetric")[..., 0]
    )

    m_i8, m_f, m_oracle, m_f_oracle_frames, gt = [], [], [], [], []
    for ci, c in enumerate(clips):
        print(f"clip {ci}...", flush=True)
        for e in (eng_i8, eng_f, eng_model):
            # fresh stream per clip: no temporal-state leak across clips
            e.evict(0)
            e.admit()
        m_i8.append(run_clip_through_engine(eng_i8, c))
        mf = run_clip_through_engine(eng_f, c)
        m_f.append(mf)
        gt.append(np.asarray(downs(jnp.asarray(c.alpha))))
        if ci == 0:
            # the literal per-pixel oracle is ~1 min/frame at 288x512;
            # one clip's first T_ORACLE frames pin the chain semantics
            # (EMA is stateful, so the prefix must be contiguous).
            # The oracle is the REFERENCE formula chain, so this run uses
            # the compatibility mode (ema_adapt=0 = reference-exact fixed
            # EMA); the *_vs_gt rows above keep the shipped default
            # (motion-adaptive EMA, the preset's quality improvement).
            mm = run_clip_through_engine(eng_model, c)
            eng_f.evict(0)
            eng_f.admit()
            eng_f.set_knobs(0, ema_adapt=0.0)
            mf_compat = run_clip_through_engine(eng_f, c)
            eng_f.evict(0)
            eng_f.admit()
            eng_f.reset_knobs(0)  # back to preset defaults for later clips
            print("oracle chain (no face)...", flush=True)
            m_oracle.append(oracle_chain(mm[:T_ORACLE], c.frames[:T_ORACLE]))
            m_f_oracle_frames.append(mf_compat[:T_ORACLE])
    cat = lambda xs: np.concatenate(xs, axis=0)
    # EMA warmup: the first frames of a fresh stream carry a cold
    # temporal state (first-frame-copy semantics); the *_vs_gt quality
    # metrics skip them per clip, same stance as tools/eval_variants.py
    # (t >= 5).  The agreement metrics (int8-vs-float, engine-vs-oracle)
    # keep every frame -- both sides share the warmup.
    WARM = 5  # same warmup convention as tools/eval_variants.py (t >= 5)
    catw = lambda xs: np.concatenate([x[WARM:] for x in xs], axis=0)
    m_i8_l, m_f_l, gt_l = m_i8, m_f, gt
    m_i8, m_f, gt = cat(m_i8), cat(m_f), cat(gt)
    m_oracle, m_f_or = cat(m_oracle), cat(m_f_oracle_frames)

    # ---- no-smoothing quality bound: the EMA live-knob at 0 ----------
    # Default knobs pay the reference's own temporal-smoothing lag on
    # fast motion (EMA 0.55, frameProcessorTest.ts:21): the pipeline
    # tracks ~0.04 IoU behind its own model on waving/moving clips.
    # The knob is a per-stream live control (PipelineKnobs.ema); this
    # run pins the segmentation quality itself, lag excluded.
    eng_f0 = build_engine(matting_precision="bf16")
    m_f0 = []
    for c in clips:
        eng_f0.evict(0)
        eng_f0.admit()
        eng_f0.set_knobs(0, ema=0.0)
        m_f0.append(run_clip_through_engine(eng_f0, c))

    # ---- face-path run: engine face evidence drives the oracle chain --
    print("face-path engines...", flush=True)
    eng_face = build_engine(
        face=True, matting_precision="bf16", debug_face_outputs=True
    )
    eng_face_model = build_engine(
        face=True, matting_precision="bf16", debug_stage="model_only"
    )
    eng_face_i8 = build_engine(face=True)
    mfc, caps = run_with_capture(eng_face, face_clip)
    mfc_i8, _ = run_with_capture(eng_face_i8, face_clip)
    mmc, _ = run_with_capture(eng_face_model, face_clip)
    # oracle comparison at the reference-compat mode (fixed EMA): the
    # per-pixel oracle implements the reference's formulas, so the
    # engine side must run with ema_adapt=0 (the *_vs_gt rows keep the
    # shipped adaptive default)
    eng_face.evict(0)
    eng_face.admit()
    eng_face.set_knobs(0, ema_adapt=0.0)
    mfc_compat, caps_c = run_with_capture(eng_face, face_clip)
    fired = sum(1 for c in caps_c if c.get("has_prior"))
    applied = sum(1 for c in caps_c if c["face_applied"])
    warp_w = eng_face.statics.warp_blend_weight
    print(f"face clip: prior fired {fired}/{len(caps_c)} frames, "
          f"affine applied {applied}", flush=True)
    print("oracle chain (face)...", flush=True)
    m_oracle_face = oracle_chain(
        mmc[:T_ORACLE], face_clip.frames[:T_ORACLE], caps=caps_c[:T_ORACLE],
        warp_w=warp_w,
    )
    gt_face = np.asarray(downs(jnp.asarray(face_clip.alpha)))

    report = {
        "_acquisition_record": (
            "2026-08-19: model_q4f16.onnx absent from the reference repo "
            "(loaded at client/src/core/main.ts:6, never committed); this "
            "environment has zero network egress (DNS fails: urlopen "
            "pypi.org -> 'Name or service not known') and no MODNet "
            "artifact exists on the image (find / -iname '*modnet*'). "
            "Direct parity is unmeasurable until weights/masks are "
            "provided; tools/parity_check.py --onnx-ref/--ref closes it "
            "with zero code changes."
        ),
        "_method": (
            "strongest available substitute on realistic clips: "
            "ARTICULATED procedural people (capsule skeleton, hair "
            "fringe, clothing texture, occluders, camera shake) over the "
            "reference's committed real photographs. int8 fast-stack "
            "pipeline vs float pipeline of the same trained flagship "
            "(the q4f16 serving relationship); engine chain vs the "
            "literal per-pixel oracle port of the reference formulas "
            "(tests/oracles.py) fed the same model alpha -- run without "
            "the face path AND with it (captured per-frame affine state "
            "+ analytic prior params drive the oracle's warp/prior "
            "stages; the trained FaceFinder fires on the clip's "
            "synthetic face)."
        ),
        "checkpoint": CKPT_NAME,
        "device": str(jax.devices()[0]),
        "clips": {"n": len(clips) + 1, "frames_per_clip": T,
                  "frame_hw": list(FRAME_HW), "mask_hw": list(MASK_HW),
                  "oracle_frames": T_ORACLE},
        "int8_vs_float_pipeline": parity_report(
            np.concatenate([m_i8, mfc_i8]), np.concatenate([m_f, mfc])
        ),
        "engine_vs_reference_semantics_oracle": {
            **parity_report(m_f_or, m_oracle),
            "_knobs": "ema_adapt=0 (reference-compat mode, both sides)",
        },
        "engine_vs_oracle_face_path": {
            **parity_report(mfc_compat[:T_ORACLE], m_oracle_face),
            "_knobs": "ema_adapt=0 (reference-compat mode, both sides)",
            "prior_fired_frames": fired,
            "affine_applied_frames": applied,
        },
        "int8_pipeline_vs_gt": {
            **parity_report(
                catw(m_i8_l + [mfc_i8]), catw(gt_l + [gt_face])
            ),
            "warmup_frames_skipped_per_clip": WARM,
            "_knobs": "shipped preset defaults (motion-adaptive EMA)",
        },
        "float_pipeline_vs_gt": {
            **parity_report(
                catw(m_f_l + [mfc]), catw(gt_l + [gt_face])
            ),
            "warmup_frames_skipped_per_clip": WARM,
            "_knobs": "shipped preset defaults (motion-adaptive EMA)",
        },
        "float_pipeline_vs_gt_ema0": {
            **parity_report(catw(m_f0), catw(gt_l)),
            "warmup_frames_skipped_per_clip": WARM,
            "_note": (
                "EMA live-knob at 0 (no temporal smoothing): the "
                "segmentation quality bound; the default-knob number "
                "above additionally pays the reference's own EMA lag "
                "on fast motion (EMA 0.55)."
            ),
        },
    }
    print(json.dumps(report, indent=2))

    if os.environ.get("VST_SMALL"):
        print("VST_SMALL smoke run: NOT writing PARITY.json "
              "(below-serving-res masks are not quality evidence)")
        return
    path = os.path.join(ROOT, "PARITY.json")
    with open(path) as f:
        parity = json.load(f)
    # the serving default owns the "matting" key; candidate checkpoints
    # (VST_CKPT) get their own suffixed section for side-by-side review
    key = ("matting" if CKPT_NAME == "mattenet_hd10_pico"
           else f"matting_{CKPT_NAME.replace('mattenet_hd10_', '')}")
    parity[key] = report
    with open(path, "w") as f:
        json.dump(parity, f, indent=2)
    print(f"wrote matting section -> {path}")


if __name__ == "__main__":
    main()
