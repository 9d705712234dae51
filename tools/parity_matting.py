"""Flagship matting parity -- the BASELINE ">= 0.99 mask IoU vs reference
model" metric, closed as far as this environment permits (VERDICT r2 #3).

ACQUISITION RECORD (dated 2026-08-19)
-------------------------------------
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
Three agreement numbers on realistic clips -- procedural people moving
over the reference repo's own committed real photographs
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
   frameProcessorTest.ts: warp/blend -> EMA :218-227 -> opening
   :644-685 -> prior closing :743-787 -> joint bilateral :230-266 ->
   threshold/gamma :270-313).
3. iou_vs_ground_truth for both pipelines (the quality floor; the
   held-out headline lives in benchmarks/RESULTS.json).

Writes the 'matting' section of PARITY.json.

Run: python tools/parity_matting.py            (CPU, ~5-10 min)
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
    FRAME_HW, MASK_HW, T, T_ORACLE = (720, 1280), (288, 512), 16, 12
CKPT_NAME = os.environ.get("VST_CKPT", "mattenet_hd10_pico")
CKPT = os.path.join(ROOT, "checkpoints", CKPT_NAME)


def realistic_clip(n_frames, hw, seed, bank):
    """SyntheticClip-style moving person over a REAL photograph
    (the reference repo's committed backgrounds)."""
    from video_stream_segmenetation_tpu.utils.clips import SyntheticClip

    h, w = hw
    rng = np.random.default_rng(seed)
    bg = bank[seed % len(bank)]
    y0 = rng.integers(0, bg.shape[0] - h + 1)
    x0 = rng.integers(0, bg.shape[1] - w + 1)
    bg = bg[y0 : y0 + h, x0 : x0 + w] * 255.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.zeros((n_frames, h, w, 3), np.uint8)
    alphas = np.zeros((n_frames, h, w), np.float32)
    cx0, cy0 = w * 0.5, h * 0.62
    rx, ry = w * 0.18, h * 0.42
    tex = (rng.random((h, w, 3)) * 40).astype(np.float32)
    for t in range(n_frames):
        cx = cx0 + 9.0 * np.sin(t * 0.21)
        cy = cy0 + 4.5 * np.cos(t * 0.17)
        d = np.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
        a = np.clip((1.05 - d) / 0.1, 0.0, 1.0)
        person = np.array([165.0, 125.0, 105.0]) + tex
        frame = person * a[..., None] + bg * (1 - a[..., None])
        noise = rng.normal(0, 4.0, (h, w, 3))
        frames[t] = np.clip(frame + noise, 0, 255).astype(np.uint8)
        alphas[t] = a
    return SyntheticClip(frames=frames, alpha=alphas)


def build_engine(**overrides):
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    statics = dataclasses.replace(
        preset("fast_int8_pico"),
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False, **overrides,
    )
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.load_matting_params(CKPT)
    eng.admit()
    return eng


def oracle_chain(model_masks, frames):
    """The reference's refine chain as the literal per-pixel oracle port
    (tests/oracles.py), at default knob values -- no face prior (the
    procedural people have no real faces for the real-weight detector;
    face-model parity is pinned separately in PARITY.json)."""
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import oracles

    from video_stream_segmenetation_tpu.runtime import config as cfg

    out = np.zeros_like(model_masks)
    prev = None
    for t in range(len(model_masks)):
        a = model_masks[t].astype(np.float64)
        # stage 3 warp/blend: no affine without the face path -> skip
        prev, a = oracles.ema_oracle(prev, a, cfg.DEFAULT_EMA)
        a = oracles.opening_oracle(a)
        a = oracles.closing_in_prior_oracle(a, None)
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
            cfg.DEFAULT_GAMMA, None,
        )
        out[t] = a
    return out


def main():
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.train.realdata import (
        load_background_bank,
    )
    from video_stream_segmenetation_tpu.utils.clips import (
        parity_report,
        run_clip_through_engine,
    )

    bank = load_background_bank(FRAME_HW, max_images=8, oversample=2)
    clips = [realistic_clip(T, FRAME_HW, s, bank) for s in range(2)]

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

    import jax.numpy as jnp

    downs = jax.jit(
        lambda a: ops.resize_bilinear(a[..., None], MASK_HW,
                                      method="asymmetric")[..., 0]
    )

    m_i8, m_f, m_oracle, m_f_oracle_frames, gt = [], [], [], [], []
    for ci, c in enumerate(clips):
        print(f"clip {ci}...", flush=True)
        m_i8.append(run_clip_through_engine(eng_i8, c))
        mf = run_clip_through_engine(eng_f, c)
        m_f.append(mf)
        gt.append(np.asarray(downs(jnp.asarray(c.alpha))))
        if ci == 0:
            # the literal per-pixel oracle is ~1 min/frame at 288x512;
            # one clip's first T_ORACLE frames pin the chain semantics
            # (EMA is stateful, so the prefix must be contiguous)
            mm = run_clip_through_engine(eng_model, c)
            print("oracle chain...", flush=True)
            m_oracle.append(oracle_chain(mm[:T_ORACLE], c.frames[:T_ORACLE]))
            m_f_oracle_frames.append(mf[:T_ORACLE])
    cat = lambda xs: np.concatenate(xs, axis=0)
    m_i8, m_f, gt = cat(m_i8), cat(m_f), cat(gt)
    m_oracle, m_f_or = cat(m_oracle), cat(m_f_oracle_frames)

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
            "strongest available substitute on realistic clips (procedural "
            "people over the reference's committed real photographs): "
            "int8 fast-stack pipeline vs float pipeline of the same "
            "trained flagship (the q4f16 serving relationship), and the "
            "engine chain vs the literal per-pixel oracle port of the "
            "reference formulas (tests/oracles.py) fed the same model "
            "alpha. Face prior off: the real-weight detector does not "
            "fire on procedural people (PARITY.json "
            "teacher_box_vs_gt_iou_mean 0.45); face parity is pinned "
            "separately under port_fidelity."
        ),
        "checkpoint": CKPT_NAME,
        "clips": {"n": len(clips), "frames_per_clip": T,
                  "frame_hw": list(FRAME_HW), "mask_hw": list(MASK_HW),
                  "oracle_frames": T_ORACLE},
        "int8_vs_float_pipeline": parity_report(m_i8, m_f),
        "engine_vs_reference_semantics_oracle": parity_report(
            m_f_or, m_oracle
        ),
        "int8_pipeline_vs_gt": parity_report(m_i8, gt),
        "float_pipeline_vs_gt": parity_report(m_f, gt),
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
