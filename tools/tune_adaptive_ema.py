"""Tune the motion-adaptive EMA (VERDICT r4 #1) on realistic clips.

Sweeps the per-stream ``ema_adapt`` live knob (and optionally the
EMA_ADAPT_T0/T1 gate constants) over the articulated-clip eval set and
reports IoU-vs-GT + temporal stability + flicker per config, all from
ONE engine build (the knob is tier-2 live config -- no retrace for the
adapt sweep; T0/T1 changes retrace the step).

The metric protocol matches tools/parity_matting.py's *_pipeline_vs_gt
rows: serving geometry, warmup skip 5 frames/clip, masks at mask_hw vs
the clip alpha downsampled with the same resize.

Run: JAX_PLATFORMS= python tools/tune_adaptive_ema.py        (real chip)
     python tools/tune_adaptive_ema.py                        (CPU, slow)
Env: VST_SMALL=1 reduced geometry smoke; VST_ADAPTS="0,0.75,1".
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("VST_TPU") and os.environ.get("JAX_PLATFORMS") is None:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.environ.get("VST_SMALL"):
    FRAME_HW, MASK_HW, T = (240, 320), (96, 128), 8
else:
    FRAME_HW, MASK_HW, T = (720, 1280), (288, 512), 32
CKPT = os.path.join(
    ROOT, "checkpoints", os.environ.get("VST_CKPT", "mattenet_hd10_pico")
)


def flicker(masks: np.ndarray, thresh: float = 0.5) -> float:
    """Mean per-frame fraction of binary label flips (lower = calmer);
    the 'flicker within 2x' guard of the VERDICT done-criterion."""
    b = masks > thresh
    if len(b) < 2:
        return 0.0
    return float(np.logical_xor(b[1:], b[:-1]).mean())


def main():
    # optional gate-constant override (retraces the step; the sweep over
    # `adapt` itself is knob-only)
    if os.environ.get("VST_T0") or os.environ.get("VST_T1"):
        from video_stream_segmenetation_tpu.runtime import config as _cfg

        if os.environ.get("VST_T0"):
            _cfg.EMA_ADAPT_T0 = float(os.environ["VST_T0"])
        if os.environ.get("VST_T1"):
            _cfg.EMA_ADAPT_T1 = float(os.environ["VST_T1"])
        print(f"gate T0={_cfg.EMA_ADAPT_T0} T1={_cfg.EMA_ADAPT_T1}")

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine
    from video_stream_segmenetation_tpu.train.realdata import (
        load_background_bank,
    )
    from video_stream_segmenetation_tpu.utils.clips import (
        articulated_clip,
        mask_iou,
        run_clip_through_engine,
        temporal_stability,
    )

    import jax.numpy as jnp

    bank = load_background_bank(FRAME_HW, max_images=8, oversample=2)
    clips = [
        articulated_clip(T, FRAME_HW, seed=0, bank=bank, occluder_p=1.0),
        articulated_clip(T, FRAME_HW, seed=1, bank=bank, wave=True,
                         shake_px=3.0, occluder_p=0.0),
        articulated_clip(T, FRAME_HW, seed=2, bank=bank, occluder_p=1.0,
                         motion=1.5),
        articulated_clip(T, FRAME_HW, seed=3, bank=bank, features=True,
                         wave=True, occluder_p=0.0, shake_px=1.5),
    ]

    base = preset("fast_int8_pico")
    statics = dataclasses.replace(
        base, frame_hw=FRAME_HW, mask_hw=MASK_HW, background="color",
        face_path=False, fd_size=64, lmk_size=48,
    )
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.load_matting_params(CKPT)
    eng.admit()

    downs = jax.jit(
        lambda a: ops.resize_bilinear(a[..., None], MASK_HW,
                                      method="asymmetric")[..., 0]
    )
    gts = [np.asarray(downs(jnp.asarray(c.alpha))) for c in clips]

    adapts = [
        float(x)
        for x in os.environ.get("VST_ADAPTS", "0,0.5,0.75,1.0").split(",")
    ]
    WARM = 5
    results = {}
    for ad in adapts:
        per_clip, masks_all, gt_all = [], [], []
        for ci, c in enumerate(clips):
            eng.evict(0)
            eng.admit()
            eng.set_knobs(0, ema_adapt=ad)
            m = run_clip_through_engine(eng, c)
            ious = mask_iou(m[WARM:], gts[ci][WARM:])
            per_clip.append(
                {"iou": float(ious.mean()), "min": float(ious.min()),
                 "stab": temporal_stability(m[WARM:]),
                 "flicker": flicker(m[WARM:])}
            )
            masks_all.append(m[WARM:])
            gt_all.append(gts[ci][WARM:])
        cat = np.concatenate(masks_all)
        catg = np.concatenate(gt_all)
        ious = mask_iou(cat, catg)
        results[f"adapt={ad}"] = {
            "iou_mean": float(ious.mean()),
            "iou_min": float(ious.min()),
            "iou_p05": float(np.percentile(ious, 5)),
            "temporal_stability": float(
                np.mean([p["stab"] for p in per_clip])
            ),
            "flicker": float(np.mean([p["flicker"] for p in per_clip])),
            "per_clip": per_clip,
        }
        print(f"adapt={ad}: iou {ious.mean():.4f} min {ious.min():.4f} "
              f"stab {results[f'adapt={ad}']['temporal_stability']:.4f} "
              f"flicker {results[f'adapt={ad}']['flicker']:.5f}",
              flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
