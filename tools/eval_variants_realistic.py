"""Variant quality on the REALISTIC distribution (VERDICT r4 #5).

eval_variants.py covers the held-out synthetic gate; this runs each
variant preset over ARTICULATED-person clips composited on the
reference's real photographs (utils.clips.articulated_clip — the same
distribution the flagship's PARITY.json realistic rows use) and records
IoU vs ground truth + temporal stability per variant into
benchmarks/RESULTS.json under "variants_realistic".  Together the two
files quote BOTH distributions for every variant row.

Candidate checkpoints: VST_CKPT_RVM / VST_CKPT_U2 / VST_CKPT_MC_PICO /
VST_CKPT_ACTIVE / VST_CKPT_PICO override the default names so a
fine-tune can be gated before promotion.

Run: JAX_PLATFORMS= python tools/eval_variants_realistic.py [n_frames] [only]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_stream_segmenetation_tpu.runtime.presets import preset  # noqa: E402
from video_stream_segmenetation_tpu.service.engine import Engine  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")
_env = os.environ.get

# (variant key, preset name, overrides, matting checkpoint)
CASES = [
    ("flagship_fast_int8_pico", "fast_int8_pico", {},
     _env("VST_CKPT_PICO", "mattenet_hd10_pico")),
    ("active", "active", {}, _env("VST_CKPT_ACTIVE", "mattenet")),
    ("rvm", "rvm", {}, _env("VST_CKPT_RVM", "rvm")),
    ("u2", "u2", {}, _env("VST_CKPT_U2", "u2net")),
    ("multiclass_fast_pico", "multiclass_fast_pico", {},
     _env("VST_CKPT_MC_PICO", "mattenet_hd10_mc_pico")),
]
EVAL_HW = (288, 512)  # fixed comparison resolution (eval_variants.py)
WARM = 5


def eval_case(preset_name, overrides, ckpt, clips, gts):
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.utils.clips import (
        mask_iou,
        temporal_stability,
    )

    statics = preset(preset_name, **overrides)
    path = os.path.join(CKPT, ckpt)
    if not os.path.isdir(path):
        return {"skipped": f"no checkpoint {ckpt}"}
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.load_matting_params(path)
    fh, fw = statics.frame_hw

    to_eval = jax.jit(
        lambda a: ops.resize_bilinear(
            a[None], EVAL_HW, method="half_pixel", channel_last=False
        )[0]
    )

    masks_all, gt_all, stabs = [], [], []
    for clip, gt in zip(clips, gts):
        eng.evict(0)
        eng.admit()
        batch = np.zeros((1, fh, fw, 3), np.uint8)
        masks = []
        for t in range(len(clip.frames)):
            batch[0] = clip.frames[t]
            out = eng.process(batch)
            # multiclass: person = 1 - background class
            a = (np.asarray(out["class_alpha"])[0]
                 if "class_alpha" in out else np.asarray(out["alpha"])[0])
            if a.ndim == 3:
                a = 1.0 - a[..., 0]
            if a.shape != EVAL_HW:
                a = np.asarray(to_eval(jnp.asarray(a)))
            masks.append(a)
        m = np.stack(masks)[WARM:]
        g = gt[WARM:]
        masks_all.append(m)
        gt_all.append(g)
        stabs.append(temporal_stability(m))
    cat_m, cat_g = np.concatenate(masks_all), np.concatenate(gt_all)
    ious = mask_iou(cat_m, cat_g)
    return {
        "iou_mean": round(float(ious.mean()), 4),
        "iou_min": round(float(ious.min()), 4),
        "iou_p05": round(float(np.percentile(ious, 5)), 4),
        "temporal_stability": round(float(np.mean(stabs)), 4),
        "frames": int(len(ious)),
        "checkpoint": ckpt,
    }


def main(n_frames: int = 24, only: str | None = None) -> None:
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.train.realdata import (
        load_background_bank,
    )
    from video_stream_segmenetation_tpu.utils.clips import articulated_clip

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # clips are rendered per frame geometry on demand (presets differ)
    clip_cache: dict = {}

    def clips_for(fh, fw):
        if (fh, fw) not in clip_cache:
            bank = load_background_bank((fh, fw), max_images=8, oversample=2)
            cs = [
                articulated_clip(n_frames, (fh, fw), seed=1, bank=bank,
                                 wave=True, shake_px=3.0, occluder_p=0.0),
                articulated_clip(n_frames, (fh, fw), seed=2, bank=bank,
                                 occluder_p=1.0, motion=1.5),
            ]
            downs = jax.jit(
                lambda a: ops.resize_bilinear(
                    a, EVAL_HW, method="half_pixel", channel_last=False
                )
            )
            gts = [np.asarray(downs(jnp.asarray(c.alpha))) for c in cs]
            clip_cache[(fh, fw)] = (cs, gts)
        return clip_cache[(fh, fw)]

    results = {}
    for name, pname, overrides, ckpt in CASES:
        if only is not None and name != only:
            continue
        try:
            fh, fw = preset(pname, **overrides).frame_hw
            clips, gts = clips_for(fh, fw)
            results[name] = eval_case(pname, overrides, ckpt, clips, gts)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, results[name], flush=True)

    path = os.path.join(ROOT, "benchmarks", "RESULTS.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    prior = data.get("variants_realistic", {})
    prior.update({
        "device": str(dev), "n_frames": n_frames,
        "_method": (
            "articulated procedural people over the reference's real "
            "photos (utils.clips.articulated_clip seeds 1 waving / 2 "
            "occluded+fast), IoU vs gt at 288x512, warmup 5 skipped -- "
            "the realistic half of the two-distribution variant gate"
        ),
        **results,
    })
    data["variants_realistic"] = prior
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote variants_realistic ->", path)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 24,
        sys.argv[2] if len(sys.argv) > 2 else None,
    )
