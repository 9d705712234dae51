"""Per-clip, per-stage quality diagnosis on the realistic clip suite.

Runs the serving float pipeline AND the model-only truncation on each
articulated clip (the tools/parity_matting.py suite) and prints
pipeline-vs-GT / model-vs-GT IoU per clip -- separates "the model can't
segment this" from "the refine chain hurts here".  The round-4 quality
loop ran on this: it located the raised-arm hole (pose distribution gap,
train/person.py::sample_pose) and the wood-grain false positive
(crop-scale augmentation gap).

Run: VST_CKPT=<ckpt> JAX_PLATFORMS= python tools/diag_realistic_clips.py
     (add VST_TPU=1 implied by JAX_PLATFORMS=; CPU works too, slower)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("VST_TPU", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_diag")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

import parity_matting as pm  # noqa: E402  (tools/: shared engine builder)
import jax.numpy as jnp  # noqa: E402

from video_stream_segmenetation_tpu import ops  # noqa: E402
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
)
from video_stream_segmenetation_tpu.utils.clips import (  # noqa: E402
    articulated_clip,
    mask_iou,
    run_clip_through_engine,
)


def main():
    bank = load_background_bank(pm.FRAME_HW, max_images=8, oversample=2)
    T = 32
    clips = {
        "c0_desk": articulated_clip(
            T, pm.FRAME_HW, seed=0, bank=bank, occluder_p=1.0
        ),
        "c1_wave_shake": articulated_clip(
            T, pm.FRAME_HW, seed=1, bank=bank, wave=True, shake_px=3.0,
            occluder_p=0.0,
        ),
        "c2_desk_fastmotion": articulated_clip(
            T, pm.FRAME_HW, seed=2, bank=bank, occluder_p=1.0, motion=1.5
        ),
        "c3_face": articulated_clip(
            T, pm.FRAME_HW, seed=3, bank=bank, features=True, wave=True,
            occluder_p=0.0, shake_px=1.5,
        ),
    }
    eng_f = pm.build_engine(matting_precision="bf16")
    eng_m = pm.build_engine(
        matting_precision="bf16", debug_stage="model_only"
    )
    downs = jax.jit(
        lambda a: ops.resize_bilinear(
            a[..., None], pm.MASK_HW, method="asymmetric"
        )[..., 0]
    )
    worst = (None, 1.0, 0)
    for name, c in clips.items():
        gt = np.asarray(downs(jnp.asarray(c.alpha)))
        i_f = mask_iou(run_clip_through_engine(eng_f, c), gt)
        i_m = mask_iou(run_clip_through_engine(eng_m, c), gt)
        rec = {
            "full_mean": round(float(i_f.mean()), 3),
            "full_min": round(float(i_f.min()), 3),
            "model_mean": round(float(i_m.mean()), 3),
            "model_min": round(float(i_m.min()), 3),
        }
        print(name, json.dumps(rec), flush=True)
        if i_f.mean() < worst[1]:
            worst = (name, float(i_f.mean()), int(np.argmin(i_f)))
    print(json.dumps({"worst_clip": worst[0], "mean": round(worst[1], 3),
                      "worst_frame": worst[2]}))


if __name__ == "__main__":
    main()
