"""Real-background data_fn demo: quality delta vs synthetic-only.

Trains the same small MatteNet twice -- (a) on fully procedural scenes,
(b) on procedural people composited over REAL photographs (the reference
repo's committed 1920x1080 backgrounds; train/realdata.py) -- and
evaluates BOTH models on BOTH held-out distributions.  Records the IoU
matrix to benchmarks/REALDATA.json: the cross-distribution numbers are
the de-risking signal VERDICT round 1 asked for (does real-image
training transfer to the synthetic eval and vice versa?).

Run: JAX_PLATFORMS= python tools/train_realbg.py [steps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_stream_segmenetation_tpu import models  # noqa: E402
from video_stream_segmenetation_tpu.train.loop import (  # noqa: E402
    fit,
    synthetic_matting_batch,
)
from video_stream_segmenetation_tpu.train.losses import iou_metric  # noqa: E402
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
    make_real_bg_data_fn,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HW = (144, 256)
BATCH = 16


def evaluate(model, params, data_fn, n_batches=4, seed=999):
    ious = []
    for i in range(n_batches):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        frames, gt = data_fn(key, BATCH, HW)
        out = model.apply(params, frames)
        a = out["alpha"]
        if a.shape[-2:] != gt.shape[-2:]:
            from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

            gt = resize_bilinear(gt, a.shape[-2:], method="half_pixel",
                                 channel_last=False)
        ious.append(float(iou_metric(a, gt).mean()))
    return float(np.mean(ious))


def main(steps: int = 400) -> None:
    bank = load_background_bank(HW)
    real_fn = make_real_bg_data_fn(bank)
    model = models.MatteNet(width=0.75)

    print(f"bank: {bank.shape[0]} real photos", flush=True)
    p_syn, hist_s = fit(model, hw=HW, batch=BATCH, steps=steps, lr=1e-3, seed=0)
    print("synthetic-trained:", hist_s[-1], flush=True)
    p_real, hist_r = fit(
        model, hw=HW, batch=BATCH, steps=steps, lr=1e-3, seed=0, data_fn=real_fn
    )
    print("real-bg-trained:", hist_r[-1], flush=True)

    report = {
        "hw": HW, "steps": steps,
        "real_backgrounds": int(bank.shape[0]),
        "iou": {
            "synthetic_trained_on_synthetic_eval": evaluate(
                model, p_syn, synthetic_matting_batch
            ),
            "synthetic_trained_on_realbg_eval": evaluate(model, p_syn, real_fn),
            "realbg_trained_on_synthetic_eval": evaluate(
                model, p_real, synthetic_matting_batch
            ),
            "realbg_trained_on_realbg_eval": evaluate(model, p_real, real_fn),
        },
    }
    out = os.path.join(ROOT, "benchmarks", "REALDATA.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
