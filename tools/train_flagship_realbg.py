"""Mixed-distribution fine-tune of the flagship matting checkpoint.

The flagship checkpoints are trained on fully procedural scenes
(train/loop.py::synthetic_matting_batch).  PARITY.json's matting section
measures agreement on *realistic* clips (procedural people over the
reference repo's committed real photographs, the same background family
the reference app ships — client/src/assets/backgrounds/), where a
synthetic-only model collapses (pipeline-vs-gt IoU 0.17: real photo
texture reads as foreground).  REALDATA.json's cross-distribution matrix
shows the fix is a mixed batch, not a distribution swap (either
single-distribution choice trades ~0.2 IoU on the other eval).

This fine-tunes an existing flagship checkpoint at SERVING resolution on
50/50 procedural/real-background batches and records model-only IoU on
both held-out distributions before and after.  The result is saved as
``<ckpt>_mix`` by default; pass --promote to overwrite the source
checkpoint once the pipeline-IoU gate (tools/eval_variants.py) passes.

Run: JAX_PLATFORMS= python tools/train_flagship_realbg.py [steps] [--promote]
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

from video_stream_segmenetation_tpu import models, utils  # noqa: E402
from video_stream_segmenetation_tpu.train.loop import (  # noqa: E402
    fit,
    synthetic_matting_batch,
)
from video_stream_segmenetation_tpu.train.losses import iou_metric  # noqa: E402
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
    make_mixed_data_fn,
    make_real_bg_data_fn,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")
NAME = os.environ.get("VST_CKPT", "mattenet_hd10_pico")
REAL_FRAC = float(os.environ.get("VST_REAL_FRAC", "0.5"))
LR = float(os.environ.get("VST_LR", "1.5e-4"))
SERVE_HW = (720, 1280)
BATCH = int(os.environ.get("VST_BATCH", "8"))


def evaluate(model, params, data_fn, hw, n_batches=4, seed=999):
    ious = []
    # params is a jit ARGUMENT: closing over the ~5 MB tree would make it
    # a compile-time constant -- recompiled per evaluate() call and
    # shipped in the HTTP compile payload (the tunnel's 'big jit closure
    # constants' hazard, CLAUDE.md)
    eval_fn = jax.jit(lambda p, fr, gt: iou_metric(
        model.apply(p, fr)["alpha"], gt
    ).mean())
    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

    out_hw = jax.eval_shape(
        lambda fr: model.apply(params, fr)["alpha"],
        jax.ShapeDtypeStruct((1, *hw, 3), jnp.float32),
    ).shape[-2:]
    for i in range(n_batches):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        frames, gt = data_fn(key, BATCH, hw)
        if out_hw != gt.shape[-2:]:
            gt = resize_bilinear(gt, out_hw, method="half_pixel",
                                 channel_last=False)
        ious.append(float(eval_fn(params, frames, gt)))
    return round(float(np.mean(ious)), 4)


def main(steps: int = 400, promote: bool = False) -> None:
    # u8 bank: the one-time device upload rides the ~1 MB/s tunnel.
    # oversample=2 -> crop-scale augmentation spans 1x..2x, matching the
    # eval clips' crop statistics (a 1.5x bank under-covered zoomed-out
    # textures and the flagship hallucinated wood grain as foreground)
    bank = load_background_bank(SERVE_HW, oversample=2.0, as_uint8=True)
    print(f"bank: {bank.shape} uint8 ({bank.nbytes >> 20} MB)", flush=True)
    # articulated people over real photos: the train side of the shared
    # train/eval person distribution (train/person.py; the realistic-clip
    # parity harness evals the same skeleton, utils/clips.py)
    real_fn = make_real_bg_data_fn(bank, person="articulated")
    real_fn_ellipse = make_real_bg_data_fn(bank)
    mixed_fn = make_mixed_data_fn(real_fn, real_frac=REAL_FRAC)

    model = models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="pico")
    like = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *SERVE_HW, 3)))
    params = utils.restore_params(os.path.join(CKPT, NAME), like=like)

    before = {
        "synthetic": evaluate(model, params, synthetic_matting_batch, SERVE_HW),
        "realbg_articulated": evaluate(model, params, real_fn, SERVE_HW),
        "realbg_ellipse": evaluate(model, params, real_fn_ellipse, SERVE_HW),
    }
    print("model-only IoU before:", json.dumps(before), flush=True)

    # serving-chain-aware loss: backprop through the refine chain so the
    # model's level sets calibrate to the SERVED alpha, not the raw one
    # (a raw-alpha fine-tune measured model-only 0.98 but served 0.95 on
    # the synthetic held-out clips; losses.make_pipeline_loss docstring)
    from video_stream_segmenetation_tpu.train.losses import (
        make_pipeline_loss,
    )

    loss_fn = (
        None if os.environ.get("VST_NO_PIPE_LOSS")
        else make_pipeline_loss(model)
    )
    params, history = fit(
        model, hw=SERVE_HW, batch=BATCH, steps=steps, lr=LR,
        log_every=50, init_params=params, seed=3, data_fn=mixed_fn,
        steps_per_call=50,  # dispatch overhead dominates on this host
        loss_fn=loss_fn,
    )
    for rec in history:
        print(f"[{NAME}/mix] {json.dumps(rec)}", flush=True)

    after = {
        "synthetic": evaluate(model, params, synthetic_matting_batch, SERVE_HW),
        "realbg_articulated": evaluate(model, params, real_fn, SERVE_HW),
        "realbg_ellipse": evaluate(model, params, real_fn_ellipse, SERVE_HW),
    }
    print("model-only IoU after:", json.dumps(after), flush=True)

    out_name = NAME if promote else NAME + "_mix"
    utils.save_params(os.path.join(CKPT, out_name), params)
    print(f"saved -> checkpoints/{out_name}", flush=True)

    report = {
        "_note": (
            "model-only IoU at serving res on held-out batches of each "
            "distribution (eval crops/scenes differ from training by "
            "seed; the 15 photos themselves are the full committed bank "
            "— no additional photos exist in this environment). Pipeline "
            "IoU gate: tools/eval_variants.py; realistic-clip agreement: "
            "tools/parity_matting.py."
        ),
        "checkpoint": NAME, "saved_as": out_name, "steps": steps,
        "serve_hw": list(SERVE_HW), "real_frac": REAL_FRAC, "lr": LR,
        "model_only_iou_before": before, "model_only_iou_after": after,
    }
    path = os.path.join(ROOT, "benchmarks", "REALBG_FLAGSHIP.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 400,
        promote="--promote" in sys.argv,
    )
