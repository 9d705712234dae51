"""Train the flagship matting nets on synthetic data and save checkpoints.

Conv nets are resolution-agnostic: training runs at a reduced geometry
(fast) and the weights serve at 720p.  Checkpoints land in checkpoints/
and are picked up by Engine via utils.restore_params.

Run on the TPU:  JAX_PLATFORMS= python tools/train_flagship.py
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_segmenetation_tpu import models, train, utils  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints")


def main(steps: int = 600, only: set[str] | None = None):
    os.makedirs(OUT, exist_ok=True)
    jobs = [
        # (name, model, pretrain hw, lr, serving hw, serving batch) --
        # HD trains at a /5-divisible size; the plan-B wide trunk needs
        # the lower lr (1.5e-3 collapses it to all-background).  The
        # serving-resolution fine-tune phase is mandatory: texture/noise
        # frequencies relative to the stem patch do not transfer (IoU
        # 0.20 -> 0.994 at 720p, train/loop.py::fit docstring).
        ("mattenet_hd", models.MatteNetHD(), (240, 320), 1.5e-3,
         (720, 1280), 8),
        ("mattenet_hd10",
         models.MatteNetHD(stem_stride=10, head_upsample=4), (240, 320),
         5e-4, (720, 1280), 8),
        # plan-C lite trunk (the round-2 speed lever; quality vs plan B
        # recorded in benchmarks/QUALITY.json for the IoU-vs-ms table)
        ("mattenet_hd10_lite",
         models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="light"),
         (240, 320), 5e-4, (720, 1280), 8),
        # plan-D micro trunk (round-2 throughput lever; IoU-vs-ms study
        # in benchmarks/RESULTS.md)
        ("mattenet_hd10_micro",
         models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="micro"),
         (240, 320), 5e-4, (720, 1280), 8),
        ("mattenet_hd10_nano",
         models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="nano"),
         (240, 320), 5e-4, (720, 1280), 8),
        # plan-F pico trunk (c2 128 / c3 192): the knee hunt continues
        ("mattenet_hd10_pico",
         models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="pico"),
         (240, 320), 5e-4, (720, 1280), 8),
        # plan-G femto trunk (c2 128 / c3 128): every level one lane group
        ("mattenet_hd10_femto",
         models.MatteNetHD(stem_stride=10, head_upsample=4, decoder="femto"),
         (240, 320), 5e-4, (720, 1280), 8),
        ("mattenet", models.MatteNet(), (96, 160), 1.5e-3, (288, 512), 16),
    ]
    if only:
        jobs = [j for j in jobs if j[0] in only]
    quality = {}
    for name, model, hw, lr, serve_hw, serve_b in jobs:
        print(f"=== training {name} at {hw} ===", flush=True)
        params, history = train.fit(
            model, hw=hw, batch=32, steps=steps, lr=lr, log_every=100
        )
        for rec in history:
            print(f"[{name}] {json.dumps(rec)}", flush=True)
        ft_steps = max(steps // 2, 200)
        print(f"=== fine-tuning {name} at {serve_hw} ===", flush=True)
        params, history = train.fit(
            model, hw=serve_hw, batch=serve_b, steps=ft_steps, lr=lr / 3,
            log_every=100, init_params=params, seed=1,
        )
        for rec in history:
            print(f"[{name}/ft] {json.dumps(rec)}", flush=True)
        path = os.path.join(OUT, name)
        utils.save_params(path, params)
        print(f"[{name}] saved to {path}", flush=True)
        quality[name] = {
            "pretrain_hw": list(hw), "serve_hw": list(serve_hw),
            # MODEL-ONLY IoU (raw trunk alpha vs gt at end of training).
            # NOT comparable to the pipeline headline (0.9866): serving
            # quality lives in the guided refine stage, which recovers
            # narrow trunks -- see benchmarks/RESULTS.md knee study and
            # tools/eval_variants.py for held-out *pipeline* IoU.
            "model_only_iou_serving_res": history[-1]["iou"],
            "steps": steps,
        }

    # append/merge the held-out quality record (IoU-vs-ms table source)
    qpath = os.path.join(
        os.path.dirname(OUT), "benchmarks", "QUALITY.json"
    )
    existing = {}
    if os.path.exists(qpath):
        with open(qpath) as f:
            existing = json.load(f)
    existing.update(quality)
    with open(qpath, "w") as f:
        json.dump(existing, f, indent=2)
    print("quality ->", qpath, json.dumps(quality), flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 600,
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
    )
