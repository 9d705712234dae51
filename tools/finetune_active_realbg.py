"""Mixed articulated fine-tune for the 'active' variant's MatteNet.

The flagship got the round-4 articulated/real-background treatment
(tools/train_flagship_realbg.py); this applies the same recipe —
articulated people over the reference's real photos, 50/50 with the
procedural scenes, through the serving-chain loss — to the 'active'
reference pipeline's checkpoint (checkpoints/mattenet, served at the
288x512 mask geometry by runtime/presets.py 'active').

Run: JAX_PLATFORMS= python tools/finetune_active_realbg.py [steps]
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

from video_stream_segmenetation_tpu import models, utils  # noqa: E402
from video_stream_segmenetation_tpu.train.loop import (  # noqa: E402
    fit,
    synthetic_matting_batch,
)
from video_stream_segmenetation_tpu.train.losses import (  # noqa: E402
    make_pipeline_loss,
)
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
    make_mixed_data_fn,
    make_real_bg_data_fn,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")
HW = (288, 512)  # the 'active' preset's matting geometry
BATCH = 16


def main(steps: int = 8000, render_hw=(720, 1280)) -> None:
    # Round 5: scenes for the serving-geometry phase are rendered at the
    # SERVING frame resolution (720p) and downsampled through the
    # pipeline's resize -- the realistic-variant eval exposed a
    # render-domain gap (this checkpoint, fine-tuned on 288-native
    # renders, scored 0.9861 on synthetic ellipses but 0.649 on
    # 720p-rendered articulated clips; RESULTS.json variants_realistic).
    # A quarter of each batch stays 288-native for multi-geometry
    # robustness (the single-res lesson below).
    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

    bank720 = load_background_bank(render_hw, oversample=2.0, as_uint8=True)
    real720 = make_real_bg_data_fn(bank720, person="articulated")

    def serve_down(fr, a):
        fr = resize_bilinear(fr, HW, method="asymmetric")
        a = resize_bilinear(a, HW, method="asymmetric", channel_last=False)
        return fr, a

    def mixed_fn(key, batch, hw_):
        k1, k2, k3 = jax.random.split(key, 3)
        b_r = batch // 2
        b_s = max(1, batch // 4)
        fr_r, a_r = serve_down(*real720(k1, b_r, render_hw))
        fr_s, a_s = serve_down(
            *synthetic_matting_batch(k2, b_s, render_hw)
        )
        fr_n, a_n = synthetic_matting_batch(k3, batch - b_r - b_s, HW)
        return (
            jnp.concatenate([fr_r, fr_s, fr_n]),
            jnp.concatenate([a_r, a_s, a_n]),
        )

    model = models.MatteNet()
    like = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)))
    params = utils.restore_params(os.path.join(CKPT, "mattenet"), like=like)

    params, history = fit(
        model, hw=HW, batch=BATCH, steps=steps, lr=3e-4,
        init_params=params, seed=5, data_fn=mixed_fn,
        steps_per_call=50, loss_fn=make_pipeline_loss(model),
    )
    for rec in history[-3:]:
        print(f"[active/mix] {json.dumps(rec)}", flush=True)

    # multi-resolution polish: MatteNet serves at whatever mask geometry
    # the deployment picks (the demo runs 96x128; 'active' runs 288x512)
    # and texture frequencies do not transfer across the stem scale (a
    # 288-only fine-tune zeroes the 96x128 masks outright).  Alternate
    # short phases at the small geometry and back.
    HW_S = (96, 128)
    bank_s = load_background_bank(HW_S, oversample=2.0, as_uint8=True)
    mixed_s = make_mixed_data_fn(
        make_real_bg_data_fn(bank_s, person="articulated"), real_frac=0.5
    )
    for phw, pfn, plr, psteps in (
        (HW_S, mixed_s, 1.5e-4, 1500), (HW, mixed_fn, 1e-4, 1500),
        (HW_S, mixed_s, 7e-5, 800),
    ):
        params, history = fit(
            model, hw=phw, batch=BATCH, steps=psteps, lr=plr,
            init_params=params, seed=6, data_fn=pfn,
            steps_per_call=50, loss_fn=make_pipeline_loss(model),
        )
        print(f"[active/mix {phw}] {json.dumps(history[-1])}", flush=True)
    utils.save_params(os.path.join(CKPT, "mattenet_mix720"), params)
    print("saved -> checkpoints/mattenet_mix720 "
          "(gate via eval_variants[_realistic] VST_CKPT_ACTIVE="
          "mattenet_mix720 before promoting over checkpoints/mattenet)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
