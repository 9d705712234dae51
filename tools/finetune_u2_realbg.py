"""Mixed articulated fine-tune for the U2Net-class saliency variant.

Same round-4 recipe as the flagship/active retrains (articulated people
over the reference's real photographs, 50/50 with procedural scenes) at
the variant's canonical 320x320 geometry.  Plain matting loss: the u2
pipeline has no temporal/refine recalibration stage to backprop through
(u2FrameProc.ts semantics — temporal_filter='none').

Run: JAX_PLATFORMS= python tools/finetune_u2_realbg.py [steps]
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
from video_stream_segmenetation_tpu.train.loop import fit  # noqa: E402
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
    make_mixed_data_fn,
    make_real_bg_data_fn,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")
HW = (320, 320)
BATCH = 16


def main(steps: int = 5000, render_hw=(720, 1280)) -> None:
    # Scenes are rendered at the SERVING frame resolution (720p) and
    # downsampled to the model's 320x320 through the pipeline's resize --
    # the realistic-variant eval exposed a render-domain gap (u2net_mix
    # trained on 320-native renders scored 0.154 on 720p-rendered
    # articulated clips, RESULTS.json variants_realistic).  A quarter of
    # each batch stays 320-native so the multi-geometry robustness
    # lesson from the 'active' fine-tune carries.
    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear
    from video_stream_segmenetation_tpu.train.loop import (
        synthetic_matting_batch,
    )

    bank = load_background_bank(render_hw, oversample=2.0, as_uint8=True)
    real_fn = make_real_bg_data_fn(bank, person="articulated")

    def serve_down(fr, a):
        fr = resize_bilinear(fr, HW, method="asymmetric")
        a = resize_bilinear(a, HW, method="asymmetric", channel_last=False)
        return fr, a

    def mixed_fn(key, batch, hw_):
        k1, k2, k3 = jax.random.split(key, 3)
        b_r = batch // 2
        b_s = max(1, batch // 4)
        fr_r, a_r = serve_down(*real_fn(k1, b_r, render_hw))
        fr_s, a_s = serve_down(
            *synthetic_matting_batch(k2, b_s, render_hw)
        )
        fr_n, a_n = synthetic_matting_batch(k3, batch - b_r - b_s, HW)
        return (
            jnp.concatenate([fr_r, fr_s, fr_n]),
            jnp.concatenate([a_r, a_s, a_n]),
        )
    model = models.SaliencyNet()
    like = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)))
    params = utils.restore_params(os.path.join(CKPT, "u2net"), like=like)
    def u2_loss(params, frames, gt):
        # the variant's own objective (tools/train_variants.py::train_u2);
        # SaliencyNet has no MODNet heads, so the default matting loss
        # does not apply
        out = model.apply(params, frames)
        l1 = jnp.abs(out["alpha"] - gt).mean()
        eps = 1e-6
        p = jnp.clip(out["alpha"], eps, 1 - eps)
        bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p)).mean()
        return l1 + 0.5 * bce, {"loss": l1 + 0.5 * bce, "alpha_l1": l1}

    params, history = fit(
        model, hw=HW, batch=BATCH, steps=steps, lr=2e-4,
        init_params=params, seed=7, data_fn=mixed_fn, steps_per_call=50,
        loss_fn=u2_loss,
    )
    print(f"[u2/mix] {json.dumps(history[-1])}", flush=True)
    utils.save_params(os.path.join(CKPT, "u2net_mix720"), params)
    print("saved -> checkpoints/u2net_mix720 (gate via "
          "eval_variants[_realistic] VST_CKPT_U2=u2net_mix720)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
