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


def main(steps: int = 5000) -> None:
    bank = load_background_bank(HW, oversample=2.0, as_uint8=True)
    mixed_fn = make_mixed_data_fn(
        make_real_bg_data_fn(bank, person="articulated"), real_frac=0.5
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
    utils.save_params(os.path.join(CKPT, "u2net_mix"), params)
    print("saved -> checkpoints/u2net_mix", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
