"""Variant quality: IoU + temporal stability per preset -> RESULTS.json.

VERDICT round 1 item 7: the variant checkpoints (rvm / u2net /
multiclass) existed without published quality numbers.  This runs each
variant preset's Engine step on held-out synthetic clips and records:

* mean per-frame soft-binary IoU vs ground truth;
* temporal stability = mean fraction of mask pixels flipping between
  consecutive frames on a *static* scene (lower = steadier);

into benchmarks/RESULTS.json under "variants".

Tunnel-safe: the clip (frames + ground truth) is generated ON DEVICE with
the same scene math as utils.clips.synthetic_clip, the engine's jitted
step runs frame by frame on device arrays, and the metrics are jitted
reductions -- only scalars cross the tunnel.

Run: JAX_PLATFORMS= python tools/eval_variants.py [n_frames]
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

from video_stream_segmenetation_tpu.runtime.presets import preset  # noqa: E402
from video_stream_segmenetation_tpu.service.engine import Engine  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")

# (variant key, preset name, overrides, matting checkpoint)
CASES = [
    ("flagship_fast_int8", "fast_int8", {}, "mattenet_hd10"),
    ("flagship_fast_int8_lite", "fast_int8_lite", {}, "mattenet_hd10_lite"),
    ("flagship_fast_int8_micro", "fast_int8_micro", {}, "mattenet_hd10_micro"),
    ("flagship_fast_int8_nano", "fast_int8_nano", {}, "mattenet_hd10_nano"),
    # VST_CKPT_PICO: evaluate a candidate pico checkpoint (the realbg
    # fine-tunes) against the same held-out synthetic gate before
    # promotion (tools/train_flagship_realbg.py)
    ("flagship_fast_int8_pico", "fast_int8_pico", {},
     os.environ.get("VST_CKPT_PICO", "mattenet_hd10_pico")),
    ("flagship_fast_int8_femto", "fast_int8_femto", {}, "mattenet_hd10_femto"),
    ("active", "active", {},
     os.environ.get("VST_CKPT_ACTIVE", "mattenet")),
    ("rvm", "rvm", {}, os.environ.get("VST_CKPT_RVM", "rvm")),
    ("u2", "u2", {}, os.environ.get("VST_CKPT_U2", "u2net")),
    ("multiclass", "multiclass", {}, "mattenet_multiclass"),
    ("multiclass_fast", "multiclass_fast", {}, "mattenet_hd10_mc"),
    ("multiclass_fast_pico", "multiclass_fast_pico", {},
     os.environ.get("VST_CKPT_MC_PICO", "mattenet_hd10_mc_pico")),
]


def device_clip(t, hw, motion, key):
    """One clip frame + gt alpha on device -- same scene family as
    utils.clips.synthetic_clip (textured person ellipse over static noisy
    background, soft edges)."""
    h, w = hw
    k_bg, k_tex, k_noise = jax.random.split(key, 3)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    bg = jax.random.uniform(k_bg, (h, w, 3)) * 60 + 20
    tex = jax.random.uniform(k_tex, (h, w, 3)) * 40
    cx = w * 0.5 + motion * 6.0 * jnp.sin(t * 0.21)
    cy = h * 0.62 + motion * 3.0 * jnp.cos(t * 0.17)
    d = jnp.sqrt(((xx - cx) / (w * 0.18)) ** 2 + ((yy - cy) / (h * 0.42)) ** 2)
    a = jnp.clip((1.05 - d) / 0.1, 0.0, 1.0)
    person = jnp.asarray([165.0, 125.0, 105.0]) + tex
    frame = person * a[..., None] + bg * (1 - a[..., None])
    noise = jax.random.normal(jax.random.fold_in(k_noise, t), (h, w, 3)) * 4.0
    return jnp.clip(frame + noise, 0, 255).astype(jnp.uint8), a


def eval_case(preset_name, overrides, ckpt, n_frames):
    statics = preset(preset_name, **overrides)
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    path = os.path.join(CKPT, ckpt)
    if not os.path.isdir(path):
        return {"skipped": f"no checkpoint {ckpt}"}
    eng.load_matting_params(path)
    eng.admit()

    fh, fw = statics.frame_hw
    mh, mw = statics.mask_hw
    key = jax.random.PRNGKey(11)

    from video_stream_segmenetation_tpu import ops

    # IoU/flicker are computed at a FIXED eval resolution so presets
    # serving their class maps at different native resolutions (e.g.
    # multiclass_fast_pico at the 72x128 stem grid) stay comparable;
    # (288, 512) == the historical mask_hw, so existing numbers carry.
    eh, ew = (288, 512)

    @jax.jit
    def make_frame(t, motion):
        frame, gt = device_clip(t, (fh, fw), motion, key)
        fr = frame[None]
        if statics.frame_layout == "s2d":
            fr = ops.space_to_depth(fr, statics.s2d_block)
        gt_small = ops.resize_bilinear(
            gt[None], (eh, ew), method="half_pixel", channel_last=False
        )[0]
        return fr, gt_small

    @jax.jit
    def metrics(alpha, gt_small, prev_alpha):
        a = alpha if alpha.ndim == 2 else 1.0 - alpha[..., 0]
        if a.shape != (eh, ew):
            a = ops.resize_bilinear(
                a[None], (eh, ew), method="half_pixel", channel_last=False
            )[0]
        p = a > 0.5
        r = gt_small > 0.5
        inter = jnp.sum(p & r)
        union = jnp.sum(p | r)
        iou = jnp.where(union > 0, inter / union, 1.0)
        flick = jnp.mean((a > 0.5) != (prev_alpha > 0.5))
        return iou, flick, a

    gate = jnp.ones((1,), bool)
    res = {}
    for mode, motion in (("moving", 1.5), ("static", 0.0)):
        state = eng.state
        prev_a = jnp.zeros((eh, ew))
        ious, flicks = [], []
        for t in range(n_frames):
            fr, gt_small = make_frame(jnp.float32(t), jnp.float32(motion))
            state, out = eng._step(
                eng.bundle.params, state, fr, eng.backgrounds, eng.knobs, gate
            )
            # multiclass: person = 1 - background class (out['alpha'] is
            # the body class only); metrics() handles the 3-D case
            alpha = (out["class_alpha"][0] if "class_alpha" in out
                     else out["alpha"][0])
            iou, flick, prev_a = metrics(alpha, gt_small, prev_a)
            if t >= 5:  # EMA warmup
                ious.append(iou)
                flicks.append(flick)
        ious = np.asarray(jax.jit(jnp.stack)(ious))
        flicks = np.asarray(jax.jit(jnp.stack)(flicks))
        res[mode] = {"iou_mean": round(float(ious.mean()), 4)}
        if mode == "static":
            res[mode]["flicker"] = round(float(flicks[1:].mean()), 6)
        eng.evict(0)
        eng.admit()
    return res


def main(n_frames: int = 24, only: str | None = None) -> None:
    dev = jax.devices()[0]
    if dev.platform == "cpu" and os.environ.get("JAX_PLATFORMS") != "cpu":
        raise SystemExit(7)
    print("device:", dev, flush=True)
    results = {}
    for name, pname, overrides, ckpt in CASES:
        if only is not None and name != only:
            continue
        try:
            results[name] = eval_case(pname, overrides, ckpt, n_frames)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, results[name], flush=True)

    path = os.path.join(ROOT, "benchmarks", "RESULTS.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    prior = data.get("variants", {})
    prior.update({"device": str(dev), "n_frames": n_frames, **results})
    data["variants"] = prior
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote variants ->", path)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 24,
        sys.argv[2] if len(sys.argv) > 2 else None,
    )
