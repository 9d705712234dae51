"""Articulated/real-background fine-tunes for the lagging variant zoo
(VERDICT r4 #5): RVM and the multiclass pico, with the same recipe that
fixed the flagship and the 'active' variant -- articulated people over
the reference's real photos, mixed 50/50 with the procedural scenes,
chunked fori_loop training (the python-loop trainer pays 150-500 ms of
transport per step on this host).

Saves CANDIDATE checkpoints (suffix _mix); promotion is gated on BOTH
distributions (tools/eval_variants.py synthetic + eval_variants_realistic
realistic) before copying over the serving name.

Run: JAX_PLATFORMS= python tools/finetune_variants_realbg.py rvm [steps]
     JAX_PLATFORMS= python tools/finetune_variants_realbg.py multiclass_pico [steps]
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
import optax  # noqa: E402

from video_stream_segmenetation_tpu import models, utils  # noqa: E402
from video_stream_segmenetation_tpu.train.loop import (  # noqa: E402
    synthetic_matting_batch,
)
from video_stream_segmenetation_tpu.train.realdata import (  # noqa: E402
    load_background_bank,
    make_real_bg_data_fn,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")


def chunked_train(name, params, loss_fn, steps, lr, chunk=50):
    """fori_loop-chunked fine-tune (tools/train_face.py pattern): one
    dispatch per `chunk` steps -- mandatory on this transport."""
    from jax import lax

    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=1e-5)
    )
    opt = tx.init(params)

    def one(params, opt, key):
        (loss, _m), grads = jax.value_and_grad(
            lambda p: loss_fn(p, key), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    def multi(params, opt, rng0, n):
        def body(j, c):
            p, o, rng, _ = c
            rng, k = jax.random.split(rng)
            p, o, loss = one(p, o, k)
            return p, o, rng, loss

        return lax.fori_loop(0, n, body, (params, opt, rng0, jnp.float32(0)))

    multi_j = jax.jit(multi, donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(3)
    i = 0
    while i < steps:
        n = min(chunk, steps - i)
        params, opt, rng, loss = multi_j(params, opt, rng, n)
        i += n
        if i % (chunk * 4) == 0 or i >= steps:
            print(f"[{name}] {json.dumps({'step': i, 'loss': round(float(loss), 4)})}",
                  flush=True)
    return params


def finetune_rvm(steps=4000, hw=(288, 512), batch=8, unroll=3,
                 render_hw=(720, 1280)):
    """RVM on the articulated mix: same loss as train_variants.train_rvm
    (L1 on the matte + short-path L1+BCE aux, roll-shift temporal
    unroll), data 50/50 articulated-over-real-photos / procedural.

    Scenes are RENDERED at the serving frame resolution (720p) and
    downsampled to the model input through the SAME resize op the
    pipeline uses — the realistic-variant eval exposed a render-domain
    gap: the 'active' checkpoint fine-tuned on 288-native renders scores
    0.99 on synthetic ellipses but 0.65 on 720p-rendered articulated
    clips (benchmarks/RESULTS.json variants_realistic), because hair
    fringe / features / texture land at different frequencies when
    rendered at 288 vs rendered at 720 and resized."""
    from video_stream_segmenetation_tpu.models.rvm import init_state
    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

    bank = load_background_bank(render_hw, oversample=2.0, as_uint8=True)
    real_fn = make_real_bg_data_fn(bank, person="articulated")

    model = models.RecurrentMatteNet()
    like = model.init(
        jax.random.PRNGKey(0), jnp.zeros((batch, *hw, 3)),
        init_state(batch, hw),
    )
    # VST_RESUME: continue from a prior candidate instead of the serving
    # checkpoint (loss was still descending at the first 4000 steps)
    src = os.environ.get("VST_RESUME", "rvm")
    params = utils.restore_params(os.path.join(CKPT, src), like=like)

    def serve_down(fr, a):
        # the pipeline's preprocess semantics (ops/resize.py asymmetric)
        fr = resize_bilinear(fr, hw, method="asymmetric")
        a = resize_bilinear(a, hw, method="asymmetric", channel_last=False)
        return fr, a

    def data_fn(key, b, hw_):
        k1, k2 = jax.random.split(key)
        b_r = b // 2
        fr_r, a_r = serve_down(*real_fn(k1, b_r, render_hw))
        fr_s, a_s = serve_down(
            *synthetic_matting_batch(k2, b - b_r, render_hw)
        )
        return (jnp.concatenate([fr_r, fr_s]), jnp.concatenate([a_r, a_s]))

    def loss_fn(params, key):
        frames, gt = data_fn(key, batch, hw)
        shift = jax.random.randint(key, (), -12, 13)
        state = init_state(batch, hw)
        total, aux = 0.0, 0.0
        for t in range(unroll):
            f_t = jnp.roll(frames, shift * t, axis=2)
            g_t = jnp.roll(gt, shift * t, axis=2)
            out = model.apply(params, f_t, state)
            state = out["state"]
            total = total + jnp.abs(out["alpha"] - g_t).mean()
            a_s = out["alpha_small"]
            g_s = resize_bilinear(
                g_t, a_s.shape[-2:], method="half_pixel", channel_last=False
            )
            eps = 1e-6
            p_ = jnp.clip(a_s, eps, 1 - eps)
            aux = aux + (
                jnp.abs(a_s - g_s).mean()
                - (g_s * jnp.log(p_) + (1 - g_s) * jnp.log(1 - p_)).mean()
            )
        l1 = total / unroll
        return l1 + aux / unroll, {"alpha_l1": l1}

    params = chunked_train("rvm/mix", params, loss_fn, steps, 3e-4, chunk=25)
    utils.save_params(os.path.join(CKPT, "rvm_mix"), params)
    print("saved -> checkpoints/rvm_mix (gate via eval_variants[_realistic] "
          "VST_CKPT_RVM=rvm_mix before promoting)", flush=True)


def finetune_multiclass_pico(steps=4000, hw=(720, 1280), batch=4,
                             small_hw=(240, 320), small_batch=16):
    """Multiclass pico on the articulated mix: class-weighted CE on the
    4-way simplex, articulated parts (train/person.py class maps) 50/50
    with the procedural face scenes; multi-resolution phases (the
    single-res lesson from the active fine-tune: texture frequencies do
    not transfer across the stem scale)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_variants import _class_simplex

    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear
    from video_stream_segmenetation_tpu.train.face import synthetic_face_batch

    model = models.MatteNetHD(
        stem_stride=10, head_upsample=4, num_classes=4, decoder="pico"
    )
    like = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *small_hw, 3)))
    params = utils.restore_params(
        os.path.join(CKPT, "mattenet_hd10_mc_pico"), like=like
    )

    banks = {
        h: load_background_bank(h, oversample=2.0, as_uint8=True)
        for h in (hw, small_hw)
    }
    real_fns = {
        h: make_real_bg_data_fn(b, person="articulated", return_parts=True)
        for h, b in banks.items()
    }

    def loss_at(hw_, batch_):
        real_fn = real_fns[hw_]

        def loss_fn(params, key):
            k1, k2, k3 = jax.random.split(key, 3)
            b_r = batch_ // 2
            b_f = max(1, batch_ // 4)
            b_e = batch_ - b_r - b_f
            fr_r, _gt, parts_r = real_fn(k1, b_r, hw_)
            fr_s, _b, _l, parts_s = synthetic_face_batch(
                k2, b_f, hw_, return_parts=True
            )
            # plain head-free people (the synthetic gate's distribution):
            # whole person = body class, head/features zero -- without
            # this third the fine-tune forgets the featureless person
            # (first attempt: synthetic gate 0.984 -> 0.588)
            fr_e, a_e = synthetic_matting_batch(k3, b_e, hw_)
            parts_e = {
                "a_body": a_e,
                "a_head": jnp.zeros_like(a_e),
                "feat": jnp.zeros_like(a_e),
            }
            frames = jnp.concatenate([fr_r, fr_s, fr_e])
            gt = jnp.concatenate(
                [_class_simplex(parts_r), _class_simplex(parts_s),
                 _class_simplex(parts_e)]
            )
            out = model.apply(params, frames)
            a = out["alpha"]
            if a.shape[-3:-1] != gt.shape[-3:-1]:
                gt = resize_bilinear(gt, a.shape[-3:-1], method="half_pixel")
                gt = gt / jnp.maximum(gt.sum(-1, keepdims=True), 1e-6)
            w = jnp.asarray([1.0, 1.0, 3.0, 6.0])[: a.shape[-1]]
            ce = -((gt * jnp.log(jnp.clip(a, 1e-6, 1.0))) * w).sum(-1).mean()
            return ce, {"ce": ce}

        return loss_fn

    # the serving render (720p) carries the most steps; the small phases
    # bracket it for cross-geometry robustness (the active-variant
    # multi-res lesson)
    for phw, pbatch, plr, psteps, tag in (
        (small_hw, small_batch, 3e-4, max(steps // 2, 400), "pre"),
        (hw, batch, 1e-4, steps, "ft720"),
        (small_hw, small_batch, 7e-5, max(steps // 4, 200), "polish"),
    ):
        params = chunked_train(
            f"mc_pico/{tag}", params, loss_at(phw, pbatch), psteps, plr,
            chunk=25 if phw == hw else 50,
        )
    utils.save_params(os.path.join(CKPT, "mattenet_hd10_mc_pico_mix"), params)
    print("saved -> checkpoints/mattenet_hd10_mc_pico_mix (gate via "
          "eval_variants[_realistic] VST_CKPT_MC_PICO=... before "
          "promoting)", flush=True)


if __name__ == "__main__":
    job = sys.argv[1] if len(sys.argv) > 1 else "rvm"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    if job == "rvm":
        finetune_rvm(steps)
    elif job == "multiclass_pico":
        finetune_multiclass_pico(steps)
    else:
        raise SystemExit(f"unknown job {job}")
