"""Train the variant-model zoo on synthetic data.

The reference's alternative pipelines consume pretrained ONNX models that
its repo does not ship (RVM, U2Net -- SURVEY.md §2.4/2.7); a standalone
framework must be able to produce every weight its zoo needs.  Trains:

* RecurrentMatteNet (the RVM-class ConvGRU variant): unrolled over short
  translating clips so the recurrent state carries temporal context;
* SaliencyNet (the U2Net-class variant): plain matting loss at its
  320x320 canonical geometry;
* MatteNet(num_classes=4) (BASELINE config 5): 4-way class simplex
  (background / body / head / facial-feature region) rasterized exactly
  from the synthetic scene parts.

Run: JAX_PLATFORMS= python tools/train_variants.py [steps]
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from video_stream_segmenetation_tpu import models, utils  # noqa: E402
from video_stream_segmenetation_tpu.models.rvm import init_state  # noqa: E402
from video_stream_segmenetation_tpu.train.face import synthetic_face_batch  # noqa: E402
from video_stream_segmenetation_tpu.train.loop import synthetic_matting_batch  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints")


def _trainer(name, init_params_fn, loss_fn, steps, lr):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=1e-5))
    params = init_params_fn()
    opt = tx.init(params)

    def step(params, opt, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, key), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, metrics

    step = jax.jit(step, donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(1)
    for i in range(steps):
        rng, k = jax.random.split(rng)
        params, opt, loss, metrics = step(params, opt, k)
        if i % 200 == 0 or i == steps - 1:
            m = {k2: round(float(v), 4) for k2, v in metrics.items()}
            print(f"[{name}] {json.dumps({'step': i, 'loss': round(float(loss), 4), **m})}",
                  flush=True)
    return params


def train_rvm(steps, hw=(288, 512), batch=8, unroll=3):
    model = models.RecurrentMatteNet()

    def init_params():
        return model.init(
            jax.random.PRNGKey(0), jnp.zeros((batch, *hw, 3)), init_state(batch, hw)
        )

    def loss_fn(params, key):
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

        frames, gt = synthetic_matting_batch(key, batch, hw)
        shift = jax.random.randint(key, (), -12, 13)
        state = init_state(batch, hw)
        total = 0.0
        aux = 0.0
        for t in range(unroll):
            f_t = jnp.roll(frames, shift * t, axis=2)
            g_t = jnp.roll(gt, shift * t, axis=2)
            out = model.apply(params, f_t, state)
            state = out["state"]
            total = total + jnp.abs(out["alpha"] - g_t).mean()
            # short-path supervision on the low-res matte: BCE keeps the
            # gradient alive where the sigmoid saturates (without it the
            # net collapses to all-background)
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
        return l1 + aux / unroll, {"alpha_l1": l1, "aux": aux / unroll}

    return _trainer("rvm", init_params, loss_fn, steps, 1e-3)


def train_u2(steps, hw=(320, 320), batch=16):
    model = models.SaliencyNet()

    def init_params():
        return model.init(jax.random.PRNGKey(0), jnp.zeros((batch, *hw, 3)))

    def loss_fn(params, key):
        frames, gt = synthetic_matting_batch(key, batch, hw)
        out = model.apply(params, frames)
        l1 = jnp.abs(out["alpha"] - gt).mean()
        eps = 1e-6
        p = jnp.clip(out["alpha"], eps, 1 - eps)
        bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p)).mean()
        return l1 + 0.5 * bce, {"alpha_l1": l1, "bce": bce}

    return _trainer("u2", init_params, loss_fn, steps, 1e-3)


def _class_simplex(parts):
    """Scene parts -> 4-way class maps [B,H,W,4]: bg / body / head /
    facial features (the per-class-effects contract of config 5)."""
    feat = parts["feat"] * parts["a_head"]
    head = jnp.clip(parts["a_head"] - feat, 0.0, 1.0)
    body = jnp.clip(parts["a_body"] - parts["a_head"], 0.0, 1.0)
    fg = jnp.maximum(parts["a_body"], parts["a_head"])
    bg = 1.0 - fg
    cls = jnp.stack([bg, body, head, feat], axis=-1)
    return cls / jnp.maximum(cls.sum(-1, keepdims=True), 1e-6)


def train_multiclass(steps, hw=(288, 512), batch=12, k=4):
    model = models.MatteNet(num_classes=k)

    def init_params():
        return model.init(jax.random.PRNGKey(0), jnp.zeros((batch, *hw, 3)))

    def loss_fn(params, key):
        frames, _, _, parts = synthetic_face_batch(key, batch, hw, return_parts=True)
        gt = _class_simplex(parts)
        out = model.apply(params, frames)
        a = out["alpha"]  # [B,h,w,K] softmax
        if a.shape[-3:-1] != gt.shape[-3:-1]:
            from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

            gt = resize_bilinear(gt, a.shape[-3:-1], method="half_pixel")
            gt = gt / jnp.maximum(gt.sum(-1, keepdims=True), 1e-6)
        # class-weighted CE: head/feature regions are tiny next to
        # bg/body; unweighted CE lets the net ignore them
        w = jnp.asarray([1.0, 1.0, 3.0, 6.0])[: a.shape[-1]]
        ce = -((gt * jnp.log(jnp.clip(a, 1e-6, 1.0))) * w).sum(-1).mean()
        acc = (jnp.argmax(a, -1) == jnp.argmax(gt, -1)).mean()
        return ce, {"ce": ce, "pixel_acc": acc}

    return _trainer("multiclass", init_params, loss_fn, steps, 1e-3)


def train_multiclass_hd(steps, hw=(720, 1280), batch=6, k=4,
                        pre_hw=(240, 320), pre_batch=24, decoder="nano"):
    """K-class MatteNetHD for the multiclass fast stack (presets
    'multiclass_fast' / 'multiclass_fast_pico'): pretrain small,
    fine-tune at 720p (the mandatory serving-resolution phase,
    train/loop.py::fit).  The nano/pico trunks won the single-class
    quality/speed study (RESULTS.md) and the same holds here."""
    model = models.MatteNetHD(
        stem_stride=10, head_upsample=4, num_classes=k, decoder=decoder
    )

    def loss_at(hw_, batch_):
        def loss_fn(params, key):
            frames, _, _, parts = synthetic_face_batch(
                key, batch_, hw_, return_parts=True
            )
            gt = _class_simplex(parts)
            out = model.apply(params, frames)
            a = out["alpha"]
            if a.shape[-3:-1] != gt.shape[-3:-1]:
                from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

                gt = resize_bilinear(gt, a.shape[-3:-1], method="half_pixel")
                gt = gt / jnp.maximum(gt.sum(-1, keepdims=True), 1e-6)
            w = jnp.asarray([1.0, 1.0, 3.0, 6.0])[: a.shape[-1]]
            ce = -((gt * jnp.log(jnp.clip(a, 1e-6, 1.0))) * w).sum(-1).mean()
            acc = (jnp.argmax(a, -1) == jnp.argmax(gt, -1)).mean()
            return ce, {"ce": ce, "pixel_acc": acc}
        return loss_fn

    def init_params():
        return model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *pre_hw, 3))
        )

    p = _trainer("multiclass_hd/pre", init_params, loss_at(pre_hw, pre_batch),
                 steps, 5e-4)
    p = _trainer("multiclass_hd/ft", lambda: p, loss_at(hw, batch),
                 max(steps // 2, 200), 2e-4)
    return p


def main(steps=1200, only=None):
    os.makedirs(OUT, exist_ok=True)
    jobs = {
        "rvm": lambda: utils.save_params(os.path.join(OUT, "rvm"), train_rvm(steps)),
        "u2net": lambda: utils.save_params(os.path.join(OUT, "u2net"), train_u2(steps)),
        "multiclass": lambda: utils.save_params(
            os.path.join(OUT, "mattenet_multiclass"), train_multiclass(steps)
        ),
        "multiclass_hd": lambda: utils.save_params(
            os.path.join(OUT, "mattenet_hd10_mc"), train_multiclass_hd(steps)
        ),
        "multiclass_hd_pico": lambda: utils.save_params(
            os.path.join(OUT, "mattenet_hd10_mc_pico"),
            train_multiclass_hd(steps, decoder="pico"),
        ),
    }
    for name, job in jobs.items():
        if only and name not in only:
            continue
        job()
        print(f"[{name}] saved", flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1200,
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
    )
