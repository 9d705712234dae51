"""Training loop driver + on-device synthetic matting data.

Produces the weights the zoo needs (the reference ships none of its own,
SURVEY.md §2.7).  The synthetic generator composites soft-edged
person-like ellipses over textured backgrounds entirely on device
(jax.random under jit -- host transfers through this environment are
prohibitively slow, see ARCHITECTURE.md), which is enough to train the
nets to meaningful masks for demos and regression baselines; real-data
training plugs into the same `fit` via the `data_fn` hook.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import train
from video_stream_segmenetation_tpu.train.losses import iou_metric


def synthetic_matting_batch(key, batch: int, hw: tuple[int, int]):
    """[B, H, W, 3] frames in [0,1] + [B, H, W] ground-truth alpha,
    generated on device.

    Scenes cover the distribution of the clip harness
    (utils.synthetic_clip): a soft-edged body ellipse plus a head ellipse,
    per-pixel foreground texture, textured/noisy backgrounds, sensor
    noise -- randomized per sample.
    """
    h, w = hw
    ks = jax.random.split(key, 12)
    cx = jax.random.uniform(ks[0], (batch, 1, 1), minval=0.25 * w, maxval=0.75 * w)
    cy = jax.random.uniform(ks[1], (batch, 1, 1), minval=0.45 * h, maxval=0.85 * h)
    rx = jax.random.uniform(ks[2], (batch, 1, 1), minval=0.12 * w, maxval=0.28 * w)
    ry = jax.random.uniform(ks[3], (batch, 1, 1), minval=0.28 * h, maxval=0.5 * h)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    edge = jax.random.uniform(ks[4], (batch, 1, 1), minval=0.05, maxval=0.2)
    d_body = jnp.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    a_body = jnp.clip((1.05 - d_body) / edge, 0.0, 1.0)
    # head: smaller ellipse above the body
    hy = cy - ry * jax.random.uniform(ks[5], (batch, 1, 1), minval=0.9, maxval=1.2)
    hr = rx * jax.random.uniform(ks[6], (batch, 1, 1), minval=0.35, maxval=0.55)
    d_head = jnp.sqrt(((xx - cx) / hr) ** 2 + ((yy - hy) / (hr * 1.25)) ** 2)
    a_head = jnp.clip((1.05 - d_head) / edge, 0.0, 1.0)
    alpha = jnp.maximum(a_body, a_head)

    fg_color = jax.random.uniform(ks[7], (batch, 1, 1, 3), minval=0.25, maxval=0.9)
    fg_tex = jax.random.uniform(ks[8], (batch, h, w, 3), minval=-0.15, maxval=0.15)
    bg_base = jax.random.uniform(ks[9], (batch, 1, 1, 3), minval=0.0, maxval=0.5)
    bg_tex = jax.random.uniform(ks[10], (batch, h, w, 3)) * jax.random.uniform(
        ks[10], (batch, 1, 1, 1), minval=0.1, maxval=0.4
    )
    noise = jax.random.normal(ks[11], (batch, h, w, 3)) * 0.02
    fg = fg_color + fg_tex
    bg = bg_base + bg_tex
    frame = jnp.clip(fg * alpha[..., None] + bg * (1 - alpha[..., None]) + noise, 0, 1)
    return frame, alpha


def fit(
    model,
    hw: tuple[int, int] = (96, 160),
    batch: int = 16,
    steps: int = 200,
    lr: float = 1e-3,
    seed: int = 0,
    data_fn: Callable | None = None,
    log_every: int = 50,
    mesh=None,
    init_params=None,
    steps_per_call: int = 1,
    loss_fn=None,
):
    """Train a matting model; returns (params, history).

    data_fn(key, batch, hw) -> (frames [B,H,W,3] 0..1, alpha_gt [B,H,W]);
    defaults to the synthetic generator.  With `mesh`, the batch is
    sharded over the 'data' axis and params replicated (dp training).
    `init_params` warm-starts from an existing checkpoint -- used for the
    serving-resolution fine-tune phase: conv nets transfer across
    geometry, but texture/noise frequencies relative to the stem patch
    size do not (a 240x320-trained flagship scores IoU 0.20 at 720p;
    after a short 720p fine-tune, 0.994 -- tools/train_flagship.py).

    ``steps_per_call`` > 1 rolls that many (data_fn -> train step)
    iterations into ONE jitted dispatch via ``lax.fori_loop`` -- the
    python loop pays 2 dispatches per step, and on a transport whose
    per-dispatch cost is large (BENCH r4 diag: 150-500 ms on the driver
    host) the dispatch overhead, not the chip, bounds training.
    Requires a jax-traceable ``data_fn`` (all in-repo generators are)
    and is ignored under ``mesh`` (host-side shard placement).
    """
    data_fn = data_fn or synthetic_matting_batch
    tx = train.make_optimizer(lr)
    rng = jax.random.PRNGKey(seed)
    state, _ = train.init_train_state(
        model, rng, jnp.zeros((batch, *hw, 3)), tx
    )
    if init_params is not None:
        state = train.TrainState(
            params=init_params, opt_state=tx.init(init_params), step=state.step
        )
    step_fn = train.make_train_step(model, tx, loss_fn=loss_fn)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from video_stream_segmenetation_tpu import parallel

        state = parallel.replicate_tree(mesh, state)
        data_sh = NamedSharding(mesh, P(parallel.DATA_AXIS))

        def shard(x):
            return jax.device_put(
                x, NamedSharding(mesh, P(parallel.DATA_AXIS, *[None] * (x.ndim - 1)))
            )
    else:
        shard = lambda x: x
    raw_step = step_fn
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    history = []
    t0 = time.perf_counter()
    if steps_per_call > 1 and mesh is None:
        from jax import lax

        def multi(state, i0, n):
            def body(j, carry):
                st, _ = carry
                key = jax.random.fold_in(rng, i0 + j + 1)
                frames, alpha_gt = data_fn(key, batch, hw)
                st, m = raw_step(st, frames, alpha_gt)
                return st, m["loss"]

            return lax.fori_loop(
                0, n, body, (state, jnp.float32(0.0))
            )

        multi_j = jax.jit(multi, donate_argnums=(0,))
        eval_fn = jax.jit(
            lambda p, fr: model.apply(p, fr)["alpha"]
        )
        i = 0
        while i < steps:
            k = min(steps_per_call, steps - i)
            state, last_loss = multi_j(state, i, k)
            i += k
            # chunk-boundary logging: fresh eval batch, same metric
            # (fold index offset past the training sequence's keys)
            key = jax.random.fold_in(rng, steps + i + 1)
            frames, gt = data_fn(key, batch, hw)
            out_a = eval_fn(state.params, frames)
            if out_a.shape[-2:] != gt.shape[-2:]:
                from video_stream_segmenetation_tpu.ops.resize import (
                    resize_bilinear,
                )

                gt = resize_bilinear(
                    gt, out_a.shape[-2:], method="half_pixel",
                    channel_last=False,
                )
            history.append({
                "step": i - 1,
                "loss": float(last_loss),
                "iou": float(iou_metric(out_a, gt).mean()),
                "elapsed_s": round(time.perf_counter() - t0, 1),
            })
        return state.params, history

    for i in range(steps):
        key = jax.random.fold_in(rng, i + 1)
        frames, alpha_gt = data_fn(key, batch, hw)
        frames, alpha_gt = shard(frames), shard(alpha_gt)
        state, metrics = step_fn(state, frames, alpha_gt)
        if i % log_every == 0 or i == steps - 1:
            out = model.apply(state.params, frames)
            gt = alpha_gt
            if out["alpha"].shape[-2:] != gt.shape[-2:]:
                from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

                gt = resize_bilinear(
                    gt, out["alpha"].shape[-2:], method="half_pixel",
                    channel_last=False,
                )
            iou = float(iou_metric(out["alpha"], gt).mean())
            rec = {
                "step": i,
                "loss": float(metrics["loss"]),
                "iou": iou,
                "elapsed_s": round(time.perf_counter() - t0, 1),
            }
            history.append(rec)
    return state.params, history
