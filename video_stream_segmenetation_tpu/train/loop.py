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
    generated on device."""
    h, w = hw
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    cx = jax.random.uniform(k1, (batch, 1, 1), minval=0.3 * w, maxval=0.7 * w)
    cy = jax.random.uniform(k2, (batch, 1, 1), minval=0.4 * h, maxval=0.8 * h)
    rx = jax.random.uniform(k3, (batch, 1, 1), minval=0.12 * w, maxval=0.25 * w)
    ry = jax.random.uniform(k4, (batch, 1, 1), minval=0.3 * h, maxval=0.5 * h)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    d = jnp.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    alpha = jnp.clip((1.05 - d) / 0.1, 0.0, 1.0)

    fg_color = jax.random.uniform(k5, (batch, 1, 1, 3), minval=0.3, maxval=0.9)
    bg = jax.random.uniform(k6, (batch, h, w, 3)) * 0.4
    noise = jax.random.normal(jax.random.fold_in(k6, 1), (batch, h, w, 3)) * 0.02
    fg = fg_color + jax.random.uniform(
        jax.random.fold_in(k5, 1), (batch, h, w, 3), minval=-0.1, maxval=0.1
    )
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
):
    """Train a matting model; returns (params, history).

    data_fn(key, batch, hw) -> (frames [B,H,W,3] 0..1, alpha_gt [B,H,W]);
    defaults to the synthetic generator.  With `mesh`, the batch is
    sharded over the 'data' axis and params replicated (dp training).
    """
    data_fn = data_fn or synthetic_matting_batch
    tx = train.make_optimizer(lr)
    rng = jax.random.PRNGKey(seed)
    state, _ = train.init_train_state(
        model, rng, jnp.zeros((batch, *hw, 3)), tx
    )
    step_fn = train.make_train_step(model, tx)
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
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    history = []
    t0 = time.perf_counter()
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
