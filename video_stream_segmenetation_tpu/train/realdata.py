"""Non-procedural training data: real photographic backgrounds.

The round-1 quality path trained everything on fully procedural scenes
(train/loop.py::synthetic_matting_batch).  This module exercises the
`data_fn` hook with REAL image data: the reference repo commits 15 real
1920x1080 background photographs (client/src/assets/backgrounds/ --
referenced by its data.json, SURVEY.md §2.5); we load them once, then
each training batch composites the procedural person over random
augmented crops of real photos (scale/flip/color jitter) -- the standard
"augmented static photos assembled offline" recipe.

This de-risks the quality ceiling before true human footage exists: a
model trained against real background statistics must still segment the
person on the synthetic eval (tools/train_realbg.py records the IoU
delta in benchmarks/REALDATA.json).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

REF_BG_DIR = "/root/reference/client/src/assets/backgrounds"


def person_alpha(key, batch: int, hw: tuple[int, int]) -> jnp.ndarray:
    """The procedural person matte (body + head soft ellipses) -- the
    foreground half of synthetic_matting_batch, reusable over any
    background source."""
    h, w = hw
    ks = jax.random.split(key, 7)
    cx = jax.random.uniform(ks[0], (batch, 1, 1), minval=0.25 * w, maxval=0.75 * w)
    cy = jax.random.uniform(ks[1], (batch, 1, 1), minval=0.45 * h, maxval=0.85 * h)
    rx = jax.random.uniform(ks[2], (batch, 1, 1), minval=0.12 * w, maxval=0.28 * w)
    ry = jax.random.uniform(ks[3], (batch, 1, 1), minval=0.28 * h, maxval=0.5 * h)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    edge = jax.random.uniform(ks[4], (batch, 1, 1), minval=0.05, maxval=0.2)
    d_body = jnp.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    a_body = jnp.clip((1.05 - d_body) / edge, 0.0, 1.0)
    hy = cy - ry * jax.random.uniform(ks[5], (batch, 1, 1), minval=0.9, maxval=1.2)
    hr = rx * jax.random.uniform(ks[6], (batch, 1, 1), minval=0.35, maxval=0.55)
    d_head = jnp.sqrt(((xx - cx) / hr) ** 2 + ((yy - hy) / (hr * 1.25)) ** 2)
    a_head = jnp.clip((1.05 - d_head) / edge, 0.0, 1.0)
    return jnp.maximum(a_body, a_head)


def load_background_bank(
    hw: tuple[int, int],
    directory: str = REF_BG_DIR,
    max_images: int = 16,
    oversample: float = 2,
    as_uint8: bool = False,
) -> np.ndarray:
    """Load real photos -> [N, oversample*H, oversample*W, 3] bank
    (host numpy; larger than the training res so random crops have room).
    ``as_uint8`` keeps the bank u8 (4x smaller — at serving res the
    one-time device upload rides the ~1 MB/s tunnel, so bytes matter);
    make_real_bg_data_fn converts to float after the per-sample crop.
    Raises FileNotFoundError when no photos are available."""
    from PIL import Image

    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    if not os.path.isdir(directory):
        raise FileNotFoundError(directory)
    names = sorted(
        n for n in os.listdir(directory)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )[:max_images]
    if not names:
        raise FileNotFoundError(f"no images under {directory}")
    h, w = int(hw[0] * oversample), int(hw[1] * oversample)
    bank = np.empty(
        (len(names), h, w, 3), np.uint8 if as_uint8 else np.float32
    )
    for i, n in enumerate(names):
        img = Image.open(os.path.join(directory, n)).convert("RGB").resize(
            (w, h), Image.BILINEAR
        )
        a = np.asarray(img, np.float32)
        bank[i] = a.astype(np.uint8) if as_uint8 else a / 255.0
    return bank


def make_real_bg_data_fn(bank: np.ndarray, device_bank=None,
                         person: str = "ellipse",
                         return_parts: bool = False):
    """data_fn(key, batch, hw) compositing procedural people over
    augmented random crops of the real-photo bank (train/loop.py::fit
    hook).  The bank rides to the device ONCE (host->device here is
    ~1 MB/s; per-batch uploads would dominate).

    ``person='articulated'`` uses the capsule-skeleton human
    (train/person.py: hair fringe, clothing texture, limbs, occluders) --
    the train side of the shared train/eval person distribution the
    realistic-clip parity harness measures against (VERDICT r3 #2/#3);
    'ellipse' keeps the legacy two-ellipse foreground.

    ``return_parts`` (articulated only): data_fn returns
    (frames, gt, parts) with the occluder-cut class-map parts
    (train/person.py person_scene) for the multiclass variants."""
    if return_parts and person != "articulated":
        raise ValueError("return_parts requires person='articulated'")
    bank_j = jnp.asarray(bank) if device_bank is None else device_bank
    n, bh, bw, _ = bank_j.shape

    def crop_bg(ks, batch, hw):
        h, w = hw
        idx = jax.random.randint(ks[0], (batch,), 0, n)
        # random crop window (scale 1x..bank/target, resized taps);
        # float division: the int floor collapsed fractional oversample
        scale = jax.random.uniform(ks[1], (batch,), minval=1.0, maxval=bh / h)
        y0 = jax.random.uniform(ks[2], (batch,)) * (bh - scale * h)
        x0 = jax.random.uniform(ks[3], (batch,)) * (bw - scale * w)
        yy = jnp.arange(h, dtype=jnp.float32)[None, :]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        ys = jnp.clip((y0[:, None] + yy * scale[:, None]).astype(jnp.int32), 0, bh - 1)
        xs = jnp.clip((x0[:, None] + xx * scale[:, None]).astype(jnp.int32), 0, bw - 1)
        imgs = bank_j[idx]  # [B, bh, bw, 3]
        rows = jnp.take_along_axis(imgs, ys[:, :, None, None], axis=1)
        bg = jnp.take_along_axis(rows, xs[:, None, :, None], axis=2)
        if bg.dtype == jnp.uint8:  # u8 bank: unit-convert the crop only
            bg = bg.astype(jnp.float32) / 255.0
        flip = jax.random.bernoulli(ks[4], 0.5, (batch,))
        bg = jnp.where(flip[:, None, None, None], bg[:, :, ::-1, :], bg)
        gain = jax.random.uniform(ks[5], (batch, 1, 1, 3), minval=0.7, maxval=1.2)
        return jnp.clip(bg * gain, 0.0, 1.0)

    if person == "articulated":
        from video_stream_segmenetation_tpu.train.person import person_scene

        def articulated_fn(key, batch: int, hw: tuple[int, int]):
            ks = jax.random.split(key, 7)
            bg = crop_bg(ks, batch, hw)
            if return_parts:
                frame, gt, _, parts = person_scene(
                    ks[6], batch, hw, bg,
                    features=True, occluder_p=0.3, return_parts=True,
                )
                return frame, gt, parts
            frame, gt, _ = person_scene(
                ks[6], batch, hw, bg,
                features=True, occluder_p=0.3,
            )
            return frame, gt

        return articulated_fn

    def data_fn(key, batch: int, hw: tuple[int, int]):
        h, w = hw
        ks = jax.random.split(key, 8)
        alpha = person_alpha(ks[0], batch, hw)

        idx = jax.random.randint(ks[1], (batch,), 0, n)
        # random crop window (scale 1x..2x of target, then resized taps)
        # scale 1x..(bank/target): float division -- the int floor made a
        # fractional oversample (e.g. 1.5) silently collapse the scale
        # augmentation to the constant 1.0
        scale = jax.random.uniform(ks[2], (batch,), minval=1.0, maxval=bh / h)
        y0 = jax.random.uniform(ks[3], (batch,)) * (bh - scale * h)
        x0 = jax.random.uniform(ks[4], (batch,)) * (bw - scale * w)

        yy = jnp.arange(h, dtype=jnp.float32)[None, :]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        ys = jnp.clip((y0[:, None] + yy * scale[:, None]).astype(jnp.int32), 0, bh - 1)
        xs = jnp.clip((x0[:, None] + xx * scale[:, None]).astype(jnp.int32), 0, bw - 1)
        imgs = bank_j[idx]  # [B, bh, bw, 3]
        rows = jnp.take_along_axis(imgs, ys[:, :, None, None], axis=1)
        bg = jnp.take_along_axis(rows, xs[:, None, :, None], axis=2)
        if bg.dtype == jnp.uint8:  # u8 bank: unit-convert the crop only
            bg = bg.astype(jnp.float32) / 255.0

        flip = jax.random.bernoulli(ks[5], 0.5, (batch,))
        bg = jnp.where(flip[:, None, None, None], bg[:, :, ::-1, :], bg)
        gain = jax.random.uniform(ks[6], (batch, 1, 1, 3), minval=0.7, maxval=1.2)
        bg = jnp.clip(bg * gain, 0.0, 1.0)

        fg_color = jax.random.uniform(ks[7], (batch, 1, 1, 3), minval=0.25, maxval=0.9)
        k2 = jax.random.fold_in(ks[7], 1)
        fg_tex = jax.random.uniform(k2, (batch, h, w, 3), minval=-0.15, maxval=0.15)
        noise = jax.random.normal(jax.random.fold_in(k2, 2), (batch, h, w, 3)) * 0.02
        fg = fg_color + fg_tex
        frame = jnp.clip(
            fg * alpha[..., None] + bg * (1 - alpha[..., None]) + noise, 0, 1
        )
        return frame, alpha

    return data_fn


def make_mixed_data_fn(real_fn, real_frac: float = 0.5):
    """data_fn mixing real-photo backgrounds with the fully procedural
    scenes, ``real_frac`` of each batch from the photo bank.

    REALDATA.json's cross-distribution matrix shows single-distribution
    training trades one eval for the other (synthetic-only drops to 0.73
    on real backgrounds, realbg-only to 0.71 on synthetic); the mixed
    batch is the standard fix and is what the flagship fine-tune
    (tools/train_flagship_realbg.py) uses."""
    from .loop import synthetic_matting_batch

    def data_fn(key, batch: int, hw: tuple[int, int]):
        if batch < 2:
            # both halves must be represented; a batch of 1 cannot mix --
            # fall back to the real-bg source alone
            return real_fn(key, batch, hw)
        b_real = max(1, min(batch - 1, int(round(batch * real_frac))))
        k1, k2 = jax.random.split(key)
        fr_r, a_r = real_fn(k1, b_real, hw)
        fr_s, a_s = synthetic_matting_batch(k2, batch - b_real, hw)
        return (
            jnp.concatenate([fr_r, fr_s], axis=0),
            jnp.concatenate([a_r, a_s], axis=0),
        )

    return data_fn
