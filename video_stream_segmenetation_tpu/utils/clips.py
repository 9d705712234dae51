"""Clip harness: synthetic webcam clips + mask-parity metrics.

SURVEY.md §4: the reference has no tests and no oracles; the rebuild's
quality harness is (a) golden op tests (tests/), and (b) a recorded-clip
IoU-parity harness -- run a clip through the pipeline and compare masks
against a reference (BASELINE.json metric "mask IoU parity >= 0.99").

Since the reference's matting weights are not in its repo (SURVEY.md
§2.7), the parity harness accepts ANY reference masks (e.g. exported from
the original MODNet elsewhere) as an .npz; until such masks exist, the
synthetic-clip generator provides ground truth for end-to-end regression
tests (temporal stability, IoU vs the clip's own alpha).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticClip:
    frames: np.ndarray  # [T, H, W, 3] uint8
    alpha: np.ndarray  # [T, H, W] float32 ground truth
    head_box: np.ndarray | None = None  # [T, 4] px (articulated_clip)


def synthetic_clip(
    n_frames: int = 30,
    hw: tuple[int, int] = (144, 256),
    seed: int = 0,
    motion: float = 1.5,
) -> SyntheticClip:
    """A 'webcam' clip: textured moving person-ellipse over a static
    noisy background, with soft matte edges."""
    h, w = hw
    rng = np.random.default_rng(seed)
    bg = (rng.random((h, w, 3)) * 60 + 20).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    frames = np.zeros((n_frames, h, w, 3), np.uint8)
    alphas = np.zeros((n_frames, h, w), np.float32)
    cx0, cy0 = w * 0.5, h * 0.62
    rx, ry = w * 0.18, h * 0.42
    tex = (rng.random((h, w, 3)) * 40).astype(np.float32)
    for t in range(n_frames):
        cx = cx0 + motion * 6.0 * np.sin(t * 0.21)
        cy = cy0 + motion * 3.0 * np.cos(t * 0.17)
        d = np.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
        a = np.clip((1.05 - d) / 0.1, 0.0, 1.0)  # soft edge
        person = np.array([165.0, 125.0, 105.0]) + tex
        frame = person * a[..., None] + bg * (1 - a[..., None])
        noise = rng.normal(0, 4.0, (h, w, 3))
        frames[t] = np.clip(frame + noise, 0, 255).astype(np.uint8)
        alphas[t] = a
    return SyntheticClip(frames=frames, alpha=alphas)


def articulated_clip(
    n_frames: int = 32,
    hw: tuple[int, int] = (720, 1280),
    seed: int = 0,
    bank: np.ndarray | None = None,
    features: bool = False,
    occluder_p: float = 1.0,
    wave: bool = False,
    shake_px: float = 2.0,
    motion: float = 1.0,
) -> SyntheticClip:
    """A webcam clip of an ARTICULATED procedural person (train/person.py
    skeleton: head+hair fringe, torso, 2-segment arms, clothing texture),
    with smooth pose trajectories, camera shake, and an optional occluder
    in front -- the eval side of the shared train/eval person
    distribution (VERDICT r3 #3: the quality oracle is only as
    meaningful as its people).

    * ``bank``: real-photo background bank (train/realdata.py
      load_background_bank, float [N, bh, bw, 3]); None = procedural bg.
    * ``features=True`` paints the face-template features the trained
      FaceFinder fires on and fills ``head_box`` per frame.
    * ``wave=True`` raises the right arm and waves it (fast limb motion).
    * camera shake: smooth global pan applied to person, background and
      occluder alike.

    Renders on the CPU backend (over a tunneled TPU the per-frame
    readback would dominate; the engine uploads frames itself)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu.train import person

    h, w = hw
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else (
        contextlib.nullcontext()
    )
    with ctx:
        key = jax.random.PRNGKey(seed)
        k_id, k_pose, k_occ, k_bg, k_noise = jax.random.split(key, 5)
        ident = person.sample_identity(k_id, 1)
        base = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32),
            person.sample_pose(k_pose, 1, hw),
        )
        rng = np.random.default_rng(seed)
        phases = rng.uniform(0, 6.283, size=8)

        # background: real photo crop or procedural texture
        if bank is not None:
            img = bank[seed % len(bank)]
            bh, bw = img.shape[:2]
            by0 = rng.integers(8, max(9, bh - h - 8))
            bx0 = rng.integers(8, max(9, bw - w - 8))
        else:
            img = (rng.random((h + 32, w + 32, 3)) * 0.35 + 0.08).astype(
                np.float32
            )
            img += (rng.random((h + 32, w + 32, 1)) * 0.2)
            bh, bw = img.shape[:2]
            by0, bx0 = 16, 16

        render_j = jax.jit(
            lambda pose, okey, shift: _articulated_frame(
                person, ident, pose, okey, shift, hw, features, occluder_p
            )
        )

        frames = np.zeros((n_frames, h, w, 3), np.uint8)
        alphas = np.zeros((n_frames, h, w), np.float32)
        boxes = np.zeros((n_frames, 4), np.float32)
        for t in range(n_frames):
            # smooth pose trajectory
            p = {k: v.copy() for k, v in base.items()}
            p["cx"] = p["cx"] + motion * 0.020 * w * np.sin(0.21 * t + phases[0])
            p["cy_s"] = p["cy_s"] + motion * 0.010 * h * np.cos(0.17 * t + phases[1])
            p["s"] = p["s"] * (1.0 + 0.04 * np.sin(0.07 * t + phases[2]))
            p["lean"] = p["lean"] + 0.05 * np.sin(0.13 * t + phases[3])
            p["head_dx"] = p["head_dx"] + 0.06 * np.sin(0.29 * t + phases[4])
            p["head_bob"] = p["head_bob"] + 0.03 * np.sin(0.37 * t + phases[5])
            p["armL_u"] = p["armL_u"] + 0.08 * np.sin(0.11 * t + phases[6])
            if wave:
                p["armR_u"] = np.full_like(p["armR_u"], 2.25)
                p["armR_u"] += 0.15 * np.sin(0.5 * t + phases[7])
                p["armR_d"] = np.full_like(
                    p["armR_d"], 0.5 + 0.45 * np.sin(0.9 * t)
                )
            # camera shake: integer global pan
            ox = int(round(shake_px * np.sin(0.9 * t + phases[0])
                           + 0.5 * shake_px * np.sin(2.3 * t + phases[1])))
            oy = int(round(shake_px * np.sin(1.1 * t + phases[2])
                           + 0.5 * shake_px * np.sin(2.9 * t + phases[3])))
            p["cx"] = p["cx"] + ox
            p["cy_s"] = p["cy_s"] + oy
            pose_j = {k: jnp.asarray(v) for k, v in p.items()}
            fg_rgb, a, occ_a, occ_rgb, box = render_j(
                pose_j, k_occ, jnp.asarray([float(oy), float(ox)])
            )
            # bg crop pans opposite the camera
            y0 = int(np.clip(by0 - oy, 0, bh - h))
            x0 = int(np.clip(bx0 - ox, 0, bw - w))
            bg = img[y0 : y0 + h, x0 : x0 + w]
            a_np = np.asarray(a)[0]
            occ_np = np.asarray(occ_a)[0]
            frame = (
                np.asarray(fg_rgb)[0] * a_np[..., None]
                + bg * (1.0 - a_np[..., None])
            )
            frame = (
                np.asarray(occ_rgb)[0] * occ_np[..., None]
                + frame * (1.0 - occ_np[..., None])
            )
            frame += rng.normal(0, 0.016, frame.shape)
            frames[t] = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
            alphas[t] = a_np * (1.0 - occ_np)
            boxes[t] = np.asarray(box)[0]
    return SyntheticClip(
        frames=frames, alpha=alphas,
        head_box=boxes if features else None,
    )


def _articulated_frame(person, ident, pose, okey, shift, hw, features,
                       occluder_p):
    """One jitted frame render: person + occluder layers (composited by
    the host against the panning background crop)."""
    r = person.render(ident, pose, hw, features=features)
    occ = person.sample_occluder(
        okey, 1, hw, p=occluder_p, shift=shift
    )
    return r["rgb"], r["alpha"], occ["alpha"], occ["rgb"], r["head_box"]


def mask_iou(pred: np.ndarray, ref: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Per-frame binary IoU, [T]."""
    p = pred > thresh
    r = ref > thresh
    inter = (p & r).sum(axis=(-2, -1)).astype(np.float64)
    union = (p | r).sum(axis=(-2, -1)).astype(np.float64)
    return np.where(union > 0, inter / union, 1.0)


def temporal_stability(masks: np.ndarray, thresh: float = 0.5) -> float:
    """Mean fraction of pixels whose binary label is stable frame-to-frame
    (1.0 = perfectly stable) -- the quality the temporal EMA chain buys."""
    b = masks > thresh
    if len(b) < 2:
        return 1.0
    flips = np.logical_xor(b[1:], b[:-1]).mean(axis=(-2, -1))
    return float(1.0 - flips.mean())


def run_clip_through_engine(engine, clip: SyntheticClip, stream: int = 0) -> np.ndarray:
    """Feed a clip through one engine stream; returns masks [T, h, w] at
    mask resolution (upscaled comparisons are the caller's choice)."""
    s = engine.num_streams
    fh, fw = engine.statics.frame_hw
    assert clip.frames.shape[1:3] == (fh, fw), "clip/frame geometry mismatch"
    masks = []
    batch = np.zeros((s, fh, fw, 3), np.uint8)
    for t in range(len(clip.frames)):
        batch[stream] = clip.frames[t]
        out = engine.process(batch)
        masks.append(np.asarray(out["alpha"])[stream])
    return np.stack(masks)


def parity_report(pred_masks: np.ndarray, ref_masks: np.ndarray) -> dict:
    """The BASELINE.json parity metric surface."""
    ious = mask_iou(pred_masks, ref_masks)
    return {
        "iou_mean": float(ious.mean()),
        "iou_min": float(ious.min()),
        "iou_p05": float(np.percentile(ious, 5)),
        "temporal_stability": temporal_stability(pred_masks),
        "frames": int(len(ious)),
    }


def load_reference_masks(path: str) -> np.ndarray:
    """Load reference masks from an .npz with key 'masks' ([T, H, W]) --
    the import side of the parity harness."""
    with np.load(path) as z:
        return z["masks"]
