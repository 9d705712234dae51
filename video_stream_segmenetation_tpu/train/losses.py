"""Matting training objectives.

The reference ships no training (SURVEY.md explicit non-goal *inherited*),
but a standalone framework must be able to produce the weights its zoo
needs (the reference's own matting weights are absent from its repo,
SURVEY.md §2.7).  Losses follow the MODNet decomposition: semantic L2 at
low res, detail L1 near boundaries, alpha L1 + composition loss at full
res.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu.ops.resize import resize_bilinear


def _boundary_mask(alpha_gt: jnp.ndarray, lo: float = 0.05, hi: float = 0.95) -> jnp.ndarray:
    """Transition-region mask: where ground truth is neither bg nor fg."""
    return ((alpha_gt > lo) & (alpha_gt < hi)).astype(jnp.float32)


def matting_loss(
    outputs: dict,
    alpha_gt: jnp.ndarray,
    frame: jnp.ndarray,
    fg: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    w_semantic: float = 1.0,
    w_detail: float = 10.0,
    w_alpha: float = 1.0,
    w_comp: float = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """outputs: MatteNet dict; alpha_gt [S,H,W]; frame [S,H,W,3] in [0,1].

    Returns (scalar loss, metrics dict).
    """
    alpha = outputs["alpha"].astype(jnp.float32)
    # models may emit alpha at a different resolution than the input
    # (MatteNetHD: input/2.5 -- the 288x512 mask contract at 720p);
    # compare at the model's output geometry
    if alpha.shape[-2:] != alpha_gt.shape[-2:]:
        alpha_gt = resize_bilinear(
            alpha_gt, alpha.shape[-2:], method="half_pixel", channel_last=False
        )
        frame = resize_bilinear(frame, alpha.shape[-2:], method="half_pixel")
        if fg is not None:
            fg = resize_bilinear(fg, alpha.shape[-2:], method="half_pixel")
        if bg is not None:
            bg = resize_bilinear(bg, alpha.shape[-2:], method="half_pixel")
    h16 = outputs["semantic"].shape[-2:]
    h4 = outputs["detail"].shape[-2:]

    sem_gt = resize_bilinear(alpha_gt, h16, method="half_pixel", channel_last=False)
    sem_loss = jnp.mean((outputs["semantic"] - sem_gt) ** 2)

    det_gt = resize_bilinear(alpha_gt, h4, method="half_pixel", channel_last=False)
    det_pred = jax.nn.sigmoid(outputs["detail"])
    bmask = _boundary_mask(det_gt)
    det_loss = jnp.sum(jnp.abs(det_pred - det_gt) * bmask) / (jnp.sum(bmask) + 1.0)

    # foreground-weighted L1: persons cover a minority of pixels; an
    # unweighted L1 lets the net collapse to all-background
    wmap = 1.0 + 4.0 * alpha_gt
    alpha_loss = jnp.sum(jnp.abs(alpha - alpha_gt) * wmap) / jnp.sum(wmap)

    if fg is not None and bg is not None:
        comp_pred = fg * alpha[..., None] + bg * (1 - alpha[..., None])
        comp_loss = jnp.mean(jnp.abs(comp_pred - frame))
    else:
        # self-composition: predicted vs gt alpha over the frame itself
        comp_loss = jnp.mean(
            jnp.abs(frame * alpha[..., None] - frame * alpha_gt[..., None])
        )

    total = (
        w_semantic * sem_loss
        + w_detail * det_loss
        + w_alpha * alpha_loss
        + w_comp * comp_loss
    )
    return total, {
        "loss": total,
        "semantic": sem_loss,
        "detail": det_loss,
        "alpha": alpha_loss,
        "composition": comp_loss,
    }


def iou_metric(pred: jnp.ndarray, gt: jnp.ndarray, thresh: float = 0.5) -> jnp.ndarray:
    """Binary mask IoU -- the parity metric named in BASELINE.json."""
    p = pred > thresh
    g = gt > thresh
    inter = jnp.sum(p & g, axis=(-2, -1)).astype(jnp.float32)
    union = jnp.sum(p | g, axis=(-2, -1)).astype(jnp.float32)
    return jnp.where(union > 0, inter / union, 1.0)


def make_pipeline_loss(model, base_weight: float = 0.3,
                       w_l1: float = 1.0, w_iou: float = 1.0):
    """Serving-chain-aware objective: score the alpha AFTER the
    reference's refine chain, not just the raw model output.

    Why: the refine stages (opening -> joint bilateral vs the guide ->
    noise-cutoff/threshold/gamma, frameProcessorTest.ts:644-685,
    :230-266, :270-313) re-calibrate the matte's level sets.  A model
    trained only at the raw-alpha level can be sharp in isolation yet
    sit ~1 px off the chain's 0.5 level set -- measured: a fine-tune
    that lifted model-only IoU 0.85 -> 0.98 DROPPED the served pipeline
    IoU 0.987 -> 0.952 on the same held-out clips.  The chain is plain
    differentiable jnp (min/max pools, weighted sums, smooth clamps), so
    the fix is to backprop through it: loss = base matting loss (keeps
    the raw alpha meaningful for int8 calibration) + L1/soft-IoU on the
    refined alpha at default knob values.

    Single-frame approximation: warp/EMA are identity on a fresh stream
    (first-frame-copy semantics) and the face prior is absent, exactly
    the face_path=False serving configuration.
    """
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime import config as cfg

    def loss_fn(params, frames, alpha_gt):
        out = model.apply(params, frames)
        base, metrics = matting_loss(out, alpha_gt, frames)
        a = out["alpha"].astype(jnp.float32)
        mh, mw = a.shape[-2:]
        gt = alpha_gt
        if gt.shape[-2:] != (mh, mw):
            gt = resize_bilinear(
                gt, (mh, mw), method="half_pixel", channel_last=False
            )
        guide = jnp.floor(
            resize_bilinear(frames, (mh, mw), method="asymmetric") * 255.0
            + 0.5
        )
        r = ops.morphological_opening(a)
        r = ops.joint_bilateral3x3(
            r, guide, cfg.DEFAULT_BILATERAL_SIGMA_SPATIAL,
            cfg.DEFAULT_BILATERAL_SIGMA_RANGE,
        )
        # stage-9 threshold/gamma with a GRAD-SAFE power: d(x^0.4)/dx is
        # infinite at x=0 (ops.refine_alpha is exact for serving; the
        # epsilon floor shifts the forward by <= 0.004 only at exact 0)
        low, high = cfg.DEFAULT_NOISE_CUTOFF, cfg.DEFAULT_HIGH_THRESHOLD
        norm = jnp.clip((r - low) / (high - low), 0.0, 1.0)
        r = jnp.power(jnp.maximum(norm, 1e-6), cfg.DEFAULT_GAMMA)
        l1 = jnp.abs(r - gt).mean()
        inter = jnp.sum(jnp.minimum(r, gt), axis=(-2, -1))
        union = jnp.sum(jnp.maximum(r, gt), axis=(-2, -1))
        soft_iou = (inter / jnp.maximum(union, 1.0)).mean()
        pipe = w_l1 * l1 + w_iou * (1.0 - soft_iou)
        metrics = dict(metrics, pipe_l1=l1, pipe_soft_iou=soft_iou)
        return base_weight * base + pipe, metrics

    return loss_fn
