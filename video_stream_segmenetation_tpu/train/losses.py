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
