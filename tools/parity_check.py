"""Mask-IoU parity CLI (the BASELINE.json ">= 0.99 mask IoU" harness).

Usage:
  # against reference masks exported elsewhere (npz with key 'masks'):
  python tools/parity_check.py --clip clip.npz --ref ref_masks.npz

  # self-check on a synthetic clip (ground-truth alpha as the reference):
  python tools/parity_check.py --synthetic --checkpoint checkpoints/mattenet

clip npz keys: 'frames' [T,H,W,3] u8 (and optional 'masks' for --ref).
The reference's own matting weights are not public in its repo
(SURVEY.md §2.7); when they (or their exported masks) become available,
this tool closes the parity loop with zero code changes.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", help="npz with 'frames' [T,H,W,3] u8")
    ap.add_argument("--ref", help="npz with 'masks' [T,h,w] reference masks")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from video_stream_segmenetation_tpu import runtime, utils
    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear
    from video_stream_segmenetation_tpu.service import Engine

    if args.synthetic:
        clip = utils.synthetic_clip(n_frames=args.frames, hw=(240, 320), seed=1)
        frames = clip.frames
        ref_masks = clip.alpha
    else:
        if not args.clip:
            ap.error("--clip required without --synthetic")
        with np.load(args.clip) as z:
            frames = z["frames"]
            ref_masks = z["masks"] if "masks" in z else None
        if args.ref:
            ref_masks = utils.load_reference_masks(args.ref)
        if ref_masks is None:
            ap.error("no reference masks: pass --ref or include 'masks' in the clip")

    t, fh, fw, _ = frames.shape
    mh, mw = max(32, (fh * 2 // 5) // 8 * 8), max(64, (fw * 2 // 5) // 16 * 16)
    statics = runtime.PipelineStatics(
        frame_hw=(fh, fw), mask_hw=(mh, mw),
        fd_size=128, lmk_size=96, background="color", face_path=False,
    )
    engine = Engine(num_streams=1, statics=statics, donate_state=False)
    if args.checkpoint:
        engine.load_matting_params(args.checkpoint)
    engine.admit()

    clip_obj = utils.SyntheticClip(frames=frames, alpha=np.zeros((t, fh, fw), np.float32))
    masks = utils.run_clip_through_engine(engine, clip_obj)

    # compare at mask resolution
    import jax.numpy as jnp

    ref_small = np.asarray(
        resize_bilinear(
            jnp.asarray(ref_masks.astype(np.float32)), (mh, mw),
            method="half_pixel", channel_last=False,
        )
    )
    report = utils.parity_report(masks, ref_small)
    report["target_iou"] = 0.99
    report["passes_target"] = bool(report["iou_mean"] >= 0.99)
    print(json.dumps(report, indent=2))
    return 0 if report["passes_target"] else 1


if __name__ == "__main__":
    sys.exit(main())
