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


def _onnx_reference_masks(path: str, frames: np.ndarray, in_hw) -> np.ndarray:
    """Run a user-provided matting ONNX over the clip to produce the
    reference masks (the reference pipeline's preprocess: bilinear resize
    to the model input, /255, NCHW -- frameProcessorTest.ts:79-87).  The
    graph executes through utils/onnx_exec.build_jax_fn (op coverage:
    Conv[grouped] / BN / Resize / SE poolings / hard activations --
    the MODNet/U2Net/RVM-class float-export op set)."""
    import jax
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear
    from video_stream_segmenetation_tpu.utils import onnx_exec, onnx_lite

    model = onnx_lite.load(path)
    fn, params = onnx_exec.build_jax_fn(model)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    in_name = model.graph.inputs[0][0]
    jfn = jax.jit(lambda p, x: fn(p, **{in_name: x}))
    masks = []
    for fr in frames:
        x = resize_bilinear(
            jnp.asarray(fr, jnp.float32)[None] / 255.0, in_hw,
            method="asymmetric",
        )
        x = jnp.transpose(x, (0, 3, 1, 2))
        out = jfn(params, x)
        # duck-typed mask output discovery ([1,1,h,w] / [1,h,w]), the
        # u2FrameProc.ts:43-75 pickMaskOutput behavior
        m = None
        for v in out.values():
            a = np.asarray(v)
            if a.ndim == 4 and a.shape[:2] == (1, 1):
                m = a[0, 0]
                break
            if a.ndim == 3 and a.shape[0] == 1:
                m = a[0]
        if m is None:
            raise ValueError(f"{path}: no [1,1,h,w] mask-like output found")
        masks.append(m.astype(np.float32))
    return np.stack(masks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", help="npz with 'frames' [T,H,W,3] u8")
    ap.add_argument("--ref", help="npz with 'masks' [T,h,w] reference masks")
    ap.add_argument(
        "--onnx-ref",
        help="a matting ONNX file (e.g. the reference's model_q4f16.onnx "
        "float export, or any MODNet/U2Net-class model): executed "
        "directly via utils/onnx_exec.py to PRODUCE the reference masks "
        "on --clip -- closes the BASELINE parity loop when the user has "
        "the model file",
    )
    ap.add_argument(
        "--onnx-input-hw", default="288,512",
        help="H,W the ONNX model expects (model_q4f16: 288,512)",
    )
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
        if args.onnx_ref:
            ref_masks = _onnx_reference_masks(
                args.onnx_ref, frames,
                tuple(int(v) for v in args.onnx_input_hw.split(",")),
            )
        if ref_masks is None:
            ap.error(
                "no reference masks: pass --ref / --onnx-ref or include "
                "'masks' in the clip"
            )

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
