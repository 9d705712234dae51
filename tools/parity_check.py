"""Mask-IoU parity CLI (the BASELINE.json ">= 0.99 mask IoU" harness).

Usage (bring your own clip -- see README "Evaluating on your own clips"):
  # frames as a directory of images (sorted) or an npz:
  python tools/parity_check.py --clip my_clip_dir --ref ref_masks_dir
  python tools/parity_check.py --clip clip.npz --ref ref_masks.npz

  # produce the reference masks by EXECUTING a matting ONNX you have
  # (e.g. the reference's model_q4f16.onnx float export):
  python tools/parity_check.py --clip my_clip_dir --onnx-ref model.onnx

  # self-check on a synthetic clip (ground-truth alpha as the reference):
  python tools/parity_check.py --synthetic --checkpoint checkpoints/mattenet

clip npz keys: 'frames' [T,H,W,3] u8 (and optional 'masks' for --ref);
clip dir: *.png/*.jpg frames in name order; --ref dir: grayscale masks.
720p clips run the production fast_int8_pico serving preset with the
shipped flagship checkpoint automatically; other geometries use a
generic engine (pass --checkpoint).  The reference's own matting weights
are not public in its repo (SURVEY.md §2.7); when they (or their
exported masks) become available, this tool closes the parity loop with
zero code changes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def _load_image_dir(path: str, as_mask: bool = False) -> np.ndarray:
    """A directory of images (sorted by name) -> [T,H,W,3] u8 frames or
    [T,H,W] f32 masks (grayscale, 0..1)."""
    import os

    from PIL import Image

    names = sorted(
        n for n in os.listdir(path)
        if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    if not names:
        raise ValueError(f"{path}: no image files")
    out = []
    for n in names:
        img = Image.open(os.path.join(path, n))
        if as_mask:
            a = np.asarray(img.convert("L"), np.float32) / 255.0
        else:
            a = np.asarray(img.convert("RGB"), np.uint8)
        out.append(a)
    return np.stack(out)


def _load_frames(path: str):
    """--clip loader: npz (keys 'frames' [+ 'masks']) or image dir."""
    import os

    if os.path.isdir(path):
        return _load_image_dir(path), None
    with np.load(path) as z:
        return z["frames"], (z["masks"] if "masks" in z else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--clip",
        help="npz with 'frames' [T,H,W,3] u8, or a directory of frame "
        "images (sorted by name)",
    )
    ap.add_argument(
        "--ref",
        help="npz with 'masks' [T,h,w] reference masks, or a directory "
        "of grayscale mask images",
    )
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
        frames, ref_masks = _load_frames(args.clip)
        if args.ref:
            import os as _os

            ref_masks = (
                _load_image_dir(args.ref, as_mask=True)
                if _os.path.isdir(args.ref)
                else utils.load_reference_masks(args.ref)
            )
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
    if (fh, fw) == (720, 1280) and not args.synthetic:
        # serving geometry: run the PRODUCTION preset with the shipped
        # flagship checkpoint (the config a reference user would compare)
        import dataclasses
        import os as _os

        from video_stream_segmenetation_tpu.runtime.presets import preset

        mh, mw = 288, 512
        statics = dataclasses.replace(
            preset("fast_int8_pico"),
            background="color", face_path=False, fd_size=64, lmk_size=48,
        )
        engine = Engine(num_streams=1, statics=statics, donate_state=False)
        default_ckpt = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "checkpoints", "mattenet_hd10_pico",
        )
        engine.load_matting_params(args.checkpoint or default_ckpt)
    else:
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
