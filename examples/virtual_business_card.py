"""End-to-end demo: the reference's "digital dress code" experience,
TPU-native and offline.

Synthetic webcam clips for N streams -> Engine (segmentation + full
refinement chain) -> personalized generated backgrounds (templates +
privacy levels) -> composited output frames written as PNGs.

Run (CPU works):
    PYTHONPATH=. python examples/virtual_business_card.py --frames 12 --out /tmp/vbc
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=2)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="/tmp/vbc")
    ap.add_argument("--privacy", default="medium", choices=["low", "medium", "high"])
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--checkpoint", default=None,
        help="orbax checkpoint dir with trained matting weights "
        "(e.g. checkpoints/mattenet)",
    )
    ap.add_argument(
        "--hd", action="store_true",
        help="run at the serving geometry (720p frames, 288x512 mask) with "
        "the fast_int8 stack -- requires checkpoints/mattenet_hd10",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from video_stream_segmenetation_tpu import background as bgm
    from video_stream_segmenetation_tpu import runtime, utils
    from video_stream_segmenetation_tpu.service import Engine
    from video_stream_segmenetation_tpu.service.server import ControlServer

    if args.hd:
        from video_stream_segmenetation_tpu.runtime.presets import preset
        import dataclasses

        frame_hw = (720, 1280)
        mask_hw = (288, 512)
        statics = dataclasses.replace(preset("fast_int8"), background="image")
        if args.checkpoint is None:
            args.checkpoint = "checkpoints/mattenet_hd10"
    else:
        frame_hw = (240, 320)
        mask_hw = (96, 128)
        statics = runtime.PipelineStatics(
            frame_hw=frame_hw, mask_hw=mask_hw, fd_size=128, lmk_size=96,
            background="image",
        )
    engine = Engine(num_streams=args.streams, statics=statics, donate_state=False)
    if args.checkpoint:
        engine.load_matting_params(args.checkpoint)
    # trained face models, when available (tools/train_face.py saves
    # geometry-suffixed checkpoints for non-default fd/lmk sizes)
    from video_stream_segmenetation_tpu.utils import face_checkpoint_paths

    fd_ck, lmk_ck = face_checkpoint_paths(
        "checkpoints", statics.fd_size, statics.lmk_size
    )
    if os.path.isdir(fd_ck):
        engine.load_face_params(fd_ck, lmk_ck)
    sched = runtime.StreamScheduler(engine, use_native_pool=True)

    # personalized backgrounds from the sample content data
    data = bgm.sample_app_data()
    renderers = {}
    for i, emp_key in zip(range(args.streams), list(data.employees) * args.streams):
        emp = data.employees[emp_key]
        r = bgm.BackgroundRenderer(
            data.templates[emp.default_template_id], emp,
            privacy=args.privacy, canvas_hw=frame_hw,
        )
        grad = np.zeros((*frame_hw, 3), np.uint8)
        grad[..., 2] = np.linspace(30, 130, frame_hw[1], dtype=np.uint8)[None, :]
        grad[..., 0] = 25
        r.set_image("background", grad)
        slot = sched.admit()
        renderers[slot] = r
        engine.set_background(slot, r.render())

    server = ControlServer(engine, renderers=renderers).start()
    print(f"control endpoint: http://127.0.0.1:{server.port}/stats")

    os.makedirs(args.out, exist_ok=True)
    clips = [
        utils.synthetic_clip(n_frames=args.frames, hw=frame_hw, seed=s, motion=2.0)
        for s in range(args.streams)
    ]
    for t in range(args.frames):
        for s in range(args.streams):
            sched.push_frame(s, clips[s].frames[t])
        out = sched.step()
        if t in (0, args.frames // 2, args.frames - 1):
            frames = np.asarray(out["frame"])
            for s in range(args.streams):
                Image.fromarray(frames[s]).save(
                    os.path.join(args.out, f"stream{s}_t{t:03d}.png")
                )
    print("metrics:", out["metrics"])
    server.stop()
    sched.stop()
    print(f"wrote frames to {args.out}")


if __name__ == "__main__":
    main()
