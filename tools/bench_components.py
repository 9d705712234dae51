"""Per-stage device timing of the pipeline on real hardware.

Uses the chained-dispatch + scalar-sync methodology from bench.py (the
tunnel breaks block_until_ready).  Run: python tools/bench_components.py
"""

from __future__ import annotations

import json
import time

import numpy as np

S = 64
FRAME_HW = (720, 1280)
MASK_HW = (288, 512)


def time_chain(fn, sync_of, n=20, reps=3, rtt_probe=None):
    """fn: state -> state (device).  Returns ms per call."""
    import jax

    state = fn(None)
    _ = np.asarray(sync_of(state))
    t0 = time.perf_counter()
    _ = np.asarray(sync_of(state))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = fn(s)
        _ = np.asarray(sync_of(s))
        total = time.perf_counter() - t0 - rtt
        best = min(best, total / n)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import models, ops, runtime

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        (rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8)
    )
    frames_f32 = frames.astype(jnp.float32) / 255.0
    small = ops.resize_bilinear(frames_f32, MASK_HW, method="asymmetric")
    small = jax.block_until_ready(small)
    alpha = jnp.asarray(rng.random((S, *MASK_HW), dtype=np.float32))
    guide = small * 255.0
    prior = ops.face_prior_mask(
        jnp.asarray([[400.0, 150.0, 800.0, 600.0]] * S), FRAME_HW, MASK_HW
    )
    results = {}

    # ---- preprocess: u8 -> f32 -> resize to mask res
    pre = jax.jit(
        lambda f: ops.resize_bilinear(f.astype(jnp.float32) / 255.0, MASK_HW, method="asymmetric")
    )
    results["preprocess_resize"] = time_chain(
        lambda s: pre(frames) if s is None else pre(frames) + 0 * s[:1, :1, :1, :1].sum(),
        lambda s: s[0, 0, 0, 0],
    )

    # ---- matte forward
    matte = models.MatteNet()
    mp = matte.init(jax.random.PRNGKey(0), jnp.zeros((1, *MASK_HW, 3)))
    mf = jax.jit(lambda x: matte.apply(mp, x)["alpha"])
    results["matte_forward"] = time_chain(
        lambda s: mf(small if s is None else small + 0 * s[:1, :1, None]),
        lambda s: s[0, 0, 0],
    )

    # ---- face path (detector + landmarks, batched, incl. letterbox+crop)
    statics = runtime.PipelineStatics(frame_hw=FRAME_HW, mask_hw=MASK_HW)
    face = models.FaceFinder(input_size=256)
    fp = face.init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)))
    lmkm = models.LandmarkNet()
    lp = lmkm.init(jax.random.PRNGKey(2), jnp.zeros((1, 192, 192, 3)))
    bundle = runtime.ModelBundle(matte, mp, face, fp, lmkm, lp)
    from video_stream_segmenetation_tpu.runtime.pipeline import _face_subpath

    st = runtime.init_state(S, MASK_HW)
    gate = jnp.ones((S,), bool)

    @jax.jit
    def facefn(f):
        pr, hp, au, hu, sc = _face_subpath(bundle, bundle.params, f, st, statics, gate)
        return pr, au

    results["face_subpath"] = time_chain(
        lambda s: facefn(frames_f32 if s is None else frames_f32 + 0 * s[0][:1, :1, :1].sum()),
        lambda s: s[1][0, 0],
    )

    # ---- refinement chain (XLA)
    knobs = runtime.default_knobs(S)

    @jax.jit
    def refine_xla(a):
        a = ops.morphological_opening(a)
        a = ops.morphological_closing_in_prior(a, prior, jnp.ones((S,), bool))
        ab = ops.joint_bilateral3x3(a, guide, knobs.sigma_spatial, knobs.sigma_range)
        a = jnp.where(knobs.use_bilateral[:, None, None], ab, a)
        return ops.refine_alpha(a, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma, prior, True)

    results["refine_chain_xla"] = time_chain(
        lambda s: refine_xla(alpha if s is None else alpha + 0 * s[:1, :1]),
        lambda s: s[0, 0, 0],
    )

    # ---- refinement chain (pallas fused)
    from video_stream_segmenetation_tpu.kernels.refine_fused import fused_refine

    @jax.jit
    def refine_pl(a):
        return fused_refine(
            a, guide, prior,
            knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
            knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
            jnp.ones((S,), bool),
        )

    try:
        results["refine_chain_pallas"] = time_chain(
            lambda s: refine_pl(alpha if s is None else alpha + 0 * s[:1, :1]),
            lambda s: s[0, 0, 0],
        )
    except Exception as e:
        results["refine_chain_pallas"] = f"FAILED: {type(e).__name__}: {e}"[:300]

    # ---- warp
    aff = jnp.tile(jnp.asarray([1.01, 0.02, 1.0, -0.02, 1.01, -0.5]), (S, 1))
    wf = jax.jit(lambda a: ops.warp_affine_nearest(a, aff))
    results["warp"] = time_chain(
        lambda s: wf(alpha if s is None else alpha + 0 * s[:1, :1]),
        lambda s: s[0, 0, 0],
    )

    # ---- composite (upsample + blend, u8 out)
    bg = jnp.zeros((S, *FRAME_HW, 3), jnp.float32)
    cf = jax.jit(lambda a: ops.alpha_composite(frames_f32, a, background=bg, out_u8=True))
    results["composite"] = time_chain(
        lambda s: cf(alpha if s is None else alpha + 0 * s[:1, :1, :1, 0].astype(jnp.float32)),
        lambda s: s[0, 0, 0].astype(jnp.int32),
    )

    for k, v in results.items():
        print(f"{k:24s} {v if isinstance(v, str) else f'{v:8.2f} ms'}")
    print(json.dumps({k: (round(v, 2) if not isinstance(v, str) else v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
