"""Per-stage device timing of individual ops on real hardware.

NOTE: isolated jit timings OVERSTATE in-context costs on this machine
(jit-boundary arg-layout conversions dominate small ops); use
tools/bench_step_ablate.py for authoritative step attribution.  This tool
remains useful for comparing two lowerings of the SAME op (gather vs mxu
etc.).

Methodology (hard-won, see ARCHITECTURE.md "Performance methodology"):
* the tunnel breaks block_until_ready -> sync by fetching a scalar;
* host<->device copies run ~1 MB/s -> generate all data on device;
* EVERY eager op between jit calls costs seconds over the tunnel ->
  each stage is ONE jitted function carrying its own dependency
  injection (carry scalar folded into the input), chained N times with
  no eager glue, synced once.

Run: JAX_PLATFORMS= python tools/bench_components.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = 64
FRAME_HW = (720, 1280)
MASK_HW = (288, 512)
N = 20


def time_stage(label, fn, *const_args, carry0, sync, n=N, reps=2):
    """fn: jitted (carry, *const) -> carry.  One jit dispatch per iter."""
    t0 = time.perf_counter()
    c = fn(carry0, *const_args)
    _ = np.asarray(sync(c))
    print(f"[{label}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(sync(c))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = carry0
        for _ in range(n):
            c = fn(c, *const_args)
        _ = np.asarray(sync(c))
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    print(f"[{label}] {best*1e3:.2f} ms/call", flush=True)
    return best * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import models, ops, runtime

    @jax.jit
    def make_data(k):
        frames = (jax.random.uniform(k, (S, *FRAME_HW, 3)) * 255).astype(jnp.uint8)
        frames_f32 = frames.astype(jnp.float32) / 255.0
        small = ops.resize_bilinear(frames_f32, MASK_HW, method="asymmetric")
        alpha = jax.random.uniform(jax.random.fold_in(k, 1), (S, *MASK_HW))
        prior = ops.face_prior_mask(
            jnp.tile(jnp.asarray([400.0, 150.0, 800.0, 600.0]), (S, 1)),
            FRAME_HW,
            MASK_HW,
        )
        return frames, frames_f32, small, alpha, prior

    t0 = time.perf_counter()
    frames, frames_f32, small, alpha, prior = make_data(jax.random.PRNGKey(0))
    _ = np.asarray(alpha[0, 0, 0])
    print(f"[setup] data ready in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {}
    knobs = runtime.default_knobs(S)
    sync_scalar = jax.jit(lambda c: jnp.sum(c[0, :2, :2]))

    def dep(x, c):
        # fold a scalar of the carry into the input (forces serialization)
        return x + (0.0 * c.reshape(-1)[0].astype(jnp.float32)).astype(x.dtype)

    # ---- preprocess resize: gather vs mxu
    pre_g = jax.jit(
        lambda c, f: ops.resize_bilinear(
            dep(f.astype(jnp.float32) / 255.0, c), MASK_HW, method="asymmetric"
        )[..., 0]
    )
    results["resize_gather"] = time_stage(
        "resize_gather", pre_g, frames, carry0=alpha, sync=sync_scalar
    )
    pre_m = jax.jit(
        lambda c, f: ops.resize_bilinear_mxu(
            dep(f.astype(jnp.float32) / 255.0, c),
            MASK_HW,
            method="asymmetric",
            precision=jax.lax.Precision.DEFAULT,
        )[..., 0]
    )
    results["resize_mxu"] = time_stage(
        "resize_mxu", pre_m, frames, carry0=alpha, sync=sync_scalar
    )

    # ---- matte forward
    matte = models.MatteNet()
    mp = matte.init(jax.random.PRNGKey(0), jnp.zeros((1, *MASK_HW, 3)))
    mf = jax.jit(lambda c, x: matte.apply(mp, dep(x, c))["alpha"])
    results["matte_forward"] = time_stage(
        "matte_forward", mf, small, carry0=alpha, sync=sync_scalar
    )

    # ---- face subpath
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
    def facefn(c, f):
        pr, hp, au, hu, sc = _face_subpath(
            bundle, bundle.params, dep(f, c), st, statics, gate
        )
        return pr + 0.0 * au[0, 0]

    results["face_subpath"] = time_stage(
        "face_subpath", facefn, frames_f32, carry0=alpha, sync=sync_scalar
    )

    # ---- refinement chain XLA
    @jax.jit
    def refine_xla(c, a):
        a = dep(a, c)
        guide = small * 255.0
        a = ops.morphological_opening(a)
        a = ops.morphological_closing_in_prior(a, prior, jnp.ones((S,), bool))
        ab = ops.joint_bilateral3x3(a, guide, knobs.sigma_spatial, knobs.sigma_range)
        a = jnp.where(knobs.use_bilateral[:, None, None], ab, a)
        return ops.refine_alpha(
            a, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma, prior, True
        )

    results["refine_chain_xla"] = time_stage(
        "refine_chain_xla", refine_xla, alpha, carry0=alpha, sync=sync_scalar
    )

    # ---- refinement chain Pallas
    from video_stream_segmenetation_tpu.kernels.refine_fused import fused_refine

    @jax.jit
    def refine_pl(c, a):
        return fused_refine(
            dep(a, c), small * 255.0, prior,
            knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
            knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
            jnp.ones((S,), bool),
        )

    try:
        results["refine_chain_pallas"] = time_stage(
            "refine_chain_pallas", refine_pl, alpha, carry0=alpha, sync=sync_scalar
        )
    except Exception as e:
        print(f"[refine_chain_pallas] FAILED {type(e).__name__}: {e}", flush=True)
        results["refine_chain_pallas"] = f"FAILED: {type(e).__name__}"

    # ---- warp
    aff = jnp.tile(jnp.asarray([1.01, 0.02, 1.0, -0.02, 1.01, -0.5]), (S, 1))
    wf = jax.jit(lambda c, a: ops.warp_affine_nearest(dep(a, c), aff))
    results["warp"] = time_stage("warp", wf, alpha, carry0=alpha, sync=sync_scalar)

    # ---- composite: gather vs mxu upsample
    bg = jnp.zeros((1, 1, 1, 3), jnp.float32)
    sync_u8 = jax.jit(lambda c: jnp.sum(c[0, :2, :2, 0].astype(jnp.int32)))

    cg = jax.jit(
        lambda c, a: ops.alpha_composite(
            frames_f32, dep(a, c), background=jnp.broadcast_to(bg, frames_f32.shape),
            out_u8=True,
        )
    )
    results["composite_gather"] = time_stage(
        "composite_gather", cg, alpha, carry0=frames, sync=sync_u8,
    )

    @jax.jit
    def cm(c, a):
        a_full = jnp.clip(
            ops.resize_bilinear_mxu(
                dep(a, c), FRAME_HW, method="half_pixel", channel_last=False,
            ),
            0.0, 1.0,
        )
        return ops.alpha_composite(
            frames_f32, a_full, background=jnp.broadcast_to(bg, frames_f32.shape),
            out_u8=True,
        )

    results["composite_mxu"] = time_stage(
        "composite_mxu", cm, alpha, carry0=frames, sync=sync_u8,
    )

    print(json.dumps({k: (round(v, 2) if not isinstance(v, str) else v) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
