"""Face-subpath cost ablation at S=64 (VERDICT r3 #4): the fd/lmk-128
geometry vs the default 256/192, and the no_face floor — in-context,
interleaved rollout slopes (the only trustworthy comparison on this
drifting device; CLAUDE.md).

The face models' WEIGHTS don't affect step cost (no data-dependent
control flow in-graph), so the engines run their default-initialized
face params at each geometry; quality at 128 is pinned separately by
tools/train_face.py's eval (det box IoU / lmk px err printed at save).

Run: JAX_PLATFORMS= python tools/bench_face_ablate.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench

import jax

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_tpu_{_bench._machine_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_stream_segmenetation_tpu import ops  # noqa: E402
from video_stream_segmenetation_tpu.runtime.presets import preset  # noqa: E402
from video_stream_segmenetation_tpu.runtime.rollout import (  # noqa: E402
    make_step_rollout,
)
from video_stream_segmenetation_tpu.service.engine import Engine  # noqa: E402

S = 64
key = jax.random.PRNGKey(0)
_syncs = {}


def sync(x):
    k = (x.shape, str(x.dtype))
    if k not in _syncs:
        _syncs[k] = jax.jit(
            lambda v: v.reshape(-1)[:4].astype(jnp.float32).sum()
        )
    return float(np.asarray(_syncs[k](x)))


def build(name, **ov):
    statics = dataclasses.replace(preset("fast_int8_pico"), **ov)
    eng = Engine(num_streams=S, statics=statics, donate_state=False)
    eng.admit_all()
    fr = jax.jit(
        lambda k: ops.space_to_depth(
            (jax.random.uniform(k, (S, *statics.frame_hw, 3)) * 255)
            .astype(jnp.uint8),
            statics.s2d_block,
        )
    )(key)
    roll = jax.jit(make_step_rollout(
        eng.bundle, eng.statics, acc_mode="reduce", perturb="weights",
    ))
    args = (eng.bundle.params, eng.state, fr, eng.backgrounds, eng.knobs,
            jnp.ones((S,), bool))
    return name, roll, args


def main():
    # each variant costs a multi-minute HTTP compile on this transport;
    # VST_FACE_SET selects a subset ('lmk' = the landmark-side study,
    # VERDICT r4 #2 — cost is weight-independent, so shrink candidates
    # are priced before any retrain)
    all_variants = {
        "fd256_lmk192": dict(),
        "fd128_lmk128": dict(fd_size=128, lmk_size=128),
        "fd128_fd_only": dict(fd_size=128, lmk_size=128,
                              debug_stage="fd_only"),
        "fd128_ingest_only": dict(fd_size=128, lmk_size=128,
                                  debug_stage="fd_only,fd_stub"),
        "fd128_no_lmk": dict(fd_size=128, lmk_size=128,
                             debug_stage="no_lmk"),
        "fd128_lmk96": dict(fd_size=128, lmk_size=96),
        "fd128_lmk64": dict(fd_size=128, lmk_size=64),
        # the reference's real MediaPipe face graphs at their native
        # 256/192 geometry (preset fast_int8_pico_refface)
        "refface": dict(fd_size=256, lmk_size=192,
                        face_models="reference"),
        "no_face": dict(face_path=False),
    }
    sets = {
        "full": list(all_variants),
        "lmk": ["fd128_lmk128", "fd128_no_lmk", "fd128_lmk96", "no_face"],
        "refface": ["fd128_lmk128", "refface", "no_face"],
    }
    names = sets[os.environ.get("VST_FACE_SET", "full")]
    variants = [build(n, **all_variants[n]) for n in names]
    n1, n2 = 8, 128

    def once(roll, args, n):
        t0 = time.perf_counter()
        outs = roll(*args, n)
        sync(outs[1])
        return (time.perf_counter() - t0) * 1e3

    for _, roll, args in variants:  # warmup / compile
        sync(roll(*args, 2)[1])
    import random

    rng = random.Random(0)
    slopes = {v[0]: [] for v in variants}
    for rep in range(7):
        order = variants[:]
        rng.shuffle(order)
        for name, roll, args in order:
            # PAIRED slope: n1 and n2 back-to-back share one drift
            # window, so clock/tenancy drift cancels within the pair
            t1 = once(roll, args, n1)
            t2 = once(roll, args, n2)
            slopes[name].append((t2 - t1) / (n2 - n1))
        print(json.dumps({f"rep{rep}": {
            n: round(s_[-1], 2) for n, s_ in slopes.items()
        }}), flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    res = {name: round(med(slopes[name]), 3) for name, _, _ in variants}
    def delta(out, a, b):
        if a in res and b in res:
            res[out] = round(res[a] - res[b], 3)

    delta("delta_fd256_vs_noface_ms", "fd256_lmk192", "no_face")
    delta("delta_fd128_vs_noface_ms", "fd128_lmk128", "no_face")
    delta("lmk_side_ms", "fd128_lmk128", "fd128_no_lmk")
    delta("delta_lmk96_vs_noface_ms", "fd128_lmk96", "no_face")
    delta("delta_lmk64_vs_noface_ms", "fd128_lmk64", "no_face")
    delta("delta_refface_vs_noface_ms", "refface", "no_face")
    delta("delta_refface_vs_fd128_ms", "refface", "fd128_lmk128")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
