"""Ablate the in-graph rollout harness terms on the real chip.

The rollout (runtime/rollout.py) is the transport-immune number of
record, but it adds harness work the production step doesn't pay: the
per-iteration frame XOR (anti-hoisting) and the output accumulate
(anti-DCE).  This tool times the variants IN ONE PROCESS (within-run
deltas are the only trustworthy ones on this tunnel, CLAUDE.md):

  step S=64/S=96:  acc buffer/reduce x perturb on/off
  round [96]*4:    acc buffer/reduce, donated carry

perturb=off rows are NOT valid step times (XLA may hoist the
loop-invariant forward); their delta vs perturb=on prices the XOR term.

Run: JAX_PLATFORMS= python tools/bench_rollout_ablate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench  # repo-root bench.py: reuse the machine tag

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
    make_round_rollout,
    make_step_rollout,
)
from video_stream_segmenetation_tpu.service.engine import Engine  # noqa: E402

statics = preset("fast_int8_pico")
key = jax.random.PRNGKey(0)


def make_frames(s):
    return jax.jit(
        lambda k: ops.space_to_depth(
            (jax.random.uniform(k, (s, *statics.frame_hw, 3)) * 255)
            .astype(jnp.uint8),
            statics.s2d_block,
        )
    )(key)


_syncs = {}


def sync(x):
    k = (x.shape, str(x.dtype))
    if k not in _syncs:
        _syncs[k] = jax.jit(
            lambda v: v.reshape(-1)[:4].astype(jnp.float32).sum()
        )
    return float(np.asarray(_syncs[k](x)))


def slope(fn, args, n1, n2, reps=5):
    """Per-iteration time from the MIN-statistic slope between two
    chain lengths.  The per-dispatch overhead on this transport is large
    AND jittery (~150 ms +/- tens); the min over interleaved reps
    estimates the constant floor at each n, and the slope cancels it.
    The n-spread must be large enough that residual floor jitter
    divided by (n2-n1) is small."""
    def once(n):
        t0 = time.perf_counter()
        outs = fn(*args, n)
        sync(outs[1])
        return (time.perf_counter() - t0) * 1e3

    fn(*args, 2)  # warmup/compile
    sync(fn(*args, 2)[1])
    ta, tb = [], []
    for _ in range(reps):  # interleave to decorrelate drift
        ta.append(once(n1))
        tb.append(once(n2))
    return (min(tb) - min(ta)) / (n2 - n1)


def main():
    out = {}

    for S, n1, n2 in ((64, 4, 64), (96, 4, 64)):
        eng = Engine(num_streams=S, statics=statics, donate_state=False)
        eng.admit_all()
        fr = make_frames(S)
        gate = jnp.ones((S,), bool)
        args = (eng.bundle.params, eng.state, fr, eng.backgrounds,
                eng.knobs, gate)
        for accm, pert in (
            ("buffer", "weights"), ("reduce", "weights"),
        ):
            roll = jax.jit(make_step_rollout(
                eng.bundle, eng.statics, acc_mode=accm, perturb=pert,
            ))
            ms = slope(roll, args, n1, n2)
            tag = f"step{S}_{accm}_{pert or 'none'}"
            out[tag] = round(ms, 3)
            print(json.dumps({tag: out[tag]}), flush=True)
        del eng, args

    gs = [96] * 4
    eng = Engine(num_streams=sum(gs), statics=statics, donate_state=False)
    eng.admit_all()
    gframes = [make_frames(g) for g in gs]
    face_last = jnp.full((sum(gs),), -1e9, jnp.float32)
    now0 = jnp.asarray(0.0, jnp.float32)
    mi = jnp.asarray(float(getattr(eng, "face_min_interval_s", 0.0)),
                     jnp.float32)

    def round_args():
        return (eng.bundle.params, eng.state, gframes, eng.backgrounds,
                eng.knobs, face_last, now0, mi)

    for accm, pert in (
        ("buffer", "weights"), ("reduce", "weights"),
    ):
        rr = make_round_rollout(
            eng.bundle, eng.statics, gs, acc_mode=accm, perturb=pert,
        )

        def call(*a):
            st, fl, accs = rr_j(*a)
            return st, accs[0][0]

        rr_j = jax.jit(rr)
        ms = slope(call, round_args(), 2, 14)
        tag = f"round4x96_{accm}_{pert or 'none'}"
        out[tag] = round(ms, 3)
        print(json.dumps({tag: out[tag]}), flush=True)

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
