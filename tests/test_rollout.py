"""In-graph rollout harness: n iterated steps/rounds == n sequential
dispatches of the same production programs (runtime/rollout.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.runtime.rollout import (
    _perturb,
    make_round_rollout,
    make_step_rollout,
)
from video_stream_segmenetation_tpu.service.engine import Engine

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture()
def eng():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    e = Engine(num_streams=4, statics=statics, donate_state=False)
    for _ in range(4):
        e.admit()
    return e


def _tree_close(a, b, tol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=tol
        )


def test_step_rollout_matches_sequential(eng, rng):
    frames = jnp.asarray(
        (rng.random((4, *FRAME_HW, 3)) * 255).astype(np.uint8)
    )
    gate = jnp.ones((4,), bool)
    n = 4

    roll = jax.jit(make_step_rollout(eng.bundle, eng.statics))
    st_r, acc_f, acc_a = roll(
        eng.bundle.params, eng.state, frames, eng.backgrounds, eng.knobs,
        gate, n,
    )

    step = jax.jit(runtime.make_step(eng.bundle, eng.statics))
    st = eng.state
    exp_f = exp_a = None
    for i in range(n):
        fr = frames if i == 0 else _perturb(frames, jnp.asarray(i))
        st, out = step(
            eng.bundle.params, st, fr, eng.backgrounds, eng.knobs, gate
        )
        if exp_f is None:
            exp_f, exp_a = out["frame"], out["alpha"]
        else:
            exp_f, exp_a = exp_f + out["frame"], exp_a + out["alpha"]

    _tree_close(st_r, st, tol=1e-5)
    # u8 composite values may flip by 1 at rounding boundaries (the loop
    # body fuses differently from the standalone step); +-1 per
    # accumulated frame modulo the u8 wraparound, exact otherwise
    d = (np.asarray(acc_f, np.int32) - np.asarray(exp_f, np.int32)) % 256
    assert int(np.minimum(d, 256 - d).max()) <= n
    np.testing.assert_allclose(
        np.asarray(acc_a), np.asarray(exp_a), atol=1e-5
    )


def test_round_rollout_matches_sequential_range_steps(eng, rng):
    group_sizes = [3, 1]
    frames_list = [
        jnp.asarray((rng.random((g, *FRAME_HW, 3)) * 255).astype(np.uint8))
        for g in group_sizes
    ]
    face_last = jnp.full((4,), -1e9, jnp.float32)
    now0 = jnp.asarray(5.0, jnp.float32)
    min_int = jnp.asarray(0.1, jnp.float32)
    dt = 1.0 / 30.0
    n = 3

    roll = jax.jit(
        make_round_rollout(eng.bundle, eng.statics, group_sizes, tick_dt=dt)
    )
    st_r, last_r, accs = roll(
        eng.bundle.params, eng.state, frames_list, eng.backgrounds,
        eng.knobs, face_last, now0, min_int, n,
    )

    rstep = jax.jit(
        runtime.make_range_step(eng.bundle, eng.statics),
        static_argnames=("gs",),
    )
    st, last = eng.state, face_last
    offs = [0, 3]
    exp = [None, None]
    for i in range(n):
        now = now0 + i * jnp.asarray(dt, jnp.float32)
        for g, gs in enumerate(group_sizes):
            fr = (
                frames_list[g]
                if i == 0
                else _perturb(frames_list[g], jnp.asarray(i))
            )
            st, last, out = rstep(
                eng.bundle.params, st, offs[g], fr, eng.backgrounds,
                eng.knobs, last, now, min_int, gs=gs,
            )
            if exp[g] is None:
                exp[g] = (out["frame"], out["alpha"])
            else:
                exp[g] = (
                    exp[g][0] + out["frame"], exp[g][1] + out["alpha"]
                )

    _tree_close(st_r, st, tol=1e-5)
    _tree_close(last_r, last, tol=1e-6)
    for g in range(len(group_sizes)):
        d = (
            np.asarray(accs[g][0], np.int32)
            - np.asarray(exp[g][0], np.int32)
        ) % 256
        assert int(np.minimum(d, 256 - d).max()) <= n
        np.testing.assert_allclose(
            np.asarray(accs[g][1]), np.asarray(exp[g][1]), atol=1e-5
        )
