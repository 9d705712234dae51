"""Multi-device sharding (8 virtual CPU devices), training step, entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_stream_segmenetation_tpu import models, parallel, train


def test_mesh_and_shardings():
    mesh = parallel.make_mesh()
    assert mesh.shape[parallel.DATA_AXIS] == 8
    x = jnp.zeros((16, 4, 4))
    xs = parallel.shard_stream_tree(mesh, {"a": x})["a"]
    assert xs.sharding.spec == P(parallel.DATA_AXIS, None, None)
    p = parallel.replicate_tree(mesh, {"w": jnp.ones((3, 3))})["w"]
    assert p.sharding.spec == P()


def test_train_step_dp_8dev():
    """Full dp training step over the 8-device mesh; loss decreases."""
    mesh = parallel.make_mesh()
    model = models.MatteNet(width=0.5)
    HW = (32, 64)
    S = 8
    state, tx = train.init_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((S, *HW, 3))
    )
    state = parallel.replicate_tree(mesh, state)
    step = jax.jit(train.make_train_step(model, tx))

    key = jax.random.PRNGKey(1)
    frames = jax.device_put(
        jax.random.uniform(key, (S, *HW, 3)),
        NamedSharding(mesh, P(parallel.DATA_AXIS, None, None, None)),
    )
    gt = jax.device_put(
        (jax.random.uniform(key, (S, *HW)) > 0.5).astype(jnp.float32),
        NamedSharding(mesh, P(parallel.DATA_AXIS, None, None)),
    )
    losses = []
    for _ in range(4):
        state, metrics = step(state, frames, gt)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizer makes progress
    assert int(state.step) == 4


def test_sharded_serving_matches_single_device(rng):
    """The stream-sharded step must be numerically identical to the
    unsharded one (streams are independent; no cross-device math)."""
    from video_stream_segmenetation_tpu import runtime

    mesh = parallel.make_mesh()
    S = 8
    MASK_HW = (32, 64)
    FRAME_HW = (64, 128)
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    model = models.MatteNet(width=0.5)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *MASK_HW, 3)))
    bundle = runtime.ModelBundle(model, mp)
    step = jax.jit(runtime.make_step(bundle, statics))

    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.zeros((S, *FRAME_HW, 3))
    knobs = runtime.default_knobs(S)
    state = runtime.init_state(S, MASK_HW)
    gate = jnp.zeros((S,), bool)

    _, out_plain = step(bundle.params, state, frames, bg, knobs, gate)

    sharded = parallel.sharded_step(mesh, runtime.make_step(bundle, statics), donate_state=False)
    sh = lambda t: parallel.shard_stream_tree(mesh, t)
    _, out_sharded = sharded(
        parallel.replicate_tree(mesh, bundle.params),
        sh(state), sh(frames), sh(bg), sh(knobs), sh(gate),
    )
    # The two programs are separately compiled (different device layouts),
    # so XLA fusion/rounding may differ by 1 ulp in float alpha -> at most
    # one u8 step after quantization.
    a = np.asarray(out_plain["frame"]).astype(np.int16)
    b = np.asarray(out_sharded["frame"]).astype(np.int16)
    assert np.abs(a - b).max() <= 1
    assert (a != b).mean() < 0.001  # and only a handful of pixels


def test_iou_metric():
    a = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    b = jnp.zeros((1, 8, 8)).at[:, 2:6].set(1.0)
    iou = float(train.iou_metric(a, b)[0])
    assert abs(iou - (2 / 6)) < 1e-6
    assert float(train.iou_metric(a, a)[0]) == 1.0


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, (params, frames) = ge.entry()
    out = jax.jit(fn)(params, frames)
    assert out.shape == (frames.shape[0], 288, 512)
    assert bool(jnp.isfinite(out).all())


def test_engine_mesh_serving_matches_single_device(rng):
    """Engine(mesh=...) -- multi-host serving as literally a config
    change (parallel/mesh.py): the SAME Engine API serves with every
    per-stream array sharded over the mesh 'data' axis.  process() and
    the pipelined dispatch/collect path must match a mesh-less engine,
    admission/knob staging included."""
    from video_stream_segmenetation_tpu import runtime
    from video_stream_segmenetation_tpu.service import Engine

    mesh = parallel.make_mesh()
    S = 8
    statics = runtime.PipelineStatics(
        frame_hw=(64, 128), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    frames = [
        (rng.random((S, 64, 128, 3)) * 255).astype(np.uint8)
        for _ in range(3)
    ]

    def run(mesh_arg):
        eng = Engine(num_streams=S, statics=statics, rng_seed=0,
                     donate_state=False, mesh=mesh_arg)
        for _ in range(S):
            eng.admit()
        eng.set_knobs(3, ema=0.5)  # staged-knob path under sharding
        outs = [np.asarray(eng.process(f)["frame"]) for f in frames]
        # pipelined path too
        tok = eng.dispatch(frames[0])
        outs.append(np.asarray(eng.collect(tok)["frame"]))
        return eng, outs

    eng_m, outs_m = run(mesh)
    eng_1, outs_1 = run(None)

    # the sharded engine really spans the mesh
    assert len(eng_m.state.prev_alpha.sharding.device_set) == 8
    assert eng_m.state.prev_alpha.sharding.spec[0] == parallel.DATA_AXIS
    for a, b in zip(outs_m, outs_1):
        # separately compiled programs: tolerate 1 ulp -> one u8 step
        assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_engine_mesh_requires_divisible_streams():
    from video_stream_segmenetation_tpu import runtime
    from video_stream_segmenetation_tpu.service import Engine

    mesh = parallel.make_mesh()
    statics = runtime.PipelineStatics(
        frame_hw=(64, 128), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    with pytest.raises(ValueError):
        Engine(num_streams=9, statics=statics, mesh=mesh)
