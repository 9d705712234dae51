"""MatteNetHD: 720p-native flagship contract + native-mode pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, runtime

# tiny geometry with the same /5 stem relationship as 720p->288x512
FRAME_HW = (80, 160)
MASK_HW = (32, 64)


@pytest.fixture(scope="module")
def hd():
    model = models.MatteNetHD(width=0.5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    return model, params


def test_hd_contract_u8_and_f32(hd, rng):
    model, params = hd
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    out = jax.jit(model.apply)(params, u8)
    assert out["alpha"].shape == (2, *MASK_HW)
    a = np.asarray(out["alpha"])
    assert a.min() >= 0 and a.max() <= 1
    # float input path too
    out2 = model.apply(params, u8.astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(out2["alpha"]), a, atol=2e-2)


def test_hd_aux_outputs(hd):
    model, params = hd
    out = model.apply(params, jnp.zeros((1, *FRAME_HW, 3)))
    assert out["semantic"].shape[0] == 1
    assert out["detail"].shape[0] == 1


def test_hd_720p_geometry():
    """Stem geometry: 720x1280/5 = 144x256, x2 = 288x512 (mask contract)."""
    model = models.MatteNetHD(width=0.25)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 720, 1280, 3)))
    )
    out = jax.eval_shape(
        model.apply, params, jnp.zeros((1, 720, 1280, 3), jnp.uint8)
    )
    assert out["alpha"].shape == (1, 288, 512)


def test_native_pipeline_step(rng):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
        matting_input="native", guide_impl="nearest_u8",
    )
    model = models.MatteNetHD(width=0.5)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    bundle = runtime.ModelBundle(model, mp)
    step = jax.jit(runtime.make_step(bundle, statics))
    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    state = runtime.init_state(2, MASK_HW)
    knobs = runtime.default_knobs(2)
    new_state, out = step(
        bundle.params, state, frames, jnp.zeros((2, *FRAME_HW, 3)), knobs,
        jnp.zeros((2,), bool),
    )
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    assert out["alpha"].shape == (2, *MASK_HW)
    assert np.isfinite(np.asarray(out["alpha"])).all()


def test_native_engine_geometry_validation():
    from video_stream_segmenetation_tpu.service import Engine

    statics = runtime.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), matting_input="native",
    )
    with pytest.raises(ValueError, match="native matting"):
        Engine(num_streams=1, statics=statics)


def test_registry_hd_entry():
    spec = models.get_spec("mattenet_hd")
    assert spec.input_hw == (720, 1280)
