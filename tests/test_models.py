"""Model zoo: shape contracts, jit-ability, determinism, state threading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models

# Small geometry for CPU tests; all nets are size-polymorphic at trace time.
HW = (96, 160)


@pytest.fixture(scope="module")
def mattenet():
    model = models.MatteNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)))
    return model, params


def test_mattenet_contract(mattenet):
    model, params = mattenet
    x = jnp.asarray(np.random.default_rng(0).random((2, *HW, 3), dtype=np.float32))
    out = jax.jit(model.apply)(params, x)
    assert out["alpha"].shape == (2, *HW)
    a = np.asarray(out["alpha"])
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert out["semantic"].shape == (2, HW[0] // 16, HW[1] // 16)
    assert out["detail"].shape == (2, HW[0] // 4, HW[1] // 4)


def test_mattenet_deterministic(mattenet):
    model, params = mattenet
    x = jnp.ones((1, *HW, 3)) * 0.5
    a1 = np.asarray(model.apply(params, x)["alpha"])
    a2 = np.asarray(model.apply(params, x)["alpha"])
    np.testing.assert_array_equal(a1, a2)


def test_mattenet_multiclass():
    model = models.MatteNet(num_classes=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)))
    out = model.apply(params, jnp.zeros((1, *HW, 3)))
    assert out["alpha"].shape == (1, *HW, 4)
    np.testing.assert_allclose(np.asarray(out["alpha"]).sum(-1), 1.0, atol=1e-3)


def test_facefinder_contract():
    model = models.FaceFinder()
    x = jnp.zeros((2, 256, 256, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = jax.jit(model.apply)(params, x)
    assert out["box_coords"].shape == (2, 896, 16)
    assert out["box_scores"].shape == (2, 896)
    s = np.asarray(out["box_scores"])
    assert (s >= 0).all() and (s <= 1).all()


def test_facefinder_feeds_best_box_decode():
    from video_stream_segmenetation_tpu import ops

    model = models.FaceFinder()
    x = jnp.zeros((1, 256, 256, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    box, score, valid = ops.best_box_decode(
        out["box_coords"][0], out["box_scores"][0], (720, 1280)
    )
    assert box.shape == (4,) and score.shape == () and valid.shape == ()


def test_landmarknet_contract():
    model = models.LandmarkNet()
    x = jnp.zeros((3, 192, 192, 3))
    params = model.init(jax.random.PRNGKey(2), x)
    out = jax.jit(model.apply)(params, x)
    assert out["landmarks"].shape == (3, 468, 3)
    assert out["scores"].shape == (3,)
    lm = np.asarray(out["landmarks"])
    assert (lm[..., :2] >= 0).all() and (lm[..., :2] <= 1).all()


def test_recurrent_mattenet_threads_state():
    model = models.RecurrentMatteNet()
    state0 = models.init_state(1, HW)
    x = jnp.asarray(np.random.default_rng(5).random((1, *HW, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(3), x, state0)
    out1 = jax.jit(model.apply)(params, x, state0)
    assert out1["alpha"].shape == (1, *HW)
    state1 = out1["state"]
    # same pytree structure, state must actually change from zero init
    assert jax.tree_util.tree_structure(state1) == jax.tree_util.tree_structure(state0)
    changed = any(
        float(jnp.abs(a).max()) > 0 for a in jax.tree_util.tree_leaves(state1)
    )
    assert changed
    out2 = model.apply(params, x, state1)
    # recurrence: same input, different state -> different alpha
    assert not np.allclose(np.asarray(out1["alpha"]), np.asarray(out2["alpha"]))


def test_recurrent_state_shapes_match_reference_contract():
    # channel plan 16/20/40/64 (frameProcessorRVM.ts:16-19)
    st = models.init_state(2, (288, 512), 0.25)
    assert st.r1.shape == (2, 36, 64, 16)
    assert st.r2.shape == (2, 18, 32, 20)
    assert st.r3.shape == (2, 9, 16, 40)
    assert st.r4.shape == (2, 5, 8, 64)


def test_saliencynet_contract():
    model = models.SaliencyNet()
    x = jnp.zeros((1, 96, 96, 3))
    params = model.init(jax.random.PRNGKey(4), x)
    out = model.apply(params, x)
    assert out["alpha"].shape == (1, 96, 96)
    assert len(out["side"]) == 4


def test_registry_builds_all():
    for name in models.list_models():
        spec = models.get_spec(name)
        assert spec.input_hw[0] > 0
    with pytest.raises(KeyError):
        models.get_spec("nope")


def test_registry_init_params_smoke():
    model, params = models.get_spec("landmarknet").init_params(batch=1)
    out = model.apply(params, jnp.zeros((1, 192, 192, 3)))
    assert out["landmarks"].shape == (1, 468, 3)
