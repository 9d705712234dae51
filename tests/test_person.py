"""Articulated person generator (train/person.py) invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu.train import person

HW = (60, 80)


def test_render_shapes_and_ranges():
    k = jax.random.PRNGKey(0)
    ident = person.sample_identity(k, 3)
    pose = person.sample_pose(jax.random.fold_in(k, 1), 3, HW)
    r = person.render(ident, pose, HW, features=True)
    a = np.asarray(r["alpha"])
    rgb = np.asarray(r["rgb"])
    assert a.shape == (3, *HW) and rgb.shape == (3, *HW, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert rgb.min() >= -1e-6 and rgb.max() <= 1.0 + 1e-6
    # a person exists and does not fill the frame
    cover = a.mean(axis=(1, 2))
    assert (cover > 0.05).all() and (cover < 0.95).all()
    # head box inside the frame-ish and ordered
    hb = np.asarray(r["head_box"])
    assert (hb[:, 2] > hb[:, 0]).all() and (hb[:, 3] > hb[:, 1]).all()


def test_occluder_cuts_ground_truth():
    k = jax.random.PRNGKey(2)
    bg = jnp.full((4, *HW, 3), 0.5)
    frame, gt, _ = person.person_scene(k, 4, HW, bg, occluder_p=1.0)
    frame0, gt0, _ = person.person_scene(k, 4, HW, bg, occluder_p=0.0)
    # same key => same person; the occluder can only REMOVE gt mass
    assert float(np.asarray(gt).sum()) <= float(np.asarray(gt0).sum()) + 1e-3
    assert frame.shape == (4, *HW, 3)


def test_raised_arm_mixture_present():
    """~25% of arms sample the raised range (the wave-clip coverage the
    round-4 quality loop added)."""
    k = jax.random.PRNGKey(3)
    pose = person.sample_pose(k, 512, HW)
    frac_raised = float((np.asarray(pose["armR_u"]) > 1.0).mean())
    assert 0.10 < frac_raised < 0.45


def test_clip_generator_temporal_coherence():
    from video_stream_segmenetation_tpu.utils.clips import articulated_clip

    c = articulated_clip(4, HW, seed=0, features=True, occluder_p=1.0)
    assert c.frames.shape == (4, *HW, 3) and c.alpha.shape == (4, *HW)
    assert c.head_box is not None and c.head_box.shape == (4, 4)
    # consecutive frames move a little, not a lot
    d = np.abs(
        c.alpha[1:].astype(np.float32) - c.alpha[:-1].astype(np.float32)
    ).mean(axis=(1, 2))
    assert (d < 0.15).all()
    assert c.alpha.max() > 0.5
