"""Variant-model training pieces (tools/train_variants.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu.train.face import synthetic_face_batch

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from train_variants import _class_simplex  # noqa: E402


def test_class_simplex_partitions():
    """The 4 class maps must form a proper simplex that reconstructs the
    scene: bg + body + head + features = 1 everywhere."""
    frames, box, lm, parts = synthetic_face_batch(
        jax.random.PRNGKey(0), 2, (96, 160), return_parts=True
    )
    cls = np.asarray(_class_simplex(parts))
    assert cls.shape == (2, 96, 160, 4)
    np.testing.assert_allclose(cls.sum(-1), 1.0, atol=1e-5)
    assert (cls >= 0).all()
    # the head class peaks inside the head box
    b = np.asarray(box[0]).astype(int)
    cy, cx = (b[1] + b[3]) // 2, (b[0] + b[2]) // 2
    assert cls[0, cy, cx, 2] + cls[0, cy, cx, 3] > 0.5


def test_rvm_unrolled_loss_runs():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from train_variants import train_rvm

    # 2 steps at tiny geometry: loss must be finite and training must run
    params = train_rvm(steps=2, hw=(48, 80), batch=2, unroll=2)
    assert params is not None
