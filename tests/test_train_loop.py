"""Training loop: synthetic data generator + fit() improves IoU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, train


def test_synthetic_batch_on_device():
    frames, alpha = train.synthetic_matting_batch(
        jax.random.PRNGKey(0), 4, (32, 64)
    )
    assert frames.shape == (4, 32, 64, 3)
    assert alpha.shape == (4, 32, 64)
    assert float(frames.min()) >= 0 and float(frames.max()) <= 1
    a = np.asarray(alpha)
    assert (a > 0.9).any() and (a < 0.1).any()  # fg and bg present
    # different keys -> different scenes
    f2, _ = train.synthetic_matting_batch(jax.random.PRNGKey(1), 4, (32, 64))
    assert not np.allclose(np.asarray(frames), np.asarray(f2))


def test_fit_improves_iou():
    model = models.MatteNet(width=0.5)
    params, history = train.fit(
        model, hw=(32, 64), batch=8, steps=40, lr=2e-3, log_every=10
    )
    first, last = history[0], history[-1]
    assert last["loss"] < first["loss"]
    assert last["iou"] >= first["iou"]
    # trained model beats chance on a fresh batch
    frames, gt = train.synthetic_matting_batch(jax.random.PRNGKey(99), 4, (32, 64))
    out = model.apply(params, frames)
    iou = float(train.iou_metric(out["alpha"], gt).mean())
    assert iou > 0.3


def test_real_bg_data_fn_shapes():
    """Real-photo data_fn (train/realdata.py): shapes/ranges; skipped
    when the reference checkout's photos are absent."""
    import jax

    from video_stream_segmenetation_tpu.train import realdata

    try:
        bank = realdata.load_background_bank((24, 32), max_images=2)
    except FileNotFoundError:
        pytest.skip("no real background photos available")
    fn = realdata.make_real_bg_data_fn(bank)
    frames, alpha = fn(jax.random.PRNGKey(0), 3, (24, 32))
    assert frames.shape == (3, 24, 32, 3)
    assert alpha.shape == (3, 24, 32)
    f = np.asarray(frames)
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert 0.0 < float(np.asarray(alpha).mean()) < 1.0
    # a second key gives different backgrounds (augmentation is live)
    frames2, _ = fn(jax.random.PRNGKey(1), 3, (24, 32))
    assert np.abs(np.asarray(frames2) - f).max() > 0.05


def test_real_bg_uint8_bank_and_mixed_fn():
    """u8 bank (4x-smaller tunnel upload) converts to unit floats after
    the crop, and the mixed data_fn concatenates both distributions
    (tools/train_flagship_realbg.py path)."""
    import jax

    from video_stream_segmenetation_tpu.train import realdata

    try:
        bank8 = realdata.load_background_bank(
            (24, 32), max_images=2, oversample=1.5, as_uint8=True
        )
    except FileNotFoundError:
        pytest.skip("no real background photos available")
    assert bank8.dtype == np.uint8 and bank8.shape[1:3] == (36, 48)
    fn = realdata.make_real_bg_data_fn(bank8)
    frames, alpha = fn(jax.random.PRNGKey(0), 3, (24, 32))
    f = np.asarray(frames)
    assert f.dtype == np.float32 and f.min() >= 0.0 and f.max() <= 1.0

    mixed = realdata.make_mixed_data_fn(fn, real_frac=0.5)
    frames, alpha = mixed(jax.random.PRNGKey(0), 4, (24, 32))
    assert frames.shape == (4, 24, 32, 3) and alpha.shape == (4, 24, 32)
    # real_frac is clamped so both halves are always represented
    mixed_all = realdata.make_mixed_data_fn(fn, real_frac=1.0)
    frames, _ = mixed_all(jax.random.PRNGKey(0), 2, (24, 32))
    assert frames.shape[0] == 2


def test_fit_steps_per_call_chunked():
    """steps_per_call rolls (data_fn -> step) into one dispatch via
    fori_loop; training must still converge and log per chunk."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.train.loop import fit

    model = models.MatteNet(width=0.25)
    params, history = fit(
        model, hw=(32, 64), batch=4, steps=8, lr=1e-3, steps_per_call=4,
    )
    assert len(history) == 2
    assert all(jnp.isfinite(h["loss"]) for h in history)
    assert all(0.0 <= h["iou"] <= 1.0 for h in history)


def test_pipeline_loss_trains():
    """make_pipeline_loss backprops through the serving refine chain."""
    import jax
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.train.loop import fit
    from video_stream_segmenetation_tpu.train.losses import make_pipeline_loss

    model = models.MatteNet(width=0.25)
    params, history = fit(
        model, hw=(32, 64), batch=2, steps=2, lr=1e-3,
        loss_fn=make_pipeline_loss(model),
    )
    assert all(jnp.isfinite(h["loss"]) for h in history)
