"""Checkpoint manager crash-resume semantics (ref train_joint.py:352-376,
426-461: ckpt_latest/ckpt_best + meta_log_info.json epoch arithmetic)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rga3_tpu.train.checkpoints import CheckpointManager


def make_state(step):
    return {
        "params": {"w": jnp.full((4, 4), float(step)),
                   "b": jnp.arange(4, dtype=jnp.float32) + step},
        "step": jnp.asarray(step, jnp.int32),
    }


def test_crash_resume_restores_latest_and_epoch(tmp_path):
    ck = CheckpointManager(str(tmp_path / "ckpt"))
    assert ck.resume_epoch() == 0
    ck.save_epoch(make_state(100), epoch=0, metric=0.3)
    ck.save_epoch(make_state(200), epoch=1, metric=0.5)
    # "crash": a fresh process = a fresh manager over the same dir
    ck2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert ck2.resume_epoch() == 2
    restored = ck2.restore("latest", make_state(0))
    assert int(restored["step"]) == 200
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.full((4, 4), 200.0)
    )


def test_best_tracking_and_regression(tmp_path):
    ck = CheckpointManager(str(tmp_path / "ckpt"))
    assert ck.save_epoch(make_state(1), epoch=0, metric=0.4) is True
    assert ck.save_epoch(make_state(2), epoch=1, metric=0.2) is False
    assert ck.save_epoch(make_state(3), epoch=2, metric=0.7) is True
    meta = ck.read_meta()
    assert meta["best_epoch"] == 2 and meta["best_metric"] == 0.7
    assert [h["epoch"] for h in meta["history"]] == [0, 1, 2]
    best = ck.restore("best", make_state(0))
    assert int(best["step"]) == 3
    # latest keeps the last epoch even when it wasn't best
    ck.save_epoch(make_state(4), epoch=3, metric=0.1)
    assert int(ck.restore("latest", make_state(0))["step"]) == 4
    assert int(ck.restore("best", make_state(0))["step"]) == 3


def test_lower_is_better_mode(tmp_path):
    ck = CheckpointManager(str(tmp_path / "ckpt"))
    assert ck.save_epoch(
        make_state(1), epoch=0, metric=1.0, higher_is_better=False
    )
    assert not ck.save_epoch(
        make_state(2), epoch=1, metric=2.0, higher_is_better=False
    )
    assert ck.save_epoch(
        make_state(3), epoch=2, metric=0.5, higher_is_better=False
    )


def test_interrupted_meta_is_survivable(tmp_path):
    """A crash between ckpt write and meta write: latest exists, meta has
    no last_epoch — resume must fall back to epoch 0, not crash."""
    ck = CheckpointManager(str(tmp_path / "ckpt"))
    ck.save("latest", make_state(7))
    assert ck.resume_epoch() == 0
    restored = ck.restore("latest", make_state(0))
    assert int(restored["step"]) == 7
