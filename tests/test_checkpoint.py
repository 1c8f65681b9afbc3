import jax.numpy as jnp
import numpy as np

from facedet_tpu.train.checkpoint import (
    CheckpointManager,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def make_state(v):
    return {
        "params": {"w": jnp.full((4, 4), float(v)), "b": jnp.zeros((4,))},
        "step": jnp.asarray(v),
    }


def test_save_restore_roundtrip(tmp_path):
    state = make_state(3)
    save_checkpoint(str(tmp_path), state, step=3)
    assert latest_step(str(tmp_path)) == 3
    restored, step = restore_checkpoint(str(tmp_path), state)
    assert step == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)


def test_latest_of_many(tmp_path):
    for s in (1, 5, 2):
        save_checkpoint(str(tmp_path), make_state(s), step=s)
    assert latest_step(str(tmp_path)) == 5
    restored, step = restore_checkpoint(str(tmp_path), make_state(0))
    assert step == 5 and float(restored["params"]["w"][0, 0]) == 5.0


def test_manager_policy_and_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_period=2, max_keep=2)
    metrics = [1.0, 0.5, 0.7, 0.3]
    for step, m in enumerate(metrics):
        actions = mgr.step_end(make_state(step), step, m)
    assert actions["saved_best"]  # 0.3 is the best at the final step
    restored, step = mgr.resume(make_state(0))
    assert step == 3
    best, bstep = restore_checkpoint(str(tmp_path / "best"), make_state(0))
    assert bstep == 3  # metric 0.3
    # periodic snapshots at steps 1 and 3
    assert latest_step(str(tmp_path / "periodic")) == 3


def test_resume_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.resume(make_state(0)) is None
