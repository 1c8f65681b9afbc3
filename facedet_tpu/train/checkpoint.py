"""Checkpoint / resume — orbax-backed training state persistence.

The reference's checkpoint story is ultralytics' closed save policy
(best.pt/last.pt, save_period, patience — pipeline_v3_RTDETR/
train_rtdetr.py:211-224) plus the dual evaluator's in-memory prediction cache
(eval/eval_dual.py:86,186-189). Here training state (params, batch_stats,
optimizer state, step) persists through orbax — async-safe, sharding-aware
(FSDP-sharded states restore with their shardings on a mesh) — with the
trainers' .npz exports kept as the portable interchange format.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "CheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, state: Any, step: int, force: bool = True) -> str:
    """Save a pytree training state under ``directory/step_N``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckptr = _checkpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, template: Any, step: Optional[int] = None
) -> tuple[Any, int]:
    """Restore the given (or latest) step. ``template`` is an abstract or
    concrete pytree matching the saved structure; pass shardings on its leaves
    to restore directly to a mesh layout."""
    step = step if step is not None else latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckptr = _checkpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        template,
    )
    return ckptr.restore(path, abstract), step


class CheckpointManager:
    """Rolling manager with the reference's save policy: keep best + last,
    periodic snapshots every ``save_period`` epochs."""

    def __init__(self, directory: str, save_period: int = 5, max_keep: int = 5):
        self.directory = directory
        self.save_period = save_period
        self.max_keep = max_keep
        self.best_metric = float("inf")

    def step_end(self, state: Any, step: int, metric: float) -> dict:
        actions = {"saved_last": True, "saved_best": False, "saved_periodic": False}
        save_checkpoint(os.path.join(self.directory, "last"), state, step)
        self._prune(os.path.join(self.directory, "last"), keep=1)
        if metric < self.best_metric - 1e-9:
            self.best_metric = metric
            save_checkpoint(os.path.join(self.directory, "best"), state, step)
            self._prune(os.path.join(self.directory, "best"), keep=1)
            actions["saved_best"] = True
        if self.save_period and (step + 1) % self.save_period == 0:
            save_checkpoint(os.path.join(self.directory, "periodic"), state, step)
            self._prune(os.path.join(self.directory, "periodic"), keep=self.max_keep)
            actions["saved_periodic"] = True
        return actions

    def _prune(self, directory: str, keep: int) -> None:
        if not os.path.isdir(directory):
            return
        import shutil

        steps = sorted(
            int(n.split("_", 1)[1])
            for n in os.listdir(directory)
            if n.startswith("step_")
        )
        for s in steps[:-keep]:
            shutil.rmtree(os.path.join(directory, f"step_{s}"), ignore_errors=True)

    def resume(self, template: Any) -> Optional[tuple[Any, int]]:
        """Restore from last/ if present (the resume path)."""
        last_dir = os.path.join(self.directory, "last")
        if latest_step(last_dir) is None:
            return None
        return restore_checkpoint(last_dir, template)
