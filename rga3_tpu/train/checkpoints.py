"""Orbax checkpointing: latest/best + resume + meta_log_info.json.

Replaces the reference's DeepSpeed engine checkpoints
(ref: train_joint.py:426-461 — ckpt_latest/ckpt_best with barrier-guarded
rmtree; auto-resume from `latest` with epoch arithmetic at :352-376;
best-metric history in meta_log_info.json :372-376, 437-454).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.meta_path = os.path.join(self.ckpt_dir, "meta_log_info.json")
        self._ckptr = ocp.StandardCheckpointer()

    # -- meta -----------------------------------------------------------
    def read_meta(self) -> Dict[str, Any]:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"best_metric": None, "best_epoch": None, "history": []}

    def write_meta(self, meta: Dict[str, Any]) -> None:
        with open(self.meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    # -- save / restore -------------------------------------------------
    def _path(self, tag: str) -> str:
        return os.path.join(self.ckpt_dir, f"ckpt_{tag}")

    def save(self, tag: str, state: Any, *, force: bool = True) -> None:
        """Save a state pytree. Multi-process: every process must call
        this with the same global (sharded) jax.Arrays — Orbax writes each
        process's addressable shards (the DeepSpeed-engine-checkpoint
        equivalent, ref train_joint.py:426-461); rmtree/meta writes are
        rank-0 with barriers (ref's barrier-guarded rmtree :427-431)."""
        import jax

        path = self._path(tag)
        if jax.process_index() == 0 and os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_rm_{tag}")
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, target: Optional[Any] = None) -> Any:
        return self._ckptr.restore(self._path(tag), target)

    def has(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))

    # -- epoch bookkeeping (ref auto-resume arithmetic :352-371) --------
    def save_epoch(
        self, state: Any, epoch: int, metric: Optional[float] = None,
        higher_is_better: bool = True,
    ) -> bool:
        """Save latest; save best when metric improves. Returns is_best.

        Multi-process: all processes call this (Orbax needs every rank's
        shards); the is-best decision is made from the rank-0 meta file —
        callers must pass the same `metric` on every rank (see
        `parallel.distributed.broadcast_scalar`)."""
        import jax

        self.save("latest", state)
        meta = self.read_meta()
        meta["last_epoch"] = epoch
        is_best = False
        if metric is not None:
            best = meta.get("best_metric")
            is_best = (
                best is None
                or (metric > best if higher_is_better else metric < best)
            )
            if is_best:
                meta["best_metric"] = metric
                meta["best_epoch"] = epoch
                self.save("best", state)
            meta.setdefault("history", []).append(
                {"epoch": epoch, "metric": metric}
            )
        if jax.process_index() == 0:
            self.write_meta(meta)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_meta")
        return is_best

    def resume_epoch(self) -> int:
        """Epoch to resume from (0 if nothing saved)."""
        meta = self.read_meta()
        if self.has("latest") and meta.get("last_epoch") is not None:
            return int(meta["last_epoch"]) + 1
        return 0
