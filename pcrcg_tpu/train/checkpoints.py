"""Checkpoint save/restore via orbax.

Capability parity with the reference's snapshot flow (lib/trainer.py:
129-184): per-epoch snapshots plus 'best_loss' / 'best_recall' aliases,
restoring model params, optimizer state, epoch counter and best metrics
from ``config.pretrain``; and the RPMNet-style max_to_keep manager
(common/torch.py:34+).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(state) -> Dict[str, Any]:
    out = {
        "params": state.params,
        "constants": state.constants,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.batch_stats is not None:
        out["batch_stats"] = state.batch_stats
    return out


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self.best_loss = float(np.inf)
        self.best_recall = 0.0

    def save(self, state, epoch: int, metrics: Optional[Dict[str, float]] = None):
        payload = {"state": _to_saveable(state), "meta": {
            "epoch": epoch,
            "best_loss": self.best_loss,
            "best_recall": self.best_recall,
        }}
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def maybe_save_best(self, state, epoch: int, circle_loss: float, recall: float):
        """Track best-loss / best-recall (reference trainer.py:404-415)."""
        improved = []
        if circle_loss < self.best_loss:
            self.best_loss = circle_loss
            improved.append("best_loss")
        if recall > self.best_recall:
            self.best_recall = recall
            improved.append("best_recall")
        for tag in improved:
            self._save_alias(state, epoch, tag)
        return improved

    def _save_alias(self, state, epoch: int, tag: str):
        path = os.path.join(self.directory, tag)
        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, {"state": _to_saveable(state), "meta": {
            "epoch": epoch,
            "best_loss": self.best_loss,
            "best_recall": self.best_recall,
        }})
        ckptr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None, path: Optional[str] = None):
        """Restore into the shape/dtype structure of ``state``; returns
        (state, meta).  ``path`` loads an alias dir (best_loss/…) or any
        standalone checkpoint, like config.pretrain."""
        template = {"state": _to_saveable(state), "meta": {
            "epoch": 0, "best_loss": float(np.inf), "best_recall": 0.0,
        }}
        if path is not None:
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(path), target=template
            )
        else:
            step = self.latest_step() if step is None else step
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        s = restored["state"]
        new_state = state.replace(
            params=s["params"],
            constants=s["constants"],
            opt_state=s["opt_state"],
            step=s["step"],
            batch_stats=s.get("batch_stats", state.batch_stats),
        )
        meta = restored["meta"]
        self.best_loss = float(meta["best_loss"])
        self.best_recall = float(meta["best_recall"])
        return new_state, meta

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
