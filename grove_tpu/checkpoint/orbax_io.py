"""Orbax checkpointing with the reference's best/latest + auto-resume
semantics (`train.py:489-501,685-702`): sharded-safe saves of params +
optimizer state + step, a `ckpt_best` dir gated on metric improvement with a
rank-0 marker file `epoch_{e}_val_{metric}_{value}.marker`, and
`latest_step()` discovery for `--auto_resume`."""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, log_dir: str, max_to_keep: int = 2):
        self.log_dir = os.path.abspath(log_dir)
        self.ckpt_dir = os.path.join(self.log_dir, "ckpt_model")
        self.best_dir = os.path.join(self.log_dir, "ckpt_model_best")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._best_ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, params, opt_state=None,
             extra: Optional[Dict[str, Any]] = None):
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        if extra:
            state["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def save_best(self, epoch: int, params, metric_name: str,
                  metric_value: float):
        """Best-checkpoint save + reference-style marker file."""
        path = os.path.join(self.best_dir, "params")
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.makedirs(self.best_dir, exist_ok=True)
        self._best_ckptr.save(path, {"params": params})
        self._best_ckptr.wait_until_finished()
        for f in os.listdir(self.best_dir):
            if f.endswith(".marker"):
                os.remove(os.path.join(self.best_dir, f))
        marker = os.path.join(
            self.best_dir,
            f"epoch_{epoch}_val_{metric_name}_{metric_value:.4f}.marker")
        open(marker, "w").close()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def restore_best(self, template=None):
        path = os.path.join(self.best_dir, "params")
        if not os.path.exists(path):
            return None
        if template is not None:
            return self._best_ckptr.restore(path, template)
        return self._best_ckptr.restore(path)

    def best_metric_from_marker(self) -> Optional[float]:
        if not os.path.isdir(self.best_dir):
            return None
        for f in os.listdir(self.best_dir):
            m = re.match(r"epoch_\d+_val_.+_([-\d.]+)\.marker", f)
            if m:
                return float(m.group(1))
        return None

    def close(self):
        self._mgr.close()
