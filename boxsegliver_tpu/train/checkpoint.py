"""Checkpoint management: periodic + best + interval-best + warm start.

Replaces the reference's TF1 Saver machinery (reference core/estimator.py:
693-719 max_to_keep=1 periodic saver; core/hooks.py:193-228 parallel
`checkpoint_best[_N]` line; core/models.py:160-221 scope-remapped warm start)
with orbax:

    model_dir/
      ckpt/            periodic checkpoints   (max_to_keep=1, every save_ckpt_steps)
      ckpt_best/       best-metric checkpoints (one per tag: best, best_<N>)
      best_result      JSON sidecar (written by hooks.BestKeeper)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir, max_to_keep: int = 1,
                 save_interval_steps: int = 5000):
        self.model_dir = Path(model_dir).resolve()
        self.save_interval_steps = save_interval_steps
        self._mgr = ocp.CheckpointManager(
            self.model_dir / "ckpt",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=False))
        self._best_dir = self.model_dir / "ckpt_best"

    # -- periodic ----------------------------------------------------------
    def maybe_save(self, step: int, state) -> bool:
        if step % self.save_interval_steps != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(state))
        return restored, step

    # -- best line (reference checkpoint_best[_N], core/hooks.py:193-228) ---
    def save_best(self, state, tag: str = "best"):
        path = self._best_dir / tag
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()

    def restore_best(self, state, tag: str = "best"):
        path = self._best_dir / tag
        if not path.exists():
            return None
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, state)

    def has_best(self, tag: str = "best") -> bool:
        return (self._best_dir / tag).exists()

    def close(self):
        self._mgr.close()


def remap_params(loaded: Dict[str, Any], scope_map: Optional[Dict[str, str]] = None):
    """Scope-remapped partial restore (reference init_model,
    core/models.py:160-185): rename top-level module prefixes before merging."""
    if not scope_map:
        return loaded
    out = {}
    for k, v in loaded.items():
        out[scope_map.get(k, k)] = v
    return out


def warm_start(state, ckpt_path, scope_map: Optional[Dict[str, str]] = None):
    """Initialize params (and batch_stats) from another checkpoint; missing
    keys keep their fresh init (partial restore semantics of the reference)."""
    ckptr = ocp.StandardCheckpointer()
    loaded = ckptr.restore(Path(ckpt_path).resolve())
    new_params = _merge(state.params, remap_params(loaded.get("params", {}), scope_map))
    updates = {"params": new_params}
    if "batch_stats" in loaded and hasattr(state, "batch_stats"):
        updates["batch_stats"] = _merge(
            state.batch_stats, remap_params(loaded["batch_stats"], scope_map))
    return state.replace(**updates)


def _merge(target, source):
    """Recursively copy matching-shaped leaves of source into target."""
    if not isinstance(target, dict):
        if (source is not None and np.shape(source) == np.shape(target)):
            return jax.numpy.asarray(source, dtype=jax.numpy.asarray(target).dtype)
        return target
    out = {}
    for k, v in target.items():
        out[k] = _merge(v, source.get(k)) if isinstance(source, dict) else v
    return out
