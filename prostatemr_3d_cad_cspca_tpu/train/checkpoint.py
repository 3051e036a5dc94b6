"""Full training-state checkpointing via orbax (params + opt state + step).

Complements utils.serialization (the lightweight single-file ``M1.save``
surface, reference modelio.py parity) with production checkpointing
(SURVEY.md §5.3-5.4): atomic async writes, keep-policy, and one-call
auto-resume — replacing the reference's retry-on-BlockingIOError loops
(callbacks.py:59-74) and directory-scan resume (callbacks.py:195-215).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper bound to an M1 training run."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3,
                 save_interval_steps: int = 1):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state, config: Optional[Dict[str, Any]] = None):
        ocp = _ocp()
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(state.step)}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if config is not None:
            cfg_path = os.path.join(self.directory, "model_config.json")
            if not os.path.exists(cfg_path):
                tmp = cfg_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(config, f, default=str)
                os.replace(tmp, cfg_path)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like) -> Tuple[Any, int]:
        """Restore the latest checkpoint into the structure of ``state_like``.
        Returns (state, step). Raises if no checkpoint exists."""
        ocp = _ocp()
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        target = {"params": state_like.params, "opt_state": state_like.opt_state,
                  "step": np.asarray(state_like.step)}
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        new_state = type(state_like)(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]))
        return new_state, step

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

    @staticmethod
    def load_config(directory: str) -> Optional[Dict[str, Any]]:
        cfg_path = os.path.join(directory, "model_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                return json.load(f)
        return None
