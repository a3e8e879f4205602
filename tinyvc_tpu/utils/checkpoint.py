"""Checkpointing with orbax.

The reference saves bare ``state_dict`` pickles every 500 batches and loses
optimizer state + step count on restart (`train_decoder.py:52-56`; SURVEY
§5.3-5.4: the discriminator-join gate re-arms on every resume). Here full
train states (params + optimizer + step) and the config are checkpointed
atomically, with step-numbered directories and retention.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..config import TinyVCConfig


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, config: Optional[TinyVCConfig] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if config is not None:
            args["config"] = ocp.args.JsonSave(config.to_json())
        self._mgr.save(step, args=ocp.args.Composite(**args))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``target_state`` (an abstract or
        concrete pytree of the same shape)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(target_state)),
        )
        return restored["state"]

    def restore_config(self, step: Optional[int] = None) -> Optional[TinyVCConfig]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
            )
            return TinyVCConfig.from_json(restored["config"])
        except Exception:
            return None

    def close(self):
        self._mgr.close()
