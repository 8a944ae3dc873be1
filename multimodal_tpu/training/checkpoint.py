"""Checkpoint save/restore via orbax.

TPU-native replacement for the reference's torch.save / Lightning
ModelCheckpoint (+ the library's URL loading, ``utils/common.py:99-107``):
sharded, async-capable orbax checkpoints of arbitrary pytrees, with
auto-resume from the latest step — the capability the reference's native
trainer lacks (its TODO at ``examples/flava/native/train.py:354``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.close()
