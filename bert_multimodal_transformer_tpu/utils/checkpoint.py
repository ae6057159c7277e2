"""Checkpoint / resume via Orbax.

A capability the reference lacks entirely — it never saves the model
(SURVEY §5: no save_pretrained/torch.save anywhere; a crash loses the run).
Saves the full TrainState (params, optimizer state, step, RNG) and restores
with sharding-aware layout.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: Any, step: int, *, wait: bool = False) -> None:
        """Save the array pytree of ``state`` (non-pytree fields like
        apply_fn/tx are reconstructed on restore from the template)."""
        payload = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "rng": state.rng,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, template_state: Any, step: int) -> Any:
        payload = {
            "step": template_state.step,
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "rng": template_state.rng,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload))
        return template_state.replace(
            step=restored["step"], params=restored["params"],
            opt_state=restored["opt_state"], rng=restored["rng"])

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Restore only the params subtree (no template needed) — for
        inference against a checkpoint written by any optimizer."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        raw = self._mgr.restore(step)
        return raw["params"]

    def restore_latest(self, template_state: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self.restore(template_state, step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait_until_finished(self) -> None:
        """Block until pending async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
