"""Checkpoint management — a from-scratch subsystem (SURVEY.md §5.4).

The reference saves the trunk state_dict once at the end of training and has
no mid-run resume. Here:

- orbax step checkpoints of the FULL TrainState (params, batch_stats,
  optimizer state, step, rng) with retention, enabling crash/resume;
- trunk export in the reference's torch-legacy layout
  (compat.torch_writer), loadable by the unmodified reference code;
- trunk import from reference ``.pth`` files (compat.import_params).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from pretrain_gnns_tpu.train.state import TrainState


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Step-based TrainState checkpoints with retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState) -> None:
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        ocp = _ocp()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mgr.close()


def save_trunk_reference_format(trunk_variables: Any, path: str) -> None:
    """Save a trunk (``{"params":..., "batch_stats":...}``) as a reference-
    layout legacy torch .pth — our ``torch.save(model.gnn.state_dict())``
    (chem/pretrain_masking.py:146-147)."""
    from pretrain_gnns_tpu.compat import import_params, torch_writer

    host = jax.tree_util.tree_map(np.asarray, trunk_variables)
    sd = import_params.trunk_to_torch(host)
    torch_writer.save_state_dict(sd, path)


def load_trunk_any(path: str) -> Any:
    """Load a trunk from either a reference .pth or our own export."""
    from pretrain_gnns_tpu.compat import import_params

    return import_params.load_trunk(path)
