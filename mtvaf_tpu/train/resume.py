"""Epoch-level checkpoint/resume for trainers.

Beyond-reference capability (SURVEY.md §5: the reference saves only a
best-dev state_dict and cannot resume): full train state (params + optimizer
state + step) checkpointed per epoch via orbax, with a sidecar meta file
carrying the epoch counter and best metrics.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

from ..core.checkpoint import (latest_checkpoint_step, load_checkpoint,
                               save_checkpoint, wait_for_checkpoints)


def _ckpt_dir(save_path: str) -> str:
    return os.path.join(save_path, "ckpt")


def save_epoch_checkpoint(save_path: str, state, epoch: int, meta: dict) -> None:
    ckpt = _ckpt_dir(save_path)
    save_checkpoint(ckpt, state, step=epoch)
    with open(os.path.join(ckpt, f"meta_{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, **meta}, f)


def load_latest_checkpoint(save_path: str, template_state
                           ) -> Tuple[Optional[object], int, dict]:
    """Returns (state or None, start_epoch, meta)."""
    wait_for_checkpoints()   # in-flight background saves must land first
    ckpt = _ckpt_dir(save_path)
    epoch = latest_checkpoint_step(ckpt)
    if epoch is None:
        return None, 1, {}
    state = load_checkpoint(ckpt, template_state, epoch)
    meta_path = os.path.join(ckpt, f"meta_{epoch}.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, epoch + 1, meta
