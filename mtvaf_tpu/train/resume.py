"""Epoch-level checkpoint/resume + graceful preemption for trainers.

Beyond-reference capability (SURVEY.md §5: the reference saves only a
best-dev state_dict and cannot resume): full train state (params + optimizer
state + step) checkpointed per epoch via orbax, with a sidecar meta file
carrying the epoch counter and best metrics.

Preemption: checkpointing runs install a SIGTERM handler; on signal the
trainer finishes the CURRENT epoch (epoch boundaries keep `--resume`
bit-identical — data order is a pure function of seed+epoch), writes a
checkpoint regardless of `--checkpoint_every`, and returns cleanly.  The
maintenance-event drill for preemptible TPU pools.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

from ..core.checkpoint import (latest_checkpoint_step, load_checkpoint,
                               save_checkpoint, wait_for_checkpoints)

logger = logging.getLogger(__name__)

_STOP = {"flag": False}


def install_preemption_handler():
    """Catch SIGTERM; returns the previous handler so the caller can
    restore it with :func:`uninstall_preemption_handler` when training
    ends (otherwise a post-train SIGTERM would be swallowed).  Main
    thread only — returns None (no-op) elsewhere.  Also clears any stale
    stop flag so a second train() in the same process starts clean."""
    import signal
    import threading
    if threading.current_thread() is not threading.main_thread():
        return None
    _STOP["flag"] = False

    def _handler(signum, frame):
        _STOP["flag"] = True
        logger.warning("SIGTERM received — will checkpoint at the epoch "
                       "boundary and exit cleanly")

    return signal.signal(signal.SIGTERM, _handler)


def uninstall_preemption_handler(previous) -> None:
    """Restore the pre-train SIGTERM disposition (main thread only)."""
    import signal
    import threading
    if threading.current_thread() is not threading.main_thread():
        return
    signal.signal(signal.SIGTERM,
                  previous if previous is not None else signal.SIG_DFL)
    _STOP["flag"] = False


def stop_requested() -> bool:
    return _STOP["flag"]


def clear_stop() -> None:
    _STOP["flag"] = False


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
