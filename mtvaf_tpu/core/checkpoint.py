"""Checkpointing: params + optimizer state + step, plus torch interop.

Goes beyond the reference (which saves only a best-dev ``state_dict`` and
cannot resume optimizer state or step — modules/train.py:239-241; SURVEY.md
§5 "Checkpoint / resume"):

* :func:`save_checkpoint` / :func:`load_checkpoint` — full training state via
  orbax (atomic, async-capable).
* :func:`save_best` / :func:`load_best` — the reference's best-dev model file.
* :func:`load_torch_file` — read ``.pth``/``.pt`` files for weight conversion.
* :func:`transplant` — the NER→ABSA selective warm start
  (reference modules/train.py:495-521) as explicit name matching.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def _unflatten_into(template, flat: Dict[str, Any], prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}/{k}" if prefix else str(k))
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return type(template)(
            _unflatten_into(v, flat, f"{prefix}/{i}")
            for i, v in enumerate(template))
    return flat.get(prefix, template)


def save_best(path: str, params) -> None:
    """Save model params as a flat .npz (best_model equivalent)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    np.savez(path, **flat)


def load_best(path: str, template_params):
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat = {k: jax.numpy.asarray(data[k]) for k in data.files}
    return _unflatten_into(template_params, flat)


_CKPTR = None


def _checkpointer():
    """Shared async orbax checkpointer.

    ``StandardCheckpointer.save`` copies device arrays to host
    synchronously and writes to storage in the BACKGROUND — a per-epoch
    full-state save (~1.7 GB at flagship scale, ~25 s of serialization)
    overlaps the next epoch's training instead of stalling it.  The
    host-copy-first semantics make it safe with donated train state."""
    global _CKPTR
    if _CKPTR is None:
        import atexit

        import orbax.checkpoint as ocp
        _CKPTR = ocp.StandardCheckpointer()
        # Callers outside the trainers' run() (which calls
        # wait_for_checkpoints itself) must not lose an in-flight background
        # write at interpreter exit — that would leave only an orbax tmp dir.
        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until all background checkpoint writes have landed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None, *,
                    wait: bool = False) -> None:
    """Full train-state checkpoint via orbax (background write)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else step
    ckptr = _checkpointer()
    ckptr.save(os.path.join(ckpt_dir, f"step_{step}"), state, force=True)
    if wait:
        ckptr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, template_state, step: int):
    wait_for_checkpoints()     # a same-run pending save must land first
    return _checkpointer().restore(
        os.path.join(os.path.abspath(ckpt_dir), f"step_{step}"),
        template_state)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_torch_file(path: str):
    """Load a torch .pth/.pt into plain numpy (host-side conversion only)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # np.array copy: .numpy() is a view of torch storage, and jnp.asarray
    # zero-copies host memory — aliasing torch buffers into (donatable)
    # params is unsafe (see core/convert._np).
    return {k: np.array(v.detach().numpy(), copy=True)
            if hasattr(v, "detach") else v for k, v in obj.items()}


def transplant(target_params, source_params, *, skip_substrings=("crf",),
               head_substrings=("dense", "unary_affine", "binary_affine",
                                "classifier")):
    """NER→ABSA selective transplant by explicit name matching (replaces the
    reference's positional state-dict surgery)."""
    from .convert import transplant_named
    t_flat = _flatten(target_params)
    s_flat = _flatten(source_params)
    merged = transplant_named(t_flat, s_flat, skip_substrings, head_substrings)
    return _unflatten_into(target_params, merged)
