"""Optimizers: AdamW parameter groups + linear-warmup schedule.

Reference semantics (modules/train.py:461-493, 887-926):
* text-only path: AdamW over all params, lr=args.lr, torch default wd=0.01;
* multimodal path: param groups — 'bert' @ lr, 'encoder_conv' @ lr,
  (pipeline B) 'crf'/'fc' @ 5e-2 — all wd=1e-2, ResNet frozen;
* schedule: linear warmup (warmup_ratio·total) then linear decay to 0.

The reference's group collection silently leaves the 12 prefix projectors,
the ANP classifiers and (pipeline A) every task head out of the optimizer
(its groups only match 'bert', 'encoder_conv', 'gates', 'crf', 'fc' —
modules/train.py:468-493).  ``groups_mode='reference'`` replicates that
faithfully for parity experiments; the default ``'all'`` trains the remaining
parameters at the base lr, which is the evident intent.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import optax


def linear_warmup_schedule(base_lr: float, warmup_steps: float,
                           total_steps: int):
    """HF get_linear_schedule_with_warmup equivalent.

    ``warmup_steps`` may be FRACTIONAL: the reference passes
    ``warmup_ratio * train_num_steps`` straight through
    (modules/train.py:464-466) and HF's lambda compares/divides with the
    float, so truncating to int would skew every warmup lr by up to
    1/warmup_steps."""
    warmup_steps = max(float(warmup_steps), 0.0)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1.0)
        decay = jnp.maximum(
            (total_steps - step) / jnp.maximum(total_steps - warmup_steps,
                                               1.0), 0.0)
        frac = jnp.where(step < warmup_steps, warm, decay)
        return base_lr * frac

    return schedule


def _param_group(path: str, cfg, pipeline: str, groups_mode: str) -> str:
    """Assign a flattened param path to an optimizer group label."""
    if path.startswith("resnet"):
        return "frozen"                      # reference freezes the backbone
    if path.startswith("bert"):
        return "base"
    if path.startswith("prefix/conv"):       # encoder_conv
        return "base"
    if pipeline == "crf" and (path.startswith("crf") or path.startswith("fc")):
        return "head_fast"                   # lr 5e-2 (modules/train.py:911-916)
    if groups_mode == "reference":
        return "frozen"                      # reference leaves the rest untrained
    return "base"


def _label_tree(params: Dict, cfg, pipeline: str, groups_mode: str):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    labels = {}
    # Rebuild a tree of labels with the same structure.
    def assign(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: assign(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [assign(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return type(tree)(t)
        return _param_group(prefix, cfg, pipeline, groups_mode)

    return assign(params)


def build_optimizer(params: Dict, cfg, *, total_steps: int,
                    pipeline: str = "span", groups_mode: str = "all",
                    use_prefix_groups: Optional[bool] = None):
    """AdamW with reference param groups and linear-warmup schedule.

    Returns (optimizer, schedule_fn).
    """
    if use_prefix_groups is None:
        use_prefix_groups = cfg.use_prefix
    # float on purpose — HF's lambda uses the fractional count as-is
    warmup_steps = cfg.warmup_ratio * total_steps
    sched = linear_warmup_schedule(cfg.lr, warmup_steps, total_steps)

    mu_dtype = None
    if getattr(cfg, "optimizer_mu_bf16", False):
        import jax.numpy as jnp
        mu_dtype = jnp.bfloat16

    def adamw(schedule):
        return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=1e-2, mu_dtype=mu_dtype)

    if not use_prefix_groups:
        # bert_before_train: one group over everything (torch AdamW defaults).
        opt = adamw(sched)
        return opt, sched

    # One fused AdamW pass for ALL groups + a per-leaf scale.  multi_transform
    # would re-run the update per group (~3x the optimizer wall time on TPU);
    # since every group shares the schedule shape and weight decay, the
    # per-group base lr is a constant factor on the decoupled-AdamW update:
    #   update = -lr·(m̂/(√v̂+ε) + wd·p)  →  computed at the base lr, then
    # scaled by (group_lr / base_lr); frozen leaves scale to 0.
    labels = _label_tree(params, cfg, pipeline, groups_mode)
    factor_of = {"base": 1.0, "head_fast": 5e-2 / cfg.lr, "frozen": 0.0}
    factors = jax.tree.map(lambda lab: factor_of[lab], labels)

    def scale_by_group():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            scaled = jax.tree.map(lambda u, f: u * f, updates, factors)
            return scaled, state

        return optax.GradientTransformation(init_fn, update_fn)

    opt = optax.chain(adamw(sched), scale_by_group())
    return opt, sched
