"""Jitted train / eval steps with SPMD data parallelism.

One fused XLA program per step: forward + backward + AdamW update (+ optional
gradient accumulation as a ``lax.scan`` over micro-batches).  Batches are
sharded over the mesh 'data' axis; gradients all-reduce over ICI implicitly
through jit (replacing the reference's NCCL DDP + DataParallelCriterion,
SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.mesh import batch_sharding, param_sharding, replicated
from ..nn.bert import BertConfig, xla_attention
from ..nn.models import (crf_model_forward, span_classification,
                         span_extraction, span_model_loss)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class MasterState(NamedTuple):
    """Optimizer state for ``--params_bf16``: the fp32 master copy of the
    parameters plus the wrapped optax state (torch-AMP master-weight
    semantics — AdamW updates the fp32 master, the live bf16 params are
    its cast).  Stored inside ``TrainState.opt_state`` so checkpointing,
    resume and sharding treat it like any other optimizer moment."""
    master: Any
    inner: Any


def create_train_state(params, optimizer, *, params_dtype=None) -> TrainState:
    """``params_dtype=jnp.bfloat16`` stores the LIVE params in bf16 (halving
    the forward+backward parameter HBM reads) while AdamW runs on an fp32
    master kept in the optimizer state."""
    if params_dtype is None:
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))
    low = jax.tree.map(lambda p: p.astype(params_dtype), params)
    return TrainState(params=low,
                      opt_state=MasterState(master=params,
                                            inner=optimizer.init(params)),
                      step=jnp.zeros((), jnp.int32))


def export_params(state: TrainState):
    """The full-precision view of the model params: the fp32 master under
    ``--params_bf16``, the live params otherwise.  Use as the template for
    best-model saves, transplant and torch interop."""
    if isinstance(state.opt_state, MasterState):
        return state.opt_state.master
    return state.params


def replace_params(state: TrainState, new_params) -> TrainState:
    """Swap the model params (best-model reload, transplant), keeping the
    fp32 master consistent so the next optimizer step starts from the new
    weights instead of silently reverting to the stale master."""
    if isinstance(state.opt_state, MasterState):
        master = jax.tree.map(lambda n, m: jnp.asarray(n, m.dtype),
                              new_params, state.opt_state.master)
        low = jax.tree.map(lambda n, p: jnp.asarray(n, p.dtype),
                           new_params, state.params)
        return state._replace(params=low,
                              opt_state=state.opt_state._replace(master=master))
    return state._replace(params=new_params)


def _split_guides(batch: Dict):
    guides = None
    if "main_guides" in batch:
        guides = (batch["main_guides"], batch.get("aux_guides"))
    return guides


def make_span_loss_fn(cfg, bert_cfg: BertConfig, attention_impl=xla_attention):
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def loss_fn(params, batch, rng):
        out = span_model_loss(params, cfg, bert_cfg, batch,
                              visual_guides=_split_guides(batch), rng=rng,
                              attention_impl=attention_impl, dtype=dtype)
        metrics = {k: out[k] for k in ("loss", "ae_loss", "ac_loss",
                                       "ac_logits")}
        if "probe_loss" in out:
            metrics["probe_loss"] = out["probe_loss"]
            metrics["ori_loss"] = out["ori_loss"]
        return out["loss"], metrics

    return loss_fn


def make_crf_loss_fn(cfg, bert_cfg: BertConfig, attention_impl=xla_attention,
                     with_decode: bool = False):
    """CRF loss (+aux).  ``with_decode`` adds the Viterbi path to the train
    program's metrics — the reference decodes inside every train forward
    (models/bert_model.py:511); fusing it here costs ~1 ms of device time
    and saves a separate per-step decode dispatch (a full RPC on tunneled
    backends)."""
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def loss_fn(params, batch, rng):
        out = crf_model_forward(params, cfg, bert_cfg, batch,
                                visual_guides=_split_guides(batch), rng=rng,
                                attention_impl=attention_impl, dtype=dtype,
                                with_decode=with_decode)
        metrics = {"loss": out["loss"], "emissions": out["emissions"]}
        if with_decode:
            metrics["pred_tags"] = out["pred_tags"]
        if "probe_loss" in out:
            metrics["probe_loss"] = out["probe_loss"]
        if "img_tag_loss" in out:
            metrics["img_tag_loss"] = jnp.asarray(out["img_tag_loss"],
                                                  jnp.float32)
        return out["loss"], metrics

    return loss_fn


def make_train_step(loss_fn: Callable, optimizer, *,
                    accum_steps: int = 1,
                    augment_fn: Optional[Callable] = None,
                    donate: bool = True,
                    with_grad_norm: bool = False) -> Callable:
    """Build the fused train step.

    loss_fn(params, batch, rng) -> (loss, metrics).
    augment_fn(params, batch, rng, base_loss, base_metrics) -> (loss, metrics)
    implements cutoff-consistency training on top of the base loss.
    with_grad_norm adds a global grad-norm metric — a full-tree fp32
    reduce (~0.8 ms/step at BERT-base scale), so it is opt-in
    (``--log_grad_norm``); the reference logs no gradient norm.
    """

    def compute(params, batch, rng):
        if augment_fn is None:
            return loss_fn(params, batch, rng)
        base_rng, aug_rng = jax.random.split(rng)
        loss, metrics = loss_fn(params, batch, base_rng)
        return augment_fn(params, batch, aug_rng, loss, metrics)

    grad_fn = jax.value_and_grad(lambda p, b, r: compute(p, b, r),
                                 has_aux=True)

    def grad_norm(grads) -> jnp.ndarray:
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))),
                         grads)) ** 0.5

    def apply(state: TrainState, grads) -> TrainState:
        if isinstance(state.opt_state, MasterState):
            # bf16 live params / fp32 master: grads (bf16) upcast once, the
            # optimizer walks the fp32 master, and the live params are the
            # master's exact bf16 cast — no drift channel between them.
            g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, inner = optimizer.update(g32, state.opt_state.inner,
                                              state.opt_state.master)
            master = jax.tree.map(lambda p, u: p + u,
                                  state.opt_state.master, updates)
            params = jax.tree.map(lambda m, p: m.astype(p.dtype),
                                  master, state.params)
            return TrainState(params=params,
                              opt_state=MasterState(master=master,
                                                    inner=inner),
                              step=state.step + 1)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1)

    def single_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        # Per-step key derived INSIDE the program from the optimizer step:
        # callers pass one key per epoch (or per run) and never dispatch a
        # host-side split per step — on tunneled backends each extra
        # dispatch is a full RPC.
        if rng is not None:
            rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = grad_fn(state.params, batch, rng)
        new_state = apply(state, grads)
        metrics = dict(metrics)
        if with_grad_norm:
            metrics["grad_norm"] = grad_norm(grads)
        return new_state, metrics

    def accum_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        """batch leaves have leading (accum_steps, micro_bsz, ...)."""
        if rng is not None:
            rng = jax.random.fold_in(rng, state.step)   # see single_step

        def micro(grads_acc, xs):
            micro_batch, micro_rng = xs
            (_, metrics), grads = grad_fn(state.params, micro_batch, micro_rng)
            grads_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads)
            return grads_acc, metrics

        # fp32 accumulators even under --params_bf16 (bf16 grads): summing
        # micro-batch grads in bf16 would lose low bits every add.
        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        # rng=None (deterministic eval/parity runs): None is an empty pytree,
        # so scan passes it through to every micro-step unchanged.
        rngs = jax.random.split(rng, accum_steps) if rng is not None else None
        grads, stacked = jax.lax.scan(micro, zero_grads, (batch, rngs))
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        new_state = apply(state, grads)
        # Scalar metrics (stacked to (accum,)) average over micro-batches;
        # per-example metrics (logits/emissions, (accum, micro, ...)) concat
        # back to the original full-batch row order so the trainer's
        # train-metric collection sees real predictions (not a gold fallback).
        metrics = {k: (jnp.mean(v, axis=0) if v.ndim == 1
                       else v.reshape((-1,) + v.shape[2:]))
                   for k, v in stacked.items()}
        if with_grad_norm:
            metrics["grad_norm"] = grad_norm(grads)
        return new_state, metrics

    step = accum_step if accum_steps > 1 else single_step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Pipeline-A eval stages (device → host → device seam).


def make_extraction_step(cfg, bert_cfg: BertConfig,
                         attention_impl=xla_attention) -> Callable:
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def extraction(params, batch):
        prefix_kvs = None
        guides = _split_guides(batch)
        if cfg.use_prefix and guides is not None:
            from ..nn.models import visual_prompt
            prefix_kvs, _, _ = visual_prompt(params["prefix"], guides[0],
                                             guides[1], bert_cfg)
        s, e, seq, captured = span_extraction(
            params, cfg, bert_cfg, batch["input_ids"], batch["input_mask"],
            batch["segment_ids"], prefix_kvs=prefix_kvs,
            attention_impl=attention_impl, dtype=dtype,
            capture_layer=cfg.probe_layer if cfg.use_probe else None)
        return s, e, seq, captured

    return jax.jit(extraction)


def make_span_eval_loss_step(cfg, bert_cfg: BertConfig) -> Callable:
    """Eval-branch loss + ac_logits in one program.

    The reference's dev/test loops run the FULL model forward a second time
    with the eval-branch candidates and log the batch-mean loss
    (modules/train.py:197-199,227-229 dev; :295-305 test).  Re-running the
    encoder would double eval compute; in eval mode dropout is off, so
    :func:`span_model_tail` applied to the extraction pass's own outputs
    (seq, start/end logits, captured probe layer) is exactly the same math.
    ``span_pack`` stacks the host-picked candidates
    (starts/ends/labels/masks) into ONE (4, B, n_best) int32 upload — each
    tunnel RPC costs ~25-40 ms — and the returned (ac_logits, loss) replaces
    the classification-only dispatch one-for-one."""
    from ..nn.models import span_model_tail

    def eval_loss(params, batch, seq, start_logits, end_logits, captured,
                  span_pack):
        b = dict(batch)
        b["span_starts"], b["span_ends"] = span_pack[0], span_pack[1]
        b["span_labels"], b["span_masks"] = span_pack[2], span_pack[3]
        out = span_model_tail(params, cfg, bert_cfg, b, seq, start_logits,
                              end_logits, captured=captured)
        return out["ac_logits"], out["loss"]

    return jax.jit(eval_loss)


def make_classification_step(cfg, bert_cfg: BertConfig) -> Callable:
    """``span_pairs`` is the host-picked candidates stacked (2, B, n_best)
    int32 (starts at [0], ends at [1]) so the eval seam uploads ONE buffer
    per batch — each tunnel RPC costs ~25-40 ms (docs/DESIGN.md §8b).

    With ``gcn_layer_number > 0`` the reference's eval forward re-encodes
    the sequence through valid-ids compression + DiGCN before the span
    gather (models/bert_model.py:270-284, dropout inert in eval); the
    returned step then takes two extra arguments (valid_ids and
    adjacency_matrix — either may be None: a None adjacency skips the
    re-encode entirely, mirroring the train path's behavior when the GCN
    side file is absent, models.py `"adjacency_matrix" in batch`)."""
    if getattr(cfg, "gcn_layer_number", 0) > 0:
        def classify_gcn(params, seq_output, span_pairs, valid_ids,
                         adjacency_matrix):
            from ..nn.gcn import compress_valid_ids, digcn_forward
            seq = seq_output
            if adjacency_matrix is not None:
                if valid_ids is not None:
                    seq = compress_valid_ids(seq, valid_ids)
                seq = digcn_forward(params["digcn"], seq, adjacency_matrix)
            return span_classification(params, cfg, seq, span_pairs[0],
                                       span_pairs[1])
        return jax.jit(classify_gcn)

    def classify(params, seq_output, span_pairs):
        return span_classification(params, cfg, seq_output, span_pairs[0],
                                   span_pairs[1])
    return jax.jit(classify)


def make_crf_decode_step(cfg, bert_cfg: BertConfig,
                         attention_impl=xla_attention) -> Callable:
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def decode(params, batch):
        out = crf_model_forward(params, cfg, bert_cfg, batch,
                                visual_guides=_split_guides(batch), rng=None,
                                attention_impl=attention_impl, dtype=dtype,
                                with_loss=True, with_decode=True)
        return {"loss": out["loss"], "pred_tags": out["pred_tags"],
                "lengths": out["lengths"]}

    return jax.jit(decode)


# ---------------------------------------------------------------------------
# Sharded-state helpers.


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Place params/opt state on the mesh with the TP partition rules (pure
    DP → fully replicated).

    Optimizer moments (optax mu/nu) mirror the param tree — any opt-state
    subtree with the params' structure is sharded exactly like the params
    (under TP a replicated moment tree would waste memory and reshard on
    every update); scalars and everything else replicate."""
    p_sh = param_sharding(mesh, state.params)
    p_treedef = jax.tree.structure(state.params)
    params = jax.tree.map(jax.device_put, state.params, p_sh,
                          is_leaf=lambda x: hasattr(x, "shape"))

    def shard_opt(node):
        if jax.tree.structure(node) == p_treedef and not hasattr(node, "shape"):
            return jax.tree.map(jax.device_put, node, p_sh)
        children, treedef = jax.tree.flatten(
            node, is_leaf=lambda x: x is not node and (
                hasattr(x, "shape")
                or jax.tree.structure(x) == p_treedef))
        if len(children) == 1 and children[0] is node:   # a bare leaf
            return jax.device_put(node, replicated(mesh)) \
                if hasattr(node, "shape") else node
        return jax.tree.unflatten(treedef, [shard_opt(c) for c in children])

    opt_state = shard_opt(state.opt_state)
    step = jax.device_put(state.step, replicated(mesh))
    return TrainState(params=params, opt_state=opt_state, step=step)


def shard_batch(batch: Dict, mesh) -> Dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
