"""Span-pipeline trainer (pipeline A; reference SATrainer,
modules/train.py:34-538), re-architected for TPU:

* ONE jitted forward+backward per train step — gold span candidates come
  precomputed from the data pipeline (the reference runs extraction forward →
  host span harvesting → a second full forward every step;
  modules/train.py:318-459);
* eval keeps the clean device→host→device seam: jitted extraction →
  host top-k/NMS (eval_span_candidates) → jitted classification;
* frozen-ResNet visual guides are computed once per unique image and cached
  (the reference runs 4 ResNet forwards per step, twice).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_best, save_best, transplant
from ..core.config import Config
from ..eval.metrics import eval_absa
from ..eval.span_decode import RawFinalResult, batch_eval_candidates
from ..nn.bert import BertConfig, xla_attention
from .augment import make_span_augment_fn
from .ingest import GuideCache, pack_and_put   # noqa: F401 (re-exported)
from .optim import build_optimizer
from .steps import (create_train_state, export_params,
                    make_classification_step, make_extraction_step,
                    make_span_eval_loss_step, make_span_loss_fn,
                    make_train_step, replace_params, shard_train_state)

logger = logging.getLogger(__name__)

# batch keys nn.models.span_model_tail reads — the eval-loss pipeline
# retains only these per in-flight batch (see _predict)
_TAIL_BATCH_KEYS = ("start_positions", "end_positions", "adjacency_matrix",
                    "valid_ids", "adj_matrix", "src_mask", "aspect_mask",
                    "polaritys")


class SpanTrainer:
    def __init__(self, cfg: Config, bert_cfg: BertConfig, params, *,
                 train_dataset=None, dev_dataset=None, test_dataset=None,
                 resnet_params=None, writer=None,
                 attention_impl=xla_attention):
        self.cfg = cfg
        self.bert_cfg = bert_cfg
        self.train_dataset = train_dataset
        self.dev_dataset = dev_dataset
        self.test_dataset = test_dataset
        self.writer = writer
        self.attention_impl = attention_impl
        self.last_throughput = 0.0

        # One optimizer step per yielded batch (accumulation splits the batch
        # into micro-batches *inside* the step), and iterate_batches pads the
        # tail to a full batch — so the schedule length is ceil(n/bsz)·epochs
        # with NO division by gradient_accumulation_steps.
        steps_per_epoch = 0
        if train_dataset is not None:
            steps_per_epoch = max(
                -(-len(train_dataset) // cfg.train_batch_size), 1)
        total_steps = max(steps_per_epoch * cfg.num_epochs, 1)
        self.steps_per_epoch = steps_per_epoch

        self.optimizer, self.schedule = build_optimizer(
            params, cfg, total_steps=total_steps, pipeline="span",
            groups_mode=cfg.groups_mode)
        self.state = create_train_state(
            params, self.optimizer,
            params_dtype=jnp.bfloat16 if cfg.params_bf16 else None)

        loss_fn = make_span_loss_fn(cfg, bert_cfg, attention_impl)
        augment_fn = make_span_augment_fn(cfg, bert_cfg, attention_impl) \
            if cfg.do_aug else None
        self.train_step = make_train_step(
            loss_fn, self.optimizer,
            accum_steps=cfg.gradient_accumulation_steps,
            augment_fn=augment_fn, with_grad_norm=cfg.log_grad_norm)
        self.extraction_step = make_extraction_step(cfg, bert_cfg,
                                                    attention_impl)
        self.classification_step = make_classification_step(cfg, bert_cfg)
        self.eval_loss_step = make_span_eval_loss_step(cfg, bert_cfg)

        # SPMD data(-×tensor)-parallel mesh over all devices (reference DDP
        # engagement point, MTVAF_training.py:301-311).  None = single device.
        from ..core.mesh import trainer_meshes
        self.mesh, self.eval_mesh = trainer_meshes(cfg)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        if self.mesh is not None:
            logger.info("SPMD mesh: %s over %d devices (%d processes)",
                        dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape)),
                        self.mesh.devices.size, self.process_count)
        self._shard_state()

        self.guide_cache = None
        if cfg.use_prefix and resnet_params is not None and any(
                d is not None and d.image_store for d in
                (train_dataset, dev_dataset, test_dataset)):
            # The device-resident guide table (bf16 rows gathered on device)
            # engages on bf16 runs — single-device, SPMD meshes AND
            # multi-host (each process keeps its OWN table on its submesh;
            # gathers assemble into the global batch-sharded array — see
            # ingest.GuideCache).  fp32-parity runs keep the host path.
            dev_items = cfg.guide_cache_device_items if cfg.bf16 else 0
            self.guide_cache = GuideCache(
                resnet_params, cfg.resnet_depth,
                max_items=cfg.guide_cache_size,
                cache_dir=os.path.join(cfg.cache_dir, "guides")
                if cfg.cache_dir else None,
                device_items=dev_items, mesh=self.mesh)

        self.best_dev_metric = 0.0
        self.best_dev_epoch = None
        self.best_test_metric = 0.0
        self.best_test_epoch = None
        self.last_train_f1 = None
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def _shard_state(self):
        """(Re-)place params/opt-state on the mesh; call after any state
        replacement (init, resume, best-model reload, transplant)."""
        if self.mesh is not None:
            self.state = shard_train_state(self.state, self.mesh)

    def _eval_params(self):
        if self.eval_mesh is self.mesh or self.eval_mesh is None:
            return self.state.params
        from ..core.mesh import param_sharding
        sh = param_sharding(self.eval_mesh, self.state.params)
        return jax.tree.map(
            lambda x, s: jax.device_put(np.asarray(x), s),
            self.state.params, sh)

    def _attach_guides(self, batch: Dict, dataset, accum: int = 1,
                       for_mesh=GuideCache._UNSET) -> Dict:
        if self.guide_cache is None or dataset.image_store is None:
            return batch
        ids = [dataset.features[i].image_id or ""
               for i in batch["example_index"]]
        main_g, aux_g = self.guide_cache.batch(ids, dataset.image_store,
                                               accum=accum,
                                               for_mesh=for_mesh)
        batch = dict(batch)
        batch["main_guides"] = main_g
        batch["aux_guides"] = aux_g
        return batch

    def _device_batch(self, batch: Dict, accum: int = 1,
                      mesh=None) -> Dict:
        # leaves that are ALREADY device arrays (table-gathered guides, which
        # arrive pre-micro-batched and mesh-sharded) pass through untouched —
        # np.asarray would download them.  example_index is host-side
        # bookkeeping — never shipped.
        drop = ("batch_valid", "example_index")
        out = {k: v if isinstance(v, jax.Array) else np.asarray(v)
               for k, v in batch.items() if k not in drop}
        if accum > 1:
            # micro-batch leading dim for the scan-accumulated step
            out = {k: v if isinstance(v, jax.Array)
                   else v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                   for k, v in out.items()}
        return pack_and_put(out, mesh=mesh,
                            batch_dim=1 if accum > 1 else 0)

    def _should_stop(self) -> bool:
        """Cross-host-agreed preemption decision: SIGTERM delivery is
        per-process, so the flag is all-reduced — every host takes the
        SAME branch (any host signalled → all stop), or the signalled
        host would enter a coordinated checkpoint/exit the others never
        join (distributed deadlock)."""
        from .resume import stop_requested
        flag = stop_requested()
        if self.process_count > 1 and self.mesh is not None:
            from ..core.mesh import cross_host_sum
            flag = float(cross_host_sum(
                np.asarray([1.0 if flag else 0.0]), self.mesh)[0]) > 0
        return flag

    # ------------------------------------------------------------------
    def load_pretrained(self, load_path: str):
        """NER-transplant warm start (reference modules/train.py:495-521)."""
        from ..core.checkpoint import load_torch_file
        source = load_torch_file(load_path)
        self.state = replace_params(
            self.state, transplant(export_params(self.state), source))
        self._shard_state()

    def train(self):
        from ..data.datasets import iterate_batches
        from .profiling import StepProfiler
        from .resume import load_latest_checkpoint, save_epoch_checkpoint
        cfg = self.cfg
        ds = self.train_dataset
        profiler = StepProfiler(cfg.profile_dir, num_steps=cfg.profile_steps)
        NO_HANDLER = object()
        preempt_prev = NO_HANDLER
        if cfg.save_checkpoints and cfg.save_path:
            from .resume import install_preemption_handler
            preempt_prev = install_preemption_handler()
        start_epoch = 1
        if cfg.resume and cfg.save_path:
            state, start_epoch, meta = load_latest_checkpoint(
                cfg.save_path, self.state)
            if state is not None:
                self.state = state
                self._shard_state()
                self.best_dev_metric = meta.get("best_dev_metric", 0.0)
                if "rng" in meta:
                    # exact resume: restore the dropout/augment RNG stream so
                    # a resumed run is bit-identical to an uninterrupted one
                    # (data order is already a pure function of seed+epoch).
                    self.rng = jnp.asarray(meta["rng"], jnp.uint32)
                logger.info("resumed from epoch %d", start_epoch - 1)
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            # Device scalars/arrays are collected and fetched once per epoch:
            # a per-step float() would serialize on a host round-trip (the
            # reference syncs every step — modules/train.py:113).
            step_records = []
            loss_devs = []
            n_examples = 0
            t0 = time.time()
            from ..data.datasets import prefetch
            def host_to_device():
                # guide-cache fills AND the host→device transfer run in the
                # prefetch thread, overlapping the previous step's compute.
                for b in iterate_batches(
                        ds.arrays, cfg.train_batch_size, shuffle=True,
                        seed=cfg.seed, epoch=epoch,
                        process_index=self.process_index,
                        process_count=self.process_count):
                    b = self._attach_guides(
                        b, ds, accum=cfg.gradient_accumulation_steps)
                    valid = b.pop("batch_valid")
                    dev = self._device_batch(
                        b, cfg.gradient_accumulation_steps, mesh=self.mesh)
                    yield b, valid, dev

            # One key per epoch; the step folds in state.step internally
            # (steps.single_step) so no per-step host dispatch is needed.
            # --deterministic: no RNG → every dropout site is a no-op.
            epoch_rng = None if cfg.deterministic else \
                jax.random.fold_in(self.rng, epoch)
            for batch, valid, dev_batch in prefetch(host_to_device()):
                profiler.step_begin()
                self.state, metrics = self.train_step(self.state, dev_batch,
                                                      epoch_rng)
                profiler.step_end()
                loss_devs.append((metrics["loss"],
                                  metrics.get("grad_norm")))
                n_examples += int(valid.sum())
                # Guides (possibly device-resident, ~4 MB/batch) are not
                # needed for metrics — holding them for a whole epoch would
                # pin O(steps) HBM.  Multi-host: each process fetches only
                # ITS rows of the logits and the match counts are
                # cross-host summed below.
                rec = {k: v for k, v in batch.items()
                       if k not in ("main_guides", "aux_guides")}
                step_records.append((rec, valid,
                                     metrics.get("ac_logits")))

            n_steps = len(loss_devs)
            from ..core.mesh import epoch_scalar_sum, fetch_rows_stacked
            epoch_loss = epoch_scalar_sum([l for l, _ in loss_devs])
            if cfg.log_grad_norm and self.writer and n_steps:
                self.writer.add_scalar(
                    "grad_norm",
                    epoch_scalar_sum([g for _, g in loss_devs]) / n_steps,
                    epoch)

            # Train-metric collection (reference modules/train.py:122-130):
            # all step logits in ONE stacked fetch (multi-host: pooled
            # per-step local-row fetches) — core.mesh.fetch_rows_stacked
            ac_np = fetch_rows_stacked([r[2] for r in step_records])
            from ..core.mesh import align_local_rows
            all_results = []
            for (batch, valid, _), ac in zip(step_records, ac_np):
                if ac is not None:
                    ac = align_local_rows(ac, len(batch["example_index"]),
                                          cfg.gradient_accumulation_steps,
                                          self.process_index)
                ac_pred = ac.argmax(axis=-1) if ac is not None else None
                for j_idx, ex_idx in enumerate(batch["example_index"]):
                    if not valid[j_idx]:
                        continue
                    feature = ds.features[int(ex_idx)]
                    cls = ac_pred[j_idx] if ac_pred is not None \
                        else batch["span_labels"][j_idx]
                    all_results.append(RawFinalResult(
                        unique_id=feature.unique_id,
                        start_indexes=list(batch["span_starts"][j_idx]),
                        end_indexes=list(batch["span_ends"][j_idx]),
                        cls_pred=list(cls),
                        span_masks=list(batch["span_masks"][j_idx])))

            metrics_out, nbest = eval_absa(
                ds.examples, ds.features, all_results, cfg.do_lower_case,
                allow_missing=self.process_count > 1)
            if self.process_count > 1 and self.mesh is not None:
                # global train metrics from per-host match counts (one
                # host-level all-reduce; the reference's DDP reports
                # rank-local train F1 instead)
                from ..core.mesh import cross_host_sum
                c, rt, rl = map(float, cross_host_sum(
                    np.asarray([metrics_out["common"],
                                metrics_out["retrieved"],
                                metrics_out["relevant"]]), self.mesh))
                p = c / rt if rt > 0 else 0.0
                r = c / rl if rl > 0 else 0.0
                metrics_out = {
                    "p": p, "r": r,
                    "f1": 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0,
                    "common": c, "retrieved": rt, "relevant": rl}
            # per-epoch throughput (matches CrfTrainer; a cumulative rate
            # buries the steady state under epoch-1 compile time)
            self.last_train_f1 = metrics_out["f1"]
            self.last_throughput = n_examples / max(time.time() - t0, 1e-9)
            logger.info("epoch %d train loss %.5f f1 %.4f (%.1f ex/s)",
                        epoch, epoch_loss / max(n_steps, 1),
                        metrics_out["f1"], self.last_throughput)
            if self.writer:
                self.writer.add_scalar("train_loss",
                                       epoch_loss / max(n_steps, 1), epoch)
                self.writer.add_scalar("train_f1", metrics_out["f1"], epoch)
            if cfg.save_path and self.process_index == 0:
                # multi-host: process 0's rows only (PARITY.md deviation
                # #12); train F1 above is still global
                self._write_json(nbest, "train_predictions.json")
            if epoch >= cfg.eval_begin_epoch:
                self.evaluate(epoch)
            stopping = self._should_stop()
            if cfg.save_checkpoints and cfg.save_path \
                    and (epoch % cfg.checkpoint_every == 0 or stopping):
                save_epoch_checkpoint(
                    cfg.save_path, self.state, epoch,
                    {"best_dev_metric": self.best_dev_metric,
                     "rng": np.asarray(self.rng).tolist()})
            if stopping:
                # graceful preemption: epoch-boundary checkpoint written
                # above; --resume continues bit-identically from here
                logger.info("preemption: stopping after epoch %d", epoch)
                break
        if cfg.save_checkpoints:
            from ..core.checkpoint import wait_for_checkpoints
            wait_for_checkpoints()   # background writes land before return
        if preempt_prev is not NO_HANDLER:
            from .resume import uninstall_preemption_handler
            uninstall_preemption_handler(preempt_prev)
        return self.best_dev_metric

    # ------------------------------------------------------------------
    def _predict(self, dataset, window: int = 4, compute_loss: bool = False):
        """Eval loop: extraction → host candidates/NMS → classification.

        With ``compute_loss`` the classification dispatch is replaced
        one-for-one by the eval-loss step, which additionally returns the
        reference's logged eval loss — the full-forward loss on the
        eval-branch candidates (modules/train.py:197-199, 295-305) — and
        the return value becomes ``(results, mean_batch_loss)``.  Like the
        reference, the logged loss is a mean of per-batch means; a padded
        tail batch is SLICED to its valid rows first (one extra compile at
        the tail shape), so on eval sets not divisible by eval_batch_size
        the trajectory still matches the reference's smaller last
        DataLoader batch exactly.

        The device→host seam is pipelined TWO stages deep: extractions for
        the next batches are dispatched (window deep) while the host runs
        NMS on the current one, and classification results are fetched a
        window behind their dispatch.  Device→host fetches run in a small
        thread pool (futures consumed in dispatch order — results stay
        deterministic): on latency-bound backends (the tunneled axon TPU
        pays ~25 ms per RPC) the transfers overlap each other AND the host
        NMS work, so the main thread only ever blocks on an already-arrived
        array."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..data.datasets import iterate_batches
        cfg = self.cfg
        rows = []               # (batch_index, [RawFinalResult...], loss)
        pending_ext = deque()   # dispatched extractions (fetch futures)
        pending_cls = deque()   # dispatched classifications (fetch futures)
        eval_params = self._eval_params()
        # Multi-host: eval batches shard round-robin over processes (each
        # host runs ~1/P of the set on its host-local mesh); the per-batch
        # results/losses are all-gathered and re-ordered afterwards so every
        # host ends with the complete, identical result list.
        shard = self.process_count > 1 and self.mesh is not None

        with ThreadPoolExecutor(max_workers=4) as fetcher:

            def harvest_one():
                """Take one extraction, run host NMS, dispatch classify."""
                bi, batch, valid, se_fut, ext, gcn, dev_batch = \
                    pending_ext.popleft()
                se_np = se_fut.result()               # one fetch: (2, B, S)
                ss, se, labels, masks = batch_eval_candidates(
                    dataset.examples, dataset.features,
                    batch["example_index"], se_np[0], se_np[1], cfg)
                if compute_loss:
                    pack = np.stack([ss, se, labels, masks])
                    n = int(np.asarray(valid).sum())
                    loss_batch, ext_t = dev_batch, ext
                    if n < len(valid):
                        # tail batch: drop the padding rows so the logged
                        # loss is over exactly the rows the reference's
                        # smaller last DataLoader batch sees (one extra
                        # compile at the tail shape, once per run)
                        loss_batch = {k: v[:n] for k, v in dev_batch.items()}
                        ext_t = tuple(None if t is None else t[:n]
                                      for t in ext)
                        pack = pack[:, :n]
                    # padding rows sit at the TAIL (datasets.iterate_batches
                    # valid_mask), so the sliced ac_logits still covers
                    # every valid row finish_one will read.  The candidate
                    # pack ships via ASYNC device_put (jnp.asarray): in this
                    # PIPELINED loop the transfer overlaps the host NMS of
                    # the next batches, measured +15%% over passing host
                    # numpy into the jitted call (which transfers
                    # synchronously on the dispatching thread: 914 vs
                    # 771-825 ex/s seam rate).  The opposite holds for the
                    # serving predictors' one-shot dispatch (infer.py),
                    # where the packed jit-arg path wins — don't unify them
                    ac_logits, loss = self.eval_loss_step(
                        eval_params, loss_batch, ext_t[2], ext_t[0],
                        ext_t[1], ext_t[3], jnp.asarray(pack, jnp.int32))
                    fut = fetcher.submit(jax.device_get, (ac_logits, loss))
                elif gcn is not None:
                    # DiGCN eval: re-encode before the span gather
                    # (reference models/bert_model.py:270-284)
                    pairs = jnp.asarray(np.stack([ss, se]), jnp.int32)
                    ac_logits = self.classification_step(
                        eval_params, ext[2], pairs, gcn[0], gcn[1])
                    fut = fetcher.submit(np.asarray, ac_logits)
                else:
                    pairs = jnp.asarray(np.stack([ss, se]), jnp.int32)
                    ac_logits = self.classification_step(eval_params, ext[2],
                                                         pairs)
                    fut = fetcher.submit(np.asarray, ac_logits)
                pending_cls.append((bi, batch, valid, ss, se, masks,
                                    fut))

            def finish_one():
                bi, batch, valid, ss, se, masks, ac_fut = \
                    pending_cls.popleft()
                ac_np = ac_fut.result()
                loss = None
                if compute_loss:
                    ac_np, loss_np = ac_np
                    loss = float(loss_np)
                res = []
                for j, ex_idx in enumerate(batch["example_index"]):
                    if not valid[j]:
                        continue
                    feature = dataset.features[int(ex_idx)]
                    res.append(RawFinalResult(
                        unique_id=feature.unique_id, start_indexes=ss[j],
                        end_indexes=se[j],
                        cls_pred=list(ac_np[j].argmax(axis=-1)),
                        span_masks=masks[j]))
                rows.append((bi, res, loss))

            for bi, batch in enumerate(
                    iterate_batches(dataset.arrays, cfg.eval_batch_size)):
                if shard and bi % self.process_count != self.process_index:
                    continue
                batch = self._attach_guides(batch, dataset,
                                            for_mesh=self.eval_mesh)
                valid = batch.pop("batch_valid")
                dev_batch = self._device_batch(batch, mesh=self.eval_mesh)
                s_logits, e_logits, seq, captured = self.extraction_step(
                    eval_params, dev_batch)
                gcn = None
                if cfg.gcn_layer_number > 0:
                    # adjacency may be absent (the CLI silently drops a
                    # missing GCN side file); classify_gcn treats a None
                    # adjacency as "skip the re-encode", like the train path
                    gcn = (dev_batch.get("valid_ids"),
                           dev_batch.get("adjacency_matrix"))
                # retain only the keys span_model_tail reads — holding the
                # full dev_batch (incl. visual guides) for `window` in-flight
                # batches would raise the eval HBM watermark for nothing
                loss_batch = {k: v for k, v in dev_batch.items()
                              if k in _TAIL_BATCH_KEYS} if compute_loss \
                    else None
                pending_ext.append(
                    (bi, batch, valid,
                     fetcher.submit(np.asarray,
                                    jnp.stack([s_logits, e_logits])),
                     (s_logits, e_logits, seq, captured), gcn, loss_batch))
                if len(pending_ext) > window:
                    harvest_one()
                while len(pending_cls) > window:
                    finish_one()
            while pending_ext:
                harvest_one()
            while pending_cls:
                finish_one()
        if shard:
            from ..core.mesh import cross_host_gather
            rows = [r for part in cross_host_gather(rows, self.mesh)
                    for r in part]
        rows.sort(key=lambda r: r[0])
        all_results = [r for _, res, _ in rows for r in res]
        if compute_loss:
            losses = [l for _, _, l in rows if l is not None]
            return all_results, sum(losses) / max(len(losses), 1)
        return all_results

    def evaluate(self, epoch: int) -> float:
        cfg = self.cfg
        results, dev_loss = self._predict(self.dev_dataset,
                                          compute_loss=True)
        metrics, nbest = eval_absa(self.dev_dataset.examples,
                                   self.dev_dataset.features, results,
                                   cfg.do_lower_case)
        f1 = metrics["f1"]
        logger.info("epoch %d dev f1 %.4f loss %.4f p %.4f r %.4f", epoch,
                    f1, dev_loss, metrics["p"], metrics["r"])
        if self.writer:
            self.writer.add_scalar("dev_f1", f1, epoch)
            self.writer.add_scalar("dev_loss", dev_loss, epoch)
        if f1 >= self.best_dev_metric:
            self.best_dev_metric = f1
            self.best_dev_epoch = epoch
            if cfg.save_path:
                save_best(os.path.join(cfg.save_path, "best_model.npz"),
                          export_params(self.state))
        if cfg.save_path:
            self._write_json(nbest, "dev_predictions.json")
        return f1

    def test(self, load_best_model: bool = True) -> float:
        cfg = self.cfg
        if load_best_model and cfg.save_path:
            best = os.path.join(cfg.save_path, "best_model.npz")
            if os.path.exists(best):
                self.state = replace_params(
                    self.state, load_best(best, export_params(self.state)))
                self._shard_state()
        results, test_loss = self._predict(self.test_dataset,
                                           compute_loss=True)
        metrics, nbest = eval_absa(self.test_dataset.examples,
                                   self.test_dataset.features, results,
                                   cfg.do_lower_case)
        logger.info("test f1 %.4f loss %.4f p %.4f r %.4f", metrics["f1"],
                    test_loss, metrics["p"], metrics["r"])
        if self.writer:
            self.writer.add_scalar("test_f1", metrics["f1"])
            self.writer.add_scalar("test_loss", test_loss)
        if cfg.save_path:
            self._write_json(nbest, "test_predictions.json")
        if metrics["f1"] >= self.best_test_metric:
            self.best_test_metric = metrics["f1"]
        return metrics["f1"]

    def _write_json(self, obj, name: str):
        os.makedirs(self.cfg.save_path, exist_ok=True)
        with open(os.path.join(self.cfg.save_path, name), "w") as f:
            f.write(json.dumps(obj, indent=4) + "\n")
