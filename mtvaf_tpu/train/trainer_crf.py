"""CRF-pipeline trainer (pipeline B; reference SATrainer2,
modules/train.py:541-987), TPU-native:

* one jitted forward/backward per step; the CRF NLL runs on device; when
  train metrics are collected the Viterbi decode is FUSED into the same
  program (the reference decodes inside every forward, returning Python
  lists — models/bert_model.py:511) so each step is a single dispatch;
* frozen-ResNet guides cached per image; the ANP (VAO) loss shares the
  encoded prefix activations with the KV construction.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_best, save_best, transplant
from ..core.config import CRF_LABEL_LIST, Config
from ..eval.metrics import eval_json
from ..eval.tagging import (classification_report, entity_counts,
                            labels_to_tags, scores_from_counts,
                            tagging_scores)
from ..nn.bert import BertConfig, xla_attention
from ..core.mesh import trainer_meshes
from .ingest import GuideCache, pack_and_put
from .optim import build_optimizer
from .steps import (create_train_state, export_params,
                    make_crf_decode_step, make_crf_loss_fn,
                    make_train_step, replace_params, shard_train_state)

logger = logging.getLogger(__name__)


class CrfTrainer:
    def __init__(self, cfg: Config, bert_cfg: BertConfig, params, *,
                 train_dataset=None, dev_dataset=None, test_dataset=None,
                 resnet_params=None, writer=None,
                 attention_impl=xla_attention, collect_train_metrics=True):
        self.cfg = cfg
        self.bert_cfg = bert_cfg
        self.train_dataset = train_dataset
        self.dev_dataset = dev_dataset
        self.test_dataset = test_dataset
        self.writer = writer
        self.collect_train_metrics = collect_train_metrics

        # 1-indexed label map, 0 = PAD (reference MTVAF_training.py:369).
        self.label_map = {label: i for i, label in
                          enumerate(CRF_LABEL_LIST, 1)}
        self.inv_label_map = {i: l for l, i in self.label_map.items()}
        self.inv_label_map[0] = "PAD"

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
            params, cfg, total_steps=total_steps, pipeline="crf",
            groups_mode=cfg.groups_mode)
        self.state = create_train_state(
            params, self.optimizer,
            params_dtype=jnp.bfloat16 if cfg.params_bf16 else None)

        # Viterbi decode fused into the train program when train metrics are
        # collected — one dispatch per step instead of two (the reference
        # decodes inside every train forward, models/bert_model.py:511).
        loss_fn = make_crf_loss_fn(cfg, bert_cfg, attention_impl,
                                   with_decode=collect_train_metrics)
        self.train_step = make_train_step(
            loss_fn, self.optimizer,
            accum_steps=cfg.gradient_accumulation_steps,
            with_grad_norm=cfg.log_grad_norm)
        self.decode_step = make_crf_decode_step(cfg, bert_cfg, attention_impl)

        # SPMD data(-×tensor)-parallel mesh over all devices (reference DDP
        # engagement point, MTVAF_training.py:301-311).  None = single device.
        self.mesh, self.eval_mesh = trainer_meshes(cfg)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()

        self.guide_cache = None
        if cfg.use_prefix and resnet_params is not None and any(
                d is not None and d.image_store for d in
                (train_dataset, dev_dataset, test_dataset)):
            # Device-resident guide table on bf16 runs — single-device,
            # SPMD meshes AND multi-host (see ingest.GuideCache: the table
            # replicates over the mesh — or lives per-host on the process's
            # submesh — and the gather emits batch-sharded arrays); host
            # path for fp32-parity runs.
            dev_items = cfg.guide_cache_device_items if cfg.bf16 else 0
            self.guide_cache = GuideCache(
                resnet_params, cfg.resnet_depth,
                max_items=cfg.guide_cache_size,
                cache_dir=os.path.join(cfg.cache_dir, "guides")
                if cfg.cache_dir else None,
                device_items=dev_items, mesh=self.mesh)
        if self.mesh is not None:
            logger.info("SPMD mesh: %s over %d devices (%d processes)",
                        dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape)),
                        self.mesh.devices.size, self.process_count)
        self._shard_state()

        self.best_dev_metric = 0.0
        self.best_dev_epoch = None
        self.best_test_metric = 0.0
        self.best_test_epoch = None
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.last_throughput = 0.0
        self.last_train_f1 = None

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
        ids = [dataset.features[i].img_id for i in batch["example_index"]]
        main_g, aux_g = self.guide_cache.batch(ids, dataset.image_store,
                                               accum=accum,
                                               for_mesh=for_mesh)
        batch = dict(batch)
        batch["main_guides"] = main_g
        batch["aux_guides"] = aux_g
        return batch

    def _device_batch(self, batch: Dict, accum: int = 1, mesh=None) -> Dict:
        drop = ("batch_valid", "auxlabel_ids", "example_index")
        # leaves that are ALREADY device arrays (table-gathered guides,
        # pre-micro-batched and mesh-sharded) pass through untouched —
        # np.asarray would download them.
        out = {k: v if isinstance(v, jax.Array) else np.asarray(v)
               for k, v in batch.items() if k not in drop}
        if accum > 1:
            # micro-batch leading dim for the scan-accumulated step
            out = {k: v if isinstance(v, jax.Array)
                   else v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                   for k, v in out.items()}
        return pack_and_put(out, mesh=mesh,
                            batch_dim=1 if accum > 1 else 0)

    def load_pretrained(self, load_path: str):
        from ..core.checkpoint import load_torch_file
        source = load_torch_file(load_path)
        self.state = replace_params(
            self.state, transplant(export_params(self.state), source))
        self._shard_state()

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

    def _cross_host_counts(self, counts):
        """Sum per-host entity counts over all processes (fixed type
        inventory from the label list so every host reduces the same
        vector)."""
        from ..core.mesh import cross_host_sum
        types = sorted({lab[2:] for lab in CRF_LABEL_LIST
                        if lab[:2] in ("B-", "I-")})
        vec = np.asarray([[counts[t][k] for k in ("correct", "pred", "gold")]
                          for t in types], np.float32)
        vec = cross_host_sum(vec, self.mesh)
        return {t: {"correct": int(row[0]), "pred": int(row[1]),
                    "gold": int(row[2])} for t, row in zip(types, vec)}

    # ------------------------------------------------------------------
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
                self.best_test_metric = meta.get("best_test_metric", 0.0)
                if "rng" in meta:
                    # exact resume: restore the dropout RNG stream so a
                    # resumed run is bit-identical to an uninterrupted one
                    # (data order is already a pure function of seed+epoch).
                    self.rng = jnp.asarray(meta["rng"], jnp.uint32)
                logger.info("resumed from epoch %d", start_epoch - 1)
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            # Device results are collected and fetched once per epoch — a
            # per-step float()/np.asarray would serialize on host round-trips
            # (the reference syncs every step — modules/train.py:618,627).
            y_true, y_pred = [], []
            loss_devs, step_records = [], []
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

                if self.collect_train_metrics and "pred_tags" in metrics:
                    # Viterbi ran inside the train program (fused decode);
                    # tags stay on device until the pooled epoch-end fetch
                    # (multi-host: each process fetches only ITS rows and the
                    # entity counts are cross-host summed below).  Guides
                    # (possibly device-resident) are dropped from the record
                    # — holding them for a whole epoch would pin O(steps)
                    # HBM.
                    rec = {k: v for k, v in batch.items()
                           if k not in ("main_guides", "aux_guides")}
                    step_records.append((rec, valid,
                                         metrics["pred_tags"]))

            n_steps = len(loss_devs)
            from ..core.mesh import epoch_scalar_sum, fetch_rows_stacked
            epoch_loss = epoch_scalar_sum([l for l, _ in loss_devs])
            if cfg.log_grad_norm and self.writer and n_steps:
                self.writer.add_scalar(
                    "grad_norm",
                    epoch_scalar_sum([g for _, g in loss_devs]) / n_steps,
                    epoch)
            # all step tags in ONE stacked fetch (multi-host: pooled
            # per-step local-row fetches) — see core.mesh.fetch_rows_stacked
            tags_np = fetch_rows_stacked([t for _, _, t in step_records])
            from ..core.mesh import align_local_rows
            for (batch, valid, _), tags in zip(step_records, tags_np):
                tags = align_local_rows(tags, len(batch["label_ids"]),
                                        cfg.gradient_accumulation_steps,
                                        self.process_index)
                yt, yp = labels_to_tags(
                    batch["label_ids"], batch["input_mask"],
                    self.inv_label_map, tags)
                for j in range(len(yt)):
                    if valid[j]:
                        y_true.append(yt[j])
                        y_pred.append(yp[j])

            dt = time.time() - t0
            self.last_throughput = n_examples / dt if dt > 0 else 0.0
            counts = entity_counts(y_true, y_pred)
            if self.process_count > 1 and self.mesh is not None \
                    and self.collect_train_metrics:
                # combine per-host entity counts into GLOBAL train metrics
                # (one host-level all-reduce; the reference's DDP instead
                # reports rank-local train F1)
                counts = self._cross_host_counts(counts)
            if any(any(c.values()) for c in counts.values()):
                scores = scores_from_counts(counts)
                f1 = scores["micro"]["f1"]
                self.last_train_f1 = f1
                logger.info("epoch %d train loss %.5f f1 %.4f (%.1f ex/s)",
                            epoch, epoch_loss / max(n_steps, 1), f1,
                            self.last_throughput)
                if self.writer:
                    self.writer.add_scalar("train_f1", f1, epoch)
            else:
                logger.info("epoch %d train loss %.5f (%.1f ex/s)", epoch,
                            epoch_loss / max(n_steps, 1), self.last_throughput)
            if self.writer:
                self.writer.add_scalar("train_loss",
                                       epoch_loss / max(n_steps, 1), epoch)
            if epoch >= cfg.eval_begin_epoch:
                self.evaluate(epoch)
                self.test(epoch)
            stopping = self._should_stop()
            if cfg.save_checkpoints and cfg.save_path \
                    and (epoch % cfg.checkpoint_every == 0 or stopping):
                save_epoch_checkpoint(
                    cfg.save_path, self.state, epoch,
                    {"best_dev_metric": self.best_dev_metric,
                     "best_test_metric": self.best_test_metric,
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
    def _predict(self, dataset):
        from ..data.datasets import iterate_batches, prefetch
        cfg = self.cfg
        # Dispatch all batches first (device results fetched after the loop —
        # a per-step float() would serialize on host round-trips).
        from concurrent.futures import ThreadPoolExecutor
        records = []
        eval_params = self._eval_params()
        # Multi-host: eval batches are SHARDED round-robin over processes
        # (each host decodes ~1/P of the set on its host-local mesh) and the
        # per-batch rows/losses are all-gathered afterwards, so every host
        # still ends with the complete, identically-ordered predictions —
        # same determinism as the old evaluate-everything-everywhere design
        # at 1/P of the device work.
        shard = self.process_count > 1 and self.mesh is not None
        batches = prefetch(
            ((bi, self._attach_guides(b, dataset, for_mesh=self.eval_mesh))
             for bi, b in enumerate(
                 iterate_batches(dataset.arrays, cfg.eval_batch_size))
             if not shard or bi % self.process_count == self.process_index))
        # Fetches run in a thread pool (one device_get per record, loss+tags
        # together) so the per-record host round-trips overlap — on the
        # tunneled axon backend each RPC costs ~25 ms; futures are consumed
        # in dispatch order so results are deterministic.
        with ThreadPoolExecutor(max_workers=4) as fetcher:
            for bi, batch in batches:
                valid = batch.pop("batch_valid")
                dev_batch = self._device_batch(batch, mesh=self.eval_mesh)
                n = int(np.asarray(valid).sum())
                if n < len(valid):
                    # tail batch: slice off the padding rows (device-side,
                    # AFTER the packed/sharded placement) so the logged loss
                    # is over exactly the rows the reference's smaller last
                    # DataLoader batch sees — one extra compile at the tail
                    # shape, once per run; padding sits at the tail
                    # (datasets.iterate_batches)
                    dev_batch = {k: v[:n] for k, v in dev_batch.items()}
                    batch = {k: v[:n] for k, v in batch.items()}
                    valid = valid[:n]
                out = self.decode_step(eval_params, dev_batch)
                records.append((bi, batch, valid, fetcher.submit(
                    jax.device_get, (out["loss"], out["pred_tags"]))))

            rows = []            # (batch_index, y_true, y_pred, loss)
            for bi, batch, valid, fut in records:
                loss_np, tags_np = fut.result()
                yt, yp = labels_to_tags(batch["label_ids"],
                                        batch["input_mask"],
                                        self.inv_label_map, tags_np)
                keep = [j for j in range(len(yt)) if valid[j]]
                rows.append((bi, [yt[j] for j in keep],
                             [yp[j] for j in keep], float(loss_np)))
        if shard:
            from ..core.mesh import cross_host_gather
            rows = [r for part in cross_host_gather(rows, self.mesh)
                    for r in part]
            rows.sort(key=lambda r: r[0])
        y_true = [t for _, yt, _, _ in rows for t in yt]
        y_pred = [p for _, _, yp, _ in rows for p in yp]
        total_loss = sum(r[3] for r in rows)
        return y_true, y_pred, total_loss / max(len(rows), 1)

    def evaluate(self, epoch: int) -> float:
        cfg = self.cfg
        y_true, y_pred, loss = self._predict(self.dev_dataset)
        report = classification_report(y_true, y_pred, digits=4)
        f1 = tagging_scores(y_true, y_pred)["micro"]["f1"]
        logger.info("epoch %d dev f1 %.4f loss %.4f\n%s", epoch, f1, loss,
                    report)
        if self.writer:
            self.writer.add_scalar("dev_f1", f1, epoch)
            self.writer.add_scalar("dev_loss", loss, epoch)
        if f1 >= self.best_dev_metric:
            self.best_dev_metric = f1
            self.best_dev_epoch = epoch
            if cfg.save_path:
                save_best(os.path.join(cfg.save_path, "best_model.npz"),
                          export_params(self.state))
                nbest, errors = eval_json(self.dev_dataset.examples, y_true,
                                          y_pred)
                self._write_json(nbest, "dev_predictions.json")
                self._write_json(errors, "error_dev.json")
        return f1

    def test(self, epoch: int, load_best_model: bool = False) -> float:
        cfg = self.cfg
        if load_best_model and cfg.save_path:
            best = os.path.join(cfg.save_path, "best_model.npz")
            if os.path.exists(best):
                self.state = replace_params(
                    self.state, load_best(best, export_params(self.state)))
                self._shard_state()
        y_true, y_pred, loss = self._predict(self.test_dataset)
        f1 = tagging_scores(y_true, y_pred)["micro"]["f1"]
        logger.info("epoch %s test f1 %.4f loss %.4f", epoch, f1, loss)
        if self.writer:
            self.writer.add_scalar("test_f1", f1)
            self.writer.add_scalar("test_loss", loss)
        if f1 >= self.best_test_metric:
            self.best_test_metric = f1
            self.best_test_epoch = epoch
            if cfg.save_path:
                nbest, errors = eval_json(self.test_dataset.examples, y_true,
                                          y_pred)
                self._write_json(nbest, "test_predictions.json")
                self._write_json(errors, "error_test.json")
        return f1

    def _write_json(self, obj, name: str):
        os.makedirs(self.cfg.save_path, exist_ok=True)
        with open(os.path.join(self.cfg.save_path, name), "w") as f:
            f.write(json.dumps(obj, indent=4) + "\n")
