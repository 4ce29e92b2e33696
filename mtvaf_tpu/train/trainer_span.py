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
from ..nn.models import compute_visual_guides
from .augment import make_span_augment_fn
from .optim import build_optimizer
from .steps import (TrainState, create_train_state, make_classification_step,
                    make_extraction_step, make_span_loss_fn, make_train_step)

logger = logging.getLogger(__name__)


class GuideCache:
    """Per-image cache of frozen-ResNet stage guides."""

    def __init__(self, resnet_params, depth: int, image_store):
        self.store = image_store
        self._guide_fn = jax.jit(
            lambda imgs, aux: compute_visual_guides(resnet_params, imgs, aux,
                                                    depth=depth))
        self._cache: Dict[str, tuple] = {}

    def batch(self, image_ids):
        missing = [i for i in dict.fromkeys(image_ids) if i not in self._cache]
        if missing:
            main, aux = self.store.batch(missing, with_aux=True)
            mg, ag = self._guide_fn(jnp.asarray(main), jnp.asarray(aux))
            mg, ag = np.asarray(mg), np.asarray(ag)
            for j, img in enumerate(missing):
                self._cache[img] = (mg[j], ag[j])
        main_g = np.stack([self._cache[i][0] for i in image_ids])
        aux_g = np.stack([self._cache[i][1] for i in image_ids])
        return main_g, aux_g


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

        steps_per_epoch = 0
        if train_dataset is not None:
            steps_per_epoch = max(
                len(train_dataset) // cfg.train_batch_size, 1)
        total_steps = max(steps_per_epoch * cfg.num_epochs //
                          cfg.gradient_accumulation_steps, 1)
        self.steps_per_epoch = steps_per_epoch

        self.optimizer, self.schedule = build_optimizer(
            params, cfg, total_steps=total_steps, pipeline="span")
        self.state = create_train_state(params, self.optimizer)

        loss_fn = make_span_loss_fn(cfg, bert_cfg, attention_impl)
        augment_fn = make_span_augment_fn(cfg, bert_cfg, attention_impl) \
            if cfg.do_aug else None
        self.train_step = make_train_step(
            loss_fn, self.optimizer,
            accum_steps=cfg.gradient_accumulation_steps,
            augment_fn=augment_fn)
        self.extraction_step = make_extraction_step(cfg, bert_cfg,
                                                    attention_impl)
        self.classification_step = make_classification_step(cfg, bert_cfg)

        self.guide_cache = None
        if cfg.use_prefix and resnet_params is not None and \
                train_dataset is not None and train_dataset.image_store:
            self.guide_cache = GuideCache(resnet_params, cfg.resnet_depth,
                                          train_dataset.image_store)

        self.best_dev_metric = 0.0
        self.best_dev_epoch = None
        self.best_test_metric = 0.0
        self.best_test_epoch = None
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def _attach_guides(self, batch: Dict, dataset) -> Dict:
        if self.guide_cache is None:
            return batch
        ids = [dataset.features[i].image_id or ""
               for i in batch["example_index"]]
        main_g, aux_g = self.guide_cache.batch(ids)
        batch = dict(batch)
        batch["main_guides"] = main_g
        batch["aux_guides"] = aux_g
        return batch

    def _device_batch(self, batch: Dict, accum: int = 1) -> Dict:
        out = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "batch_valid"}
        if accum > 1:
            # micro-batch leading dim for the scan-accumulated step
            out = {k: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                   for k, v in out.items()}
        return out

    # ------------------------------------------------------------------
    def load_pretrained(self, load_path: str):
        """NER-transplant warm start (reference modules/train.py:495-521)."""
        from ..core.checkpoint import load_torch_file
        source = load_torch_file(load_path)
        self.state = self.state._replace(
            params=transplant(self.state.params, source))

    def train(self):
        from ..data.datasets import iterate_batches
        from .profiling import StepProfiler
        from .resume import load_latest_checkpoint, save_epoch_checkpoint
        cfg = self.cfg
        ds = self.train_dataset
        profiler = StepProfiler(cfg.profile_dir, num_steps=cfg.profile_steps)
        t_start = time.time()
        n_examples = 0
        start_epoch = 1
        if cfg.resume and cfg.save_path:
            state, start_epoch, meta = load_latest_checkpoint(
                cfg.save_path, self.state)
            if state is not None:
                self.state = state
                self.best_dev_metric = meta.get("best_dev_metric", 0.0)
                logger.info("resumed from epoch %d", start_epoch - 1)
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            # Device scalars/arrays are collected and fetched once per epoch:
            # a per-step float() would serialize on a host round-trip (the
            # reference syncs every step — modules/train.py:113).
            step_records = []
            loss_devs = []
            from ..data.datasets import prefetch
            batches = prefetch(
                (self._attach_guides(b, ds) for b in iterate_batches(
                    ds.arrays, cfg.train_batch_size, shuffle=True,
                    seed=cfg.seed, epoch=epoch)))
            for batch in batches:
                valid = batch.pop("batch_valid")
                dev_batch = self._device_batch(
                    batch, cfg.gradient_accumulation_steps)
                self.rng, step_rng = jax.random.split(self.rng)
                profiler.step_begin()
                self.state, metrics = self.train_step(self.state, dev_batch,
                                                      step_rng)
                profiler.step_end()
                loss_devs.append(metrics["loss"])
                n_examples += int(valid.sum())
                step_records.append((batch, valid, metrics.get("ac_logits")))

            n_steps = len(loss_devs)
            epoch_loss = float(np.sum([np.asarray(l) for l in loss_devs]))

            # Train-metric collection (reference modules/train.py:122-130)
            all_results = []
            for batch, valid, ac_logits in step_records:
                ac_pred = np.asarray(ac_logits).argmax(axis=-1) \
                    if ac_logits is not None else None
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

            metrics_out, nbest = eval_absa(ds.examples, ds.features,
                                           all_results, cfg.do_lower_case)
            logger.info("epoch %d train loss %.5f f1 %.4f (%.1f ex/s)",
                        epoch, epoch_loss / max(n_steps, 1),
                        metrics_out["f1"],
                        n_examples / (time.time() - t_start))
            if self.writer:
                self.writer.add_scalar("train_loss",
                                       epoch_loss / max(n_steps, 1), epoch)
                self.writer.add_scalar("train_f1", metrics_out["f1"], epoch)
            if cfg.save_path:
                self._write_json(nbest, "train_predictions.json")
            if epoch >= cfg.eval_begin_epoch:
                self.evaluate(epoch)
            if cfg.save_checkpoints and cfg.save_path:
                save_epoch_checkpoint(
                    cfg.save_path, self.state, epoch,
                    {"best_dev_metric": self.best_dev_metric})
        return self.best_dev_metric

    # ------------------------------------------------------------------
    def _predict(self, dataset, window: int = 4) -> list:
        """Eval loop: extraction → host candidates/NMS → classification.

        The device→host seam is pipelined: extractions for the next batches
        are dispatched (window deep) while the host runs NMS on the current
        one, so the TPU never idles on the text work."""
        from collections import deque

        from ..data.datasets import iterate_batches
        cfg = self.cfg
        all_results = []
        pending = deque()

        def drain_one():
            batch, valid, s_logits, e_logits, seq = pending.popleft()
            s_np, e_np = np.asarray(s_logits), np.asarray(e_logits)
            ss, se, labels, masks = batch_eval_candidates(
                dataset.examples, dataset.features, batch["example_index"],
                s_np, e_np, cfg)
            ac_logits = self.classification_step(
                self.state.params, seq, jnp.asarray(ss, jnp.int32),
                jnp.asarray(se, jnp.int32))
            ac_np = np.asarray(ac_logits)
            for j, ex_idx in enumerate(batch["example_index"]):
                if not valid[j]:
                    continue
                feature = dataset.features[int(ex_idx)]
                all_results.append(RawFinalResult(
                    unique_id=feature.unique_id, start_indexes=ss[j],
                    end_indexes=se[j],
                    cls_pred=list(ac_np[j].argmax(axis=-1)),
                    span_masks=masks[j]))

        for batch in iterate_batches(dataset.arrays, cfg.eval_batch_size):
            batch = self._attach_guides(batch, dataset)
            valid = batch.pop("batch_valid")
            dev_batch = self._device_batch(batch)
            s_logits, e_logits, seq = self.extraction_step(
                self.state.params, dev_batch)
            pending.append((batch, valid, s_logits, e_logits, seq))
            if len(pending) > window:
                drain_one()
        while pending:
            drain_one()
        return all_results

    def evaluate(self, epoch: int) -> float:
        cfg = self.cfg
        results = self._predict(self.dev_dataset)
        metrics, nbest = eval_absa(self.dev_dataset.examples,
                                   self.dev_dataset.features, results,
                                   cfg.do_lower_case)
        f1 = metrics["f1"]
        logger.info("epoch %d dev f1 %.4f p %.4f r %.4f", epoch, f1,
                    metrics["p"], metrics["r"])
        if self.writer:
            self.writer.add_scalar("dev_f1", f1, epoch)
        if f1 >= self.best_dev_metric:
            self.best_dev_metric = f1
            self.best_dev_epoch = epoch
            if cfg.save_path:
                save_best(os.path.join(cfg.save_path, "best_model.npz"),
                          self.state.params)
        if cfg.save_path:
            self._write_json(nbest, "dev_predictions.json")
        return f1

    def test(self, load_best_model: bool = True) -> float:
        cfg = self.cfg
        if load_best_model and cfg.save_path:
            best = os.path.join(cfg.save_path, "best_model.npz")
            if os.path.exists(best):
                self.state = self.state._replace(
                    params=load_best(best, self.state.params))
        results = self._predict(self.test_dataset)
        metrics, nbest = eval_absa(self.test_dataset.examples,
                                   self.test_dataset.features, results,
                                   cfg.do_lower_case)
        logger.info("test f1 %.4f p %.4f r %.4f", metrics["f1"], metrics["p"],
                    metrics["r"])
        if self.writer:
            self.writer.add_scalar("test_f1", metrics["f1"])
        if cfg.save_path:
            self._write_json(nbest, "test_predictions.json")
        if metrics["f1"] >= self.best_test_metric:
            self.best_test_metric = metrics["f1"]
        return metrics["f1"]

    def _write_json(self, obj, name: str):
        os.makedirs(self.cfg.save_path, exist_ok=True)
        with open(os.path.join(self.cfg.save_path, name), "w") as f:
            f.write(json.dumps(obj, indent=4) + "\n")
