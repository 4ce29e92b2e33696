"""Array-backed datasets and the host batching loop.

TPU-first re-design of ``TVSADataset``/``TVSADataset2`` (reference
modules/dataset.py:70-138, 279-327): text features are converted once into
padded numpy arrays; pixel data (or cached ResNet guides) are attached at
batch time; batches are fixed-size (padded at the tail) so jitted steps never
retrace.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .features import (attach_gold_candidates, convert_absa_examples,
                       convert_examples_to_features,
                       convert_mm_examples_to_features, stack_mm_features,
                       stack_span_features)
from .images import ImageStore
from .readers import (create_mm_examples, read_absa_data, read_agn_data,
                      read_mmtsv, read_visual_context, sample_dataset)
from ..core.config import Config


@dataclass
class SpanDataset:
    """Pipeline A (twitter15/17)."""
    examples: list
    features: list
    arrays: Dict[str, np.ndarray]
    image_ids: List[str]
    image_store: Optional[ImageStore]

    @classmethod
    def load(cls, cfg: Config, tokenizer, data_file: str, *,
             mode: str = "train", img_dir: Optional[str] = None,
             aux_dir: Optional[str] = None,
             aux_map: Optional[dict] = None,
             agn_file: Optional[str] = None,
             gcn_file: Optional[str] = None,
             rng: Optional[np.random.RandomState] = None):
        dataset = read_absa_data(data_file)
        if cfg.sample_ratio != 1.0 and mode == "train":
            import random
            dataset = sample_dataset(dataset, cfg.sample_ratio,
                                     random.Random(cfg.seed))
        if agn_file:
            dataset = read_agn_data(agn_file, dataset)
        examples = convert_absa_examples(dataset)
        features = convert_examples_to_features(
            examples, tokenizer, cfg.effective_max_seq,
            is_roberta=cfg.is_roberta)
        attach_gold_candidates(examples, features, cfg.n_best_size,
                               cfg.do_lower_case)
        arrays = stack_span_features(features)
        if gcn_file:
            arrays.update(load_gcn_arrays(gcn_file, features,
                                          cfg.effective_max_seq))
        image_ids = [f.image_id or "" for f in features]
        store = None
        if cfg.use_prefix and img_dir:
            store = ImageStore(img_dir, aux_dir,
                               cache_dir=os.path.join(cfg.cache_dir, "img"),
                               aux_map=aux_map)
        return cls(examples, features, arrays, image_ids, store)

    def __len__(self):
        return len(self.features)


@dataclass
class CrfDataset:
    """Pipeline B (twitter2015/2017)."""
    examples: list
    features: list
    arrays: Dict[str, np.ndarray]
    image_ids: List[str]
    image_store: Optional[ImageStore]

    @classmethod
    def load(cls, cfg: Config, tokenizer, data_file: str, anp_file: str, *,
             mode: str = "train", img_dir: Optional[str] = None,
             aux_dir: Optional[str] = None, aux_map: Optional[dict] = None,
             merge_file: Optional[str] = None):
        data, imgs, auxlabels, imagelabels = read_mmtsv(
            data_file, anp_file, img_dir=img_dir if cfg.use_prefix else None)
        vc = read_visual_context(merge_file) if merge_file else None
        examples = create_mm_examples(data, imgs, auxlabels, imagelabels,
                                      mode, visual_context=vc)
        from ..core.config import CRF_LABEL_LIST
        features = convert_mm_examples_to_features(
            examples, CRF_LABEL_LIST, CRF_LABEL_LIST, cfg.effective_max_seq,
            tokenizer, is_roberta=cfg.is_roberta,
            num_anp_classes=cfg.num_anp_classes)
        arrays = stack_mm_features(features)
        image_ids = [f.img_id for f in features]
        store = None
        if cfg.use_prefix and img_dir:
            store = ImageStore(img_dir, aux_dir,
                               cache_dir=os.path.join(cfg.cache_dir, "img"),
                               aux_map=aux_map)
        return cls(examples, features, arrays, image_ids, store)

    def __len__(self):
        return len(self.features)


def load_gcn_arrays(gcn_file: str, features, max_seq: int) -> Dict[str, np.ndarray]:
    """Load per-example GCN side data (dependency adjacency, source/aspect
    masks, sentence polarity) and pad to the static sequence width.

    Format: JSON list of dicts with keys ``adj_matrix`` (LxL), ``src_mask``
    (L), ``aspect_mask`` (L), ``polarity`` (int) — the structure the
    reference indexes per example (models/utils.py:674-679).  Entries align
    with the *kept* examples (those with aspect terms), same as features.
    """
    import json as _json
    with open(gcn_file, encoding="utf-8") as f:
        records = _json.load(f)
    n = len(features)
    adj = np.zeros((n, max_seq, max_seq), np.float32)
    src = np.zeros((n, max_seq), np.int32)
    asp = np.zeros((n, max_seq), np.int32)
    pol = np.zeros((n,), np.int32)
    valid = np.zeros((n, max_seq), np.int32)
    for i, feat in enumerate(features):
        # valid_ids: first-subtoken flags for the DiGCN compression
        # (reference models/bert_model.py:271-281; the reference's data
        # pipeline never materializes this tensor — its gcn_layer_number>0
        # batch unpack, modules/train.py:327, would crash — so the flags are
        # derived here from token_to_orig_map, overridable per record).
        prev = None
        for tok_idx in sorted(feat.token_to_orig_map):
            orig = feat.token_to_orig_map[tok_idx]
            if orig != prev and tok_idx < max_seq:
                valid[i, tok_idx] = 1
            prev = orig
        rec = records[feat.example_index] if feat.example_index < len(records) \
            else None
        if rec is None:
            continue
        a = np.asarray(rec.get("adj_matrix", []), np.float32)
        L = min(a.shape[0] if a.ndim == 2 else 0, max_seq)
        if L:
            adj[i, :L, :L] = a[:L, :L]
        s = np.asarray(rec.get("src_mask", []), np.int32)[:max_seq]
        src[i, :len(s)] = s
        m = np.asarray(rec.get("aspect_mask", []), np.int32)[:max_seq]
        asp[i, :len(m)] = m
        pol[i] = int(rec.get("polarity", 0))
        v = np.asarray(rec.get("valid_ids", []), np.int32)[:max_seq]
        if len(v):
            valid[i, :] = 0
            valid[i, :len(v)] = v
    return {"adj_matrix": adj, "src_mask": src, "aspect_mask": asp,
            "polaritys": pol, "adjacency_matrix": adj, "valid_ids": valid}


def iterate_batches(arrays: Dict[str, np.ndarray], batch_size: int, *,
                    shuffle: bool = False, seed: int = 0, epoch: int = 0,
                    drop_last: bool = False, pad_to_full: bool = True,
                    process_index: int = 0,
                    process_count: int = 1) -> Iterator[Dict[str, np.ndarray]]:
    """Yield fixed-size batches (tail batch padded by repeating the last row,
    with 'batch_valid' marking real rows) so jit shapes never change.

    For eval the padded rows are filtered via ``batch_valid``.  For training
    the duplicated tail rows contribute to the gradient of one step per
    epoch — with shuffling the bias is negligible and static shapes avoid a
    retrace per tail batch (the reference instead feeds a smaller final
    batch, retracing would cost far more than the duplicate rows).

    Multi-host: ``batch_size`` is the GLOBAL batch; with ``process_count > 1``
    every process walks the same seeded permutation but materializes only its
    contiguous ``batch_size / process_count`` row slice of each global batch
    (matching the mesh's process→shard layout).  This is the TPU equivalent
    of the reference's ``DistributedSampler`` (MTVAF_training.py:331,355) —
    no host ever loads another host's rows or images."""
    if batch_size % process_count != 0:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"{process_count} processes")
    local = batch_size // process_count
    n = len(next(iter(arrays.values())))
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(idx)
    for start in range(0, n, batch_size):
        take = idx[start:start + batch_size]
        valid = len(take)
        if valid < batch_size:
            if drop_last:
                return
            if pad_to_full:
                take = np.concatenate(
                    [take, np.repeat(take[-1:], batch_size - valid)])
        valid_mask = (np.arange(len(take)) < valid).astype(np.int32)
        lo = process_index * local
        take, valid_mask = take[lo:lo + local], valid_mask[lo:lo + local]
        batch = {k: v[take] for k, v in arrays.items()}
        batch["batch_valid"] = valid_mask
        yield batch


def prefetch(iterator, size: int = 4):
    """Background-thread prefetch: overlap host batch assembly (numpy
    slicing, guide-cache lookups, image decode, the packed device upload)
    with device execution.  Queue depth 4: on latency-bound backends the
    per-batch upload RPC takes longer than one step, so several batches'
    transfers must be in flight at once.  The reference's equivalent is
    torch DataLoader(num_workers=4)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def attach_images(batch: Dict[str, np.ndarray], image_ids: Sequence[str],
                  store: ImageStore, with_aux: bool = True) -> Dict:
    ids = [image_ids[i] for i in batch["example_index"]]
    main, aux = store.batch(ids, with_aux=with_aux)
    batch = dict(batch)
    batch["images"] = main
    if aux is not None:
        batch["aux_images"] = aux
    return batch
