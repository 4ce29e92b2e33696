"""Inference API: raw text (+ images) → aspect terms and polarities.

Production-facing counterpart of the reference's ``--only_test`` path
(MTVAF_training.py:391-394): load a trained model once, then serve batched
predictions with jitted device programs and host-side decoding.

  >>> predictor = CrfPredictor(cfg, bert_cfg, params, tokenizer)
  >>> predictor.predict(["the pizza was great but service slow"])
  [[('pizza', 'POS')], ...]
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core.config import CRF_LABEL_LIST, Config, ID_TO_POLARITY
from .data.features import (SemEvalExample,
                            convert_examples_to_features,
                            convert_mm_examples_to_features)
from .data.readers import MMInputExample
from .eval.span_decode import eval_span_candidates
from .eval.tagging import extract_entities, labels_to_tags
from .nn.bert import BertConfig, xla_attention
from .nn.models import compute_visual_guides, image_rows_to_f32
from .train.steps import (make_classification_step, make_crf_decode_step,
                          make_extraction_step)


def _check_aligned(n_sentences: int, images, aux_images) -> None:
    """Fail fast when image arrays don't align with the sentence list —
    a short array would otherwise surface chunks later as an opaque XLA
    shape mismatch (0-row slice through _pad_rows) mid-stream."""
    for name, a in (("images", images), ("aux_images", aux_images)):
        if a is not None and len(a) != n_sentences:
            raise ValueError(
                f"{name} has {len(a)} rows but there are {n_sentences} "
                f"sentences; per-sentence image rows must align 1:1")


def _pad_rows(a, n: int):
    """Pad array ``a`` to ``n`` rows by repeating its last row (None passes
    through) — the tail-batch twin of repeating the last sentence, so padded
    rows stay (sentence, image)-consistent and are dropped by the caller."""
    if a is None:
        return None
    a = np.asarray(a)
    if a.shape[0] == n:
        return a
    return np.concatenate([a, np.repeat(a[-1:], n - a.shape[0], axis=0)])


class _PredictorBase:
    def __init__(self, cfg: Config, bert_cfg: BertConfig, params, tokenizer,
                 resnet_params=None, attention_impl=xla_attention,
                 image_dtype=np.float32):
        self.cfg = cfg
        self.bert_cfg = bert_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.resnet_params = resnet_params
        self.attention_impl = attention_impl
        # host→device transfer dtype for image rows (fp32 default; fp16
        # halves the multimodal upload — the dominant cost on tunneled
        # links — and is cast back to fp32 on device before the frozen
        # ResNet.  fp16's 10 mantissa bits on normalized pixels sit below
        # the bf16 rounding the guide table already applies in training.
        # uint8 quarters the upload: the host de-normalizes back to raw
        # pixels (data/images.denormalize_to_u8 — exact for uint8-origin
        # pixels, ≤0.5/255 for the native float-resize path) and the
        # normalize re-runs inside the device program.)
        self.image_dtype = np.dtype(image_dtype)
        if self.image_dtype not in (np.dtype(np.float32),
                                    np.dtype(np.float16),
                                    np.dtype(np.uint8)):
            raise ValueError("image_dtype must be float32, float16 or "
                             f"uint8, got {self.image_dtype}")
        self._packed_fns: Dict[tuple, object] = {}
        self._guide_fn = None
        if cfg.use_prefix and resnet_params is not None:
            self._guide_fn = jax.jit(
                lambda imgs, aux: compute_visual_guides(
                    resnet_params, imgs, aux, depth=cfg.resnet_depth))

    @property
    def serves_images(self) -> bool:
        """True when per-request images reach visual guides on this
        predictor — serve.BatchingServer.warmup then compiles the
        image-bearing program per rung too (the first image-bearing batch
        would otherwise stall the queue for a mid-serving compile)."""
        return self._guide_fn is not None

    def _guides_extra(self, images, aux_images) -> Dict:
        """Visual guides for a batch of preprocessed images, as a dict of
        DEVICE arrays (empty for text-only batches / non-prefix models)."""
        if self._guide_fn is None or images is None:
            return {}
        aux = aux_images if aux_images is not None else \
            np.zeros((images.shape[0], 3, 224, 224, 3), np.float32)
        mg, ag = self._guide_fn(jnp.asarray(images), jnp.asarray(aux))
        return {"main_guides": mg, "aux_guides": ag}

    def _cast_image_rows(self, a) -> np.ndarray:
        """Normalized fp32 rows → this predictor's transfer representation:
        a plain cast for fp32/fp16, or de-normalized raw pixels for uint8
        (data/images.denormalize_to_u8; the device program re-normalizes —
        nn.models.image_rows_to_f32)."""
        if self.image_dtype == np.uint8:
            from .data.images import denormalize_to_u8
            return denormalize_to_u8(a)
        return np.asarray(a, self.image_dtype)

    def _maybe_guides(self, batch: Dict, images, aux_images):
        extra = self._guides_extra(images, aux_images)
        return {**batch, **extra} if extra else batch

    def to_device(self, device):
        """A replica of this predictor committed to ``device``.

        The params (and the frozen ResNet, for prefix runs) are
        ``device_put`` there, and since jitted computation follows its
        committed arguments, every device call of the replica runs on
        that chip.  Config and tokenizer are shared (read-only); jit
        caches are per-replica.  This is the multi-chip serving unit:
        ``serve.BatchingServer(predictor, devices=jax.local_devices())``
        runs one dispatch worker per replica over a shared request queue
        — data-parallel serving with no collectives, so per-request
        latency stays the single-chip latency while throughput scales
        with chips (the right shape for a model this size; sharding one
        BERT-base forward over chips would trade ICI hops for nothing).
        """
        params = jax.device_put(self.params, device)
        resnet = None if self.resnet_params is None else \
            jax.device_put(self.resnet_params, device)
        return type(self)(self.cfg, self.bert_cfg, params, self.tokenizer,
                          resnet_params=resnet,
                          attention_impl=self.attention_impl,
                          image_dtype=self.image_dtype)

    def _run_packed(self, name: str, program, host: Dict, extra: Dict):
        """Run ``program(params, batch)`` with the host leaves shipped as
        ONE packed uint8 buffer whose unpack is FUSED into the program.

        On tunneled backends each host→device transfer is a ~25-40 ms RPC
        (docs/DESIGN.md §8b); the per-leaf ``jnp.asarray`` path pays one per
        tensor plus the dispatch.  Here the whole batch rides the single
        jitted call (upload + unpack + compute in one dispatch).  Compiled
        once per (program, batch layout, extra-arg structure); falls back to
        per-leaf placement for layouts ``pack_host`` can't serialize."""
        from .train.ingest import pack_host, unpack_program
        packed = pack_host(host)
        if packed is None:
            batch = {k: jnp.asarray(v) for k, v in host.items()}
            batch.update(extra)
            return program(self.params, batch)
        buf, segs = packed
        key = (name, segs, tuple(sorted(extra)))
        fn = self._packed_fns.get(key)
        if fn is None:
            unpack = unpack_program(segs)
            fn = jax.jit(lambda p, b, ex: program(p, {**unpack(b), **ex}))
            self._packed_fns[key] = fn
        return fn(self.params, buf, extra)

    def _dispatch_packed(self, name: str, program, host: Dict, images,
                         aux_images):
        """One device call per batch even when it carries images.

        Text-only batches go straight to :meth:`_run_packed`.  Multimodal
        batches append the fp32 image rows to the SAME packed buffer and the
        frozen-ResNet guide computation runs INSIDE the compiled program —
        vs the earlier per-leaf path (2 image uploads + a separate guide
        dispatch + the decode dispatch = 4 tunnel RPCs per batch), the whole
        batch is now upload + guides + decode in one dispatch.  The bytes
        still dominate on tunneled backends (~38 MB per multimodal b16 at
        fp32), but they ride a single transfer per docs/DESIGN.md §8b, and
        the guide matmuls overlap the next batch's host work in pipelined
        callers (predict_many / serve.BatchingServer)."""
        if self._guide_fn is None or images is None:
            return self._run_packed(name, program, host, {})
        from .train.ingest import pack_host, unpack_program
        images = self._cast_image_rows(images)
        mm_host = {**host, "__images__": images}
        if aux_images is not None:
            # aux crops absent (e.g. one image per online request): the
            # zero rows are created INSIDE the program instead of shipped —
            # they are 3/4 of the multimodal upload bytes otherwise
            mm_host["__aux_images__"] = self._cast_image_rows(aux_images)
        packed = pack_host(mm_host)
        if packed is None:      # exotic leaf: per-leaf fallback, split guides
            # images/aux are already in TRANSFER representation (uint8 rows
            # are de-normalized raw pixels) — undo it before the unfused
            # guide program, which expects normalized fp32
            def _to_f32(a):
                if a.dtype == np.uint8:
                    from .data.images import _normalize
                    return _normalize(a)
                return np.asarray(a, np.float32)
            return self._run_packed(name, program, host,
                                    self._guides_extra(
                                        _to_f32(images),
                                        None if aux_images is None else
                                        _to_f32(mm_host["__aux_images__"])))
        buf, segs = packed
        key = (name, segs, "__fused_guides__")
        fn = self._packed_fns.get(key)
        if fn is None:
            unpack = unpack_program(segs)
            depth = self.cfg.resnet_depth

            def fused(p, rp, b):
                d = unpack(b)
                imgs = image_rows_to_f32(d.pop("__images__"))
                aux_ = image_rows_to_f32(d.pop("__aux_images__")) \
                    if "__aux_images__" in d else \
                    jnp.zeros((imgs.shape[0], 3, 224, 224, 3), jnp.float32)
                mg, ag = compute_visual_guides(rp, imgs, aux_, depth=depth)
                return program(p, {**d, "main_guides": mg, "aux_guides": ag})

            fn = jax.jit(fused)
            self._packed_fns[key] = fn
        # image buffers are MB-scale: ship via ASYNC device_put so the
        # dispatching thread moves on to the next batch's tokenize/cast/
        # pack while the bytes cross the link (the text path keeps the
        # packed jit-arg transfer — measured faster for KB-scale one-shot
        # dispatches, trainer_span.py:426 A/B; this is the same split)
        dev = getattr(jax.tree_util.tree_leaves(self.params)[0],
                      "device", None)
        buf = jax.device_put(buf, dev)
        return fn(self.params, self.resnet_params, buf)


class CrfPredictor(_PredictorBase):
    """Tag raw sentences; returns (term, sentiment) pairs per sentence."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._decode = make_crf_decode_step(self.cfg, self.bert_cfg,
                                            self.attention_impl)
        self.label_map = {label: i for i, label in enumerate(CRF_LABEL_LIST, 1)}
        self.inv_label_map = {i: l for l, i in self.label_map.items()}
        self.inv_label_map[0] = "PAD"

    def _make_host_batch(self, sentences: Sequence[str]) -> Dict:
        """Tokenize to HOST numpy arrays (upload deferred to the packed
        dispatch; the label/mask arrays are also what host decoding reads,
        so they never round-trip through the device)."""
        examples = [
            MMInputExample(guid=str(i), text_a=s, img_id="", label=["O"] *
                           len(s.split()), auxlabel=["O"] * len(s.split()),
                           imagelabel=None)
            for i, s in enumerate(sentences)]
        feats = convert_mm_examples_to_features(
            examples, CRF_LABEL_LIST, CRF_LABEL_LIST,
            self.cfg.effective_max_seq, self.tokenizer,
            is_roberta=self.cfg.is_roberta,
            num_anp_classes=self.cfg.num_anp_classes)
        return {
            "input_ids": np.asarray([f.input_ids for f in feats], np.int32),
            "input_mask": np.asarray([f.input_mask for f in feats], np.int32),
            "segment_ids": np.asarray([f.segment_ids for f in feats],
                                      np.int32),
            "label_ids": np.asarray([f.label_id for f in feats], np.int32),
            "imagelabel": np.zeros((len(feats), self.cfg.num_anp_classes),
                                   np.float32),
        }

    def _make_batch(self, sentences: Sequence[str], images, aux_images
                    ) -> Dict:
        batch = {k: jnp.asarray(v)
                 for k, v in self._make_host_batch(sentences).items()}
        return self._maybe_guides(batch, images, aux_images)

    def _to_results(self, sentences: Sequence[str], label_ids, input_mask,
                    tags_np) -> List[List[Tuple[str, str]]]:
        _, y_pred = labels_to_tags(label_ids, input_mask,
                                   self.inv_label_map, tags_np)
        results = []
        for sent, tags in zip(sentences, y_pred):
            words = sent.split()
            # tags align to first-subtoken words (X/[SEP] filtered out)
            spans = extract_entities(tags)
            results.append([
                (" ".join(words[s:e + 1]), etype) for etype, s, e in spans
                if s < len(words)])
        return results

    def dispatch(self, sentences: Sequence[str], images=None, aux_images=None):
        """Issue one batch's device work without blocking on the results:
        tokenize, then ONE device call that carries the whole batch as a
        packed buffer and runs the jitted decode (upload + unpack + compute
        in one dispatch — 2 RPCs per batch total with the collect fetch,
        down from 5 uploads + dispatch + 3-array fetch).  Returns an opaque
        handle for :meth:`collect`.  Lets callers (serve.BatchingServer,
        custom loops) keep several batches in flight — on latency-bound
        backends the per-batch host round-trip hides behind the next
        batches' compute (the predict_many pattern, exposed)."""
        _check_aligned(len(sentences), images, aux_images)
        host = self._make_host_batch(sentences)
        out = self._dispatch_packed("crf_decode", self._decode, host,
                                    images, aux_images)
        return (list(sentences), host["label_ids"], host["input_mask"], out)

    def collect(self, handle) -> List[List[Tuple[str, str]]]:
        """Block on one :meth:`dispatch` handle and decode its results.
        Only ``pred_tags`` crosses the link — labels/mask stayed on the
        host in the handle."""
        sentences, labels_np, mask_np, out = handle
        return self._to_results(sentences, labels_np, mask_np,
                                np.asarray(out["pred_tags"]))

    def predict(self, sentences: Sequence[str], images=None, aux_images=None,
                ) -> List[List[Tuple[str, str]]]:
        return self.collect(self.dispatch(sentences, images, aux_images))

    def predict_many(self, sentences: Sequence[str], *, images=None,
                     aux_images=None, batch_size: int = 16,
                     window: int = 4) -> List[List[Tuple[str, str]]]:
        """High-throughput serving over a sentence stream.

        Fixed-size batches (one jit program; the tail batch is padded by
        repeating its last sentence and the padding rows are dropped),
        dispatched ``window`` deep through :meth:`dispatch` with
        :meth:`collect` overlapped in a thread pool — on latency-bound
        backends the per-batch host round-trips hide behind the next
        batches' compute (the same pattern as the trainers' eval loops).

        ``images`` / ``aux_images``: optional per-sentence preprocessed
        image rows, (N, 224, 224, 3) / (N, 3, 224, 224, 3) fp32 aligned
        with ``sentences`` — multimodal predictors batch them through the
        frozen-ResNet guide program chunk by chunk."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        _check_aligned(len(sentences), images, aux_images)
        results: List[List[Tuple[str, str]]] = []
        pending = deque()

        def finish_one():
            n, fut = pending.popleft()
            results.extend(fut.result()[:n])

        with ThreadPoolExecutor(max_workers=4) as fetcher:
            for i in range(0, len(sentences), batch_size):
                chunk = list(sentences[i:i + batch_size])
                n = len(chunk)
                chunk += [chunk[-1]] * (batch_size - n)     # pad tail batch
                img = None if images is None else \
                    _pad_rows(images[i:i + batch_size], len(chunk))
                aux = None if aux_images is None else \
                    _pad_rows(aux_images[i:i + batch_size], len(chunk))
                pending.append(
                    (n, fetcher.submit(self.collect,
                                       self.dispatch(chunk, images=img,
                                                     aux_images=aux))))
                if len(pending) > window:
                    finish_one()
            while pending:
                finish_one()
        return results


class SpanPredictor(_PredictorBase):
    """Span-extraction prediction: top spans + polarity per sentence."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._extract = make_extraction_step(self.cfg, self.bert_cfg,
                                             self.attention_impl)
        self._classify = make_classification_step(self.cfg, self.bert_cfg)

    def _make_host_batch(self, sentences: Sequence[str]):
        cfg = self.cfg
        examples = [
            SemEvalExample(example_id=str(i), sent_tokens=s.split(),
                           term_texts=[], start_positions=[],
                           end_positions=[], polarities=[])
            for i, s in enumerate(sentences)]
        feats = convert_examples_to_features(
            examples, self.tokenizer, cfg.effective_max_seq,
            is_roberta=cfg.is_roberta, max_term_num=1)
        host = {
            "input_ids": np.asarray([f.input_ids for f in feats], np.int32),
            "input_mask": np.asarray([f.input_mask for f in feats], np.int32),
            "segment_ids": np.asarray([f.segment_ids for f in feats],
                                      np.int32),
        }
        return examples, feats, host

    def _make_batch(self, sentences: Sequence[str], images, aux_images):
        examples, feats, host = self._make_host_batch(sentences)
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        return examples, feats, self._maybe_guides(batch, images, aux_images)

    def _candidates(self, examples, feats, s_np, e_np):
        cfg = self.cfg
        all_ss, all_se, all_masks = [], [], []
        for j, feature in enumerate(feats):
            ss, se, _, masks = eval_span_candidates(
                examples[j], feature, s_np[j], e_np[j],
                filter_type=cfg.filter_type, use_heuristics=cfg.use_heuristics,
                use_nms=cfg.use_nms, logit_threshold=cfg.logit_threshold,
                n_best_size=cfg.n_best_size,
                max_answer_length=cfg.max_answer_length,
                do_lower_case=cfg.do_lower_case)
            all_ss.append(ss)
            all_se.append(se)
            all_masks.append(masks)
        return all_ss, all_se, all_masks

    def _to_results(self, examples, feats, all_ss, all_se, all_masks, preds
                    ) -> List[List[Tuple[str, str]]]:
        from .eval.span_decode import detokenized_span_text
        cfg = self.cfg
        results = []
        for j, feature in enumerate(feats):
            out = []
            for k in range(cfg.n_best_size):
                if not all_masks[j][k]:
                    continue
                text = detokenized_span_text(
                    examples[j], feature, all_ss[j][k], all_se[j][k],
                    cfg.do_lower_case)
                out.append((text, ID_TO_POLARITY[int(preds[j][k])]))
            results.append(out)
        return results

    def dispatch(self, sentences: Sequence[str], images=None, aux_images=None,
                 gcn=None):
        """Issue the extraction stage for one batch without blocking (see
        CrfPredictor.dispatch).  The span pipeline's host NMS seam and the
        classification stage run in :meth:`collect`.

        ``gcn``: optional (valid_ids (B, S), adjacency_matrix (B, S, S))
        side arrays for a DiGCN-trained model (``cfg.gcn_layer_number >
        0``); without them the eval classification skips the DiGCN
        re-encode (matching the trainers when the GCN side file is
        absent)."""
        _check_aligned(len(sentences), images, aux_images)
        examples, feats, host = self._make_host_batch(sentences)
        s_logits, e_logits, seq, _ = self._dispatch_packed(
            "span_extract", self._extract, host, images, aux_images)
        if gcn is not None:
            gcn = tuple(None if g is None else jnp.asarray(g) for g in gcn)
        return (examples, feats, s_logits, e_logits, seq, gcn)

    def collect(self, handle) -> List[List[Tuple[str, str]]]:
        """Block on one :meth:`dispatch` handle: fetch logits, pick span
        candidates on the host, classify, decode."""
        examples, feats, s_logits, e_logits, seq, gcn = handle
        # one pooled fetch for both logit arrays (a tunnel RPC each otherwise)
        s_np, e_np = jax.device_get((s_logits, e_logits))
        all_ss, all_se, all_masks = self._candidates(examples, feats,
                                                     s_np, e_np)
        # host numpy: the transfer rides the classification dispatch
        pairs = np.stack([all_ss, all_se]).astype(np.int32)
        if self.cfg.gcn_layer_number > 0:
            valid_ids, adjacency = gcn if gcn is not None else (None, None)
            ac_dev = self._classify(self.params, seq, pairs, valid_ids,
                                    adjacency)
        else:
            ac_dev = self._classify(self.params, seq, pairs)
        ac = np.asarray(ac_dev)
        return self._to_results(examples, feats, all_ss, all_se, all_masks,
                                ac.argmax(axis=-1))

    def predict(self, sentences: Sequence[str], images=None, aux_images=None,
                gcn=None) -> List[List[Tuple[str, str]]]:
        return self.collect(self.dispatch(sentences, images, aux_images,
                                          gcn=gcn))

    def predict_many(self, sentences: Sequence[str], *, images=None,
                     aux_images=None, batch_size: int = 16,
                     window: int = 4) -> List[List[Tuple[str, str]]]:
        """High-throughput span serving: the extract → host-NMS → classify
        seam pipelined two stages deep with pooled fetches (same pattern as
        the span trainer's eval loop); fixed-size batches, padded tail.
        ``images`` / ``aux_images``: optional per-sentence image rows
        aligned with ``sentences`` (see CrfPredictor.predict_many) — they
        enter the extraction stage as visual guides, chunk by chunk.

        Deliberately NOT built on dispatch/collect: collect() blocks
        through both device stages, while this loop overlaps the
        extraction fetch, the host NMS, and the classification fetch of
        DIFFERENT batches independently — keep the two in sync when
        changing either (esp. the _classify signature, which grows two
        args under gcn_layer_number > 0)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        _check_aligned(len(sentences), images, aux_images)
        results: List[List[Tuple[str, str]]] = []
        pending_ext = deque()
        pending_cls = deque()

        with ThreadPoolExecutor(max_workers=4) as fetcher:

            def harvest_one():
                n, examples, feats, se_fut, seq = pending_ext.popleft()
                se_np = se_fut.result()
                all_ss, all_se, all_masks = self._candidates(
                    examples, feats, se_np[0], se_np[1])
                pairs = np.stack([all_ss, all_se]).astype(np.int32)
                if self.cfg.gcn_layer_number > 0:
                    # raw-text streaming has no dependency parses: skip
                    # the DiGCN re-encode (classify_gcn's None-adjacency
                    # path), like the trainers without a GCN side file
                    ac = self._classify(self.params, seq, pairs, None, None)
                else:
                    ac = self._classify(self.params, seq, pairs)
                pending_cls.append((n, examples, feats, all_ss, all_se,
                                    all_masks,
                                    fetcher.submit(np.asarray, ac)))

            def finish_one():
                n, examples, feats, all_ss, all_se, all_masks, fut = \
                    pending_cls.popleft()
                ac_np = fut.result()
                results.extend(self._to_results(
                    examples, feats, all_ss, all_se, all_masks,
                    ac_np.argmax(axis=-1))[:n])

            for i in range(0, len(sentences), batch_size):
                chunk = list(sentences[i:i + batch_size])
                n = len(chunk)
                chunk += [chunk[-1]] * (batch_size - n)
                img = None if images is None else \
                    _pad_rows(images[i:i + batch_size], len(chunk))
                aux = None if aux_images is None else \
                    _pad_rows(aux_images[i:i + batch_size], len(chunk))
                examples, feats, host = self._make_host_batch(chunk)
                s_logits, e_logits, seq, _ = self._dispatch_packed(
                    "span_extract", self._extract, host, img, aux)
                pending_ext.append(
                    (n, examples, feats,
                     fetcher.submit(np.asarray,
                                    jnp.stack([s_logits, e_logits])), seq))
                if len(pending_ext) > window:
                    harvest_one()
                while len(pending_cls) > window:
                    finish_one()
            while pending_ext:
                harvest_one()
            while pending_cls:
                finish_one()
        return results


def load_predictor(save_path: str, *, bert_name: str = None,
                   attention_impl=None, image_dtype=np.float32):
    """Rebuild the right predictor from a training run's save directory.

    Reads ``run_config.json`` (written by the CLI at train start) and
    ``best_model.npz``; rebuilds the tokenizer from the run's
    ``--bert_name`` directory (override with ``bert_name`` if the
    checkpoint moved) and, for prefix runs, the frozen ResNet from the
    run's ``--resnet_root``.

    >>> predictor = load_predictor("out/")          # Crf or Span, by config
    >>> predictor.predict(["the pizza was great"])
    """
    import json
    import os

    from .core.checkpoint import load_best
    from .core.config import Config
    from .data.tokenization import build_tokenizer
    from .kernels.prefix_attention import select_attention_impl
    from .native.binding import maybe_accelerate
    from .nn.models import init_crf_model_params, init_span_model_params

    with open(os.path.join(save_path, "run_config.json")) as f:
        meta = json.load(f)
    cfg = Config(**meta["config"])
    bert_cfg = BertConfig(**meta["bert_config"])

    tok_dir = bert_name or cfg.bert_name
    tokenizer = maybe_accelerate(
        build_tokenizer(tok_dir, cfg.do_lower_case))
    if attention_impl is None:
        attention_impl = select_attention_impl(cfg, train=False)

    init_fn = (init_span_model_params if cfg.is_span_pipeline
               else init_crf_model_params)
    template = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg)
    params = load_best(os.path.join(save_path, "best_model.npz"), template)

    resnet_params = None
    if cfg.use_prefix:
        from .core.convert import load_resnet
        resnet_params = load_resnet(cfg)

    cls = SpanPredictor if cfg.is_span_pipeline else CrfPredictor
    return cls(cfg, bert_cfg, params, tokenizer,
               resnet_params=resnet_params, attention_impl=attention_impl,
               image_dtype=image_dtype)
