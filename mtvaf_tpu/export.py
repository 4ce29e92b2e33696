"""Deployment artifacts: serialized, self-contained serving programs.

The reference's only deployment story is re-running its trainer with
``--only_test`` (/root/reference/MTVAF_training.py:391-394).  This module
goes the other way, the JAX-native one: :func:`export_predictor` lowers a
predictor's device programs through ``jax.export`` into versioned
StableHLO artifacts — one file per compiled batch rung — plus a JSON
manifest and the trained weights (one weights.npz by default, or baked
into each program as constants with ``bake_weights=True``).  Serving the
bundle needs jax and a tokenizer vocab, but none of this framework's
model code, and the program is byte-frozen (no Python-side drift between
what was validated and what serves).

    >>> export_predictor(predictor, "bundle/", batch_sizes=(1, 16))
    >>> served = load_exported_predictor("bundle/", tokenizer)
    >>> served.predict(["the pizza was great"])      # == predictor.predict
    [[('pizza', 'POS')]]

Scope and caveats:

* CRF pipeline: the fused decode program (encoder → CRF Viterbi) per
  rung; prefix (multimodal) runs also export a decode-with-images
  variant whose batch carries the raw image rows (in the predictor's
  ``image_dtype`` transfer precision — fp32; fp16 at half the upload
  bytes; or uint8 at a quarter, re-normalized inside the program) and
  runs the frozen-ResNet guide computation INSIDE the
  program (one device call per image batch, mirroring the live
  predictor's fused dispatch).
* Span pipeline: the extraction and classification programs per rung
  (the candidate-NMS seam between them is host code by design —
  eval/span_decode.py; the exported predictor reuses it).  Prefix runs
  export an extraction-with-images variant like the CRF pipeline, so
  exported span serving accepts images too.  DiGCN-trained span models
  export the no-sidecar classification signature (raw-text serving has
  no dependency parses — same as predict_many).
* Artifacts lower for the platforms requested at export time
  (``platforms=("cpu", "tpu")`` by default, so one bundle serves both);
  a predictor whose eval attention resolved to the Pallas kernel
  (long-sequence configs) is TPU-only — export it with
  ``platforms=("tpu",)``.
* Size: by default the weights are stored ONCE per bundle (weights.npz;
  a JSON skeleton in the manifest rebuilds the exact param pytree — no
  model code, no pickles) and the programs take the param tree as their
  leading runtime argument, so each program is ~KB and total size is
  ~param bytes for any ladder length.  ``bake_weights=True`` instead
  bakes the weights into EACH rung's program as closure constants —
  fully self-contained single files, but ~param bytes per rung (435 MB
  for fp32 BERT-base), and the constants ride every compile request:
  remote-compile backends with request caps reject them (HTTP 413
  observed at BERT-base size on the tunneled dev attach).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .infer import CrfPredictor, SpanPredictor

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 2   # v2: fused with-images programs replace the split
                      # guides + with-guides pair (one device call/batch)


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _crf_batch_spec(cfg, rung: int) -> Dict[str, jax.ShapeDtypeStruct]:
    seq = cfg.effective_max_seq
    return {
        "input_ids": _spec((rung, seq), jnp.int32),
        "input_mask": _spec((rung, seq), jnp.int32),
        "segment_ids": _spec((rung, seq), jnp.int32),
        "label_ids": _spec((rung, seq), jnp.int32),
        "imagelabel": _spec((rung, cfg.num_anp_classes), jnp.float32),
    }


def _span_batch_spec(cfg, rung: int) -> Dict[str, jax.ShapeDtypeStruct]:
    seq = cfg.effective_max_seq
    return {
        "input_ids": _spec((rung, seq), jnp.int32),
        "input_mask": _spec((rung, seq), jnp.int32),
        "segment_ids": _spec((rung, seq), jnp.int32),
    }


def _export_one(fn, specs: Sequence, platforms) -> bytes:
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        *specs)
    return bytes(exported.serialize())


def _tree_spec(tree):
    return jax.tree.map(lambda x: _spec(x.shape, x.dtype), tree)


def _save_weights(path: str, tree):
    """Param tree (nested dicts/lists/tuples of arrays) → one npz of
    leaves plus a JSON-able skeleton whose leaf entries are the npz keys.

    The skeleton goes into the manifest, so the bundle loader rebuilds
    the EXACT pytree (dict vs list vs tuple) with no model code and no
    pickles."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if not isinstance(k, str) or "/" in k or k == "__seq__":
                    raise ValueError(f"unsupported param dict key {k!r}")
                out[k] = walk(v, prefix + (k,))
            return out
        if isinstance(node, (list, tuple)):
            return {"__seq__": type(node).__name__,
                    "items": [walk(v, prefix + (str(i),))
                              for i, v in enumerate(node)]}
        key = "/".join(prefix)
        flat[key] = np.asarray(node)
        return key

    skeleton = walk(tree, ())
    np.savez(path, **flat)
    return skeleton


def _load_weights(path: str, skeleton):
    z = np.load(path)

    def build(node):
        if isinstance(node, str):
            return z[node]
        if node.get("__seq__"):
            seq = [build(v) for v in node["items"]]
            return seq if node["__seq__"] == "list" else tuple(seq)
        return {k: build(v) for k, v in node.items()}

    return build(skeleton)


def export_predictor(predictor, out_dir: str, *,
                     batch_sizes: Sequence[int] = (1, 16),
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     bake_weights: bool = False) -> Dict:
    """Write a serving bundle for ``predictor``.

    One serialized program per (stage, batch rung).  Default: the
    programs take the param tree as a runtime argument and the weights
    are stored ONCE per bundle (weights.npz + a manifest skeleton —
    still no model code at serve time), so programs stay ~KB and a long
    rung ladder stays ~param bytes total.  ``bake_weights=True`` makes
    every artifact fully self-contained (weights as closure constants)
    at ~param bytes PER RUNG — and the constants ride every compile
    request, which remote-compile backends may cap (module docstring).
    Returns the manifest dict."""
    from dataclasses import asdict

    os.makedirs(out_dir, exist_ok=True)
    cfg, bert_cfg, params = predictor.cfg, predictor.bert_cfg, \
        predictor.params
    rungs = tuple(sorted({int(b) for b in batch_sizes}))
    if rungs[0] < 1:
        raise ValueError("batch_sizes must be >= 1")
    is_span = isinstance(predictor, SpanPredictor)
    programs = []

    def emit(name: str, fn, specs):
        """``fn(params, *args)``; baked = params closed over, shared =
        params becomes the program's leading runtime argument."""
        if bake_weights:
            run = lambda *a, _f=fn: _f(params, *a)          # noqa: E731
            blob = _export_one(run, specs, platforms)
        else:
            blob = _export_one(fn, [_tree_spec(params)] + list(specs),
                               platforms)
        fname = name + ".jaxexp"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        programs.append({"name": name, "file": fname,
                         "bytes": len(blob)})

    multimodal = bool(cfg.use_prefix and predictor.resnet_params is not None)
    weights_tree = resnet_tree = None
    if not bake_weights:
        weights_tree = _save_weights(os.path.join(out_dir, "weights.npz"),
                                     params)
        if multimodal:
            resnet_tree = _save_weights(os.path.join(out_dir, "resnet.npz"),
                                        predictor.resnet_params)
    def emit_mm(name: str, program, batch_spec: Dict, rung: int,
                with_aux: bool = True):
        """Export the fused with-images variant of ``program`` for one
        rung: the batch carries the raw image rows (in the predictor's
        ``image_dtype`` transfer precision) and the frozen-ResNet guide
        computation runs inside the program — one device call per image
        batch, the exported twin of the live predictor's fused dispatch
        (infer._dispatch_packed).  ``with_aux=False`` freezes the
        no-aux-crops signature (zero aux rows created inside the program
        — they are 3/4 of the upload bytes otherwise; the online tier's
        one-image-per-request case)."""
        from .nn.models import compute_visual_guides, image_rows_to_f32
        depth = cfg.resnet_depth

        def fused(p, rp, b):
            b = dict(b)
            imgs = image_rows_to_f32(b.pop("__images__"))
            aux = image_rows_to_f32(b.pop("__aux_images__")) if with_aux \
                else jnp.zeros((rung, 3, 224, 224, 3), jnp.float32)
            mg, ag = compute_visual_guides(rp, imgs, aux, depth=depth)
            return program(p, {**b, "main_guides": mg, "aux_guides": ag})

        idt = predictor.image_dtype
        mm_spec = {**batch_spec,
                   "__images__": _spec((rung, 224, 224, 3), idt)}
        if with_aux:
            mm_spec["__aux_images__"] = _spec((rung, 3, 224, 224, 3), idt)
        if bake_weights:
            rparams = predictor.resnet_params
            blob = _export_one(
                lambda b, _f=fused: _f(params, rparams, b), [mm_spec],
                platforms)
        else:
            blob = _export_one(
                fused,
                [_tree_spec(params), _tree_spec(predictor.resnet_params),
                 mm_spec],
                platforms)
        fname = name + ".jaxexp"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        programs.append({"name": name, "file": fname, "bytes": len(blob)})

    for rung in rungs:
        if is_span:
            extract = predictor._extract
            classify = predictor._classify
            emit(f"span_extract_b{rung}", extract,
                 [_span_batch_spec(cfg, rung)])
            if multimodal:
                emit_mm(f"span_extract_images_b{rung}", extract,
                        _span_batch_spec(cfg, rung), rung)
                emit_mm(f"span_extract_images_noaux_b{rung}", extract,
                        _span_batch_spec(cfg, rung), rung, with_aux=False)
            # the classify program's seq input is exactly the extract
            # program's seq output — derive its spec, don't guess dtypes
            _, _, seq_shape, _ = jax.eval_shape(
                lambda b: extract(params, b), _span_batch_spec(cfg, rung))
            seq_spec = _spec(seq_shape.shape, seq_shape.dtype)
            pairs_spec = _spec((2, rung, cfg.n_best_size), jnp.int32)
            if getattr(cfg, "gcn_layer_number", 0) > 0:
                # raw-text serving has no dependency parses: freeze the
                # no-sidecar branch (None adjacency skips the re-encode)
                emit(f"span_classify_b{rung}",
                     lambda p, seq, pairs, _c=classify: _c(p, seq, pairs,
                                                           None, None),
                     [seq_spec, pairs_spec])
            else:
                emit(f"span_classify_b{rung}", classify,
                     [seq_spec, pairs_spec])
        else:
            decode = predictor._decode
            emit(f"crf_decode_b{rung}", decode, [_crf_batch_spec(cfg, rung)])
            if multimodal:
                emit_mm(f"crf_decode_images_b{rung}", decode,
                        _crf_batch_spec(cfg, rung), rung)
                emit_mm(f"crf_decode_images_noaux_b{rung}", decode,
                        _crf_batch_spec(cfg, rung), rung, with_aux=False)

    manifest = {
        "format_version": _FORMAT_VERSION,
        "pipeline": "span" if is_span else "crf",
        "multimodal": multimodal,
        "bake_weights": bake_weights,
        "weights_tree": weights_tree,
        "resnet_tree": resnet_tree,
        "rungs": list(rungs),
        "image_dtype": predictor.image_dtype.name,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "config": asdict(cfg),
        "bert_config": asdict(bert_cfg),
        "programs": programs,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _load_program(out_dir: str, name: str):
    with open(os.path.join(out_dir, name + ".jaxexp"), "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


class _ExportedRungs:
    """Smallest-rung-that-fits dispatch over deserialized programs."""

    def __init__(self, by_rung: Dict[int, object]):
        self._by_rung = dict(sorted(by_rung.items()))
        self.rungs = tuple(self._by_rung)

    def fit(self, n: int) -> Tuple[int, object]:
        for rung, prog in self._by_rung.items():
            if rung >= n:
                return rung, prog
        raise ValueError(
            f"batch of {n} exceeds the largest exported rung "
            f"{self.rungs[-1]}; re-export with a larger batch size or "
            f"split the batch")


class _NoReplicate:
    def to_device(self, device):
        raise ValueError(
            "exported bundles pin their device placement (the weights are "
            "program constants); for multi-chip serving load the bundle "
            "once per process, or serve the live predictor with "
            "BatchingServer(..., devices=[...])")


class ExportedCrfPredictor(_NoReplicate, CrfPredictor):
    """CrfPredictor served from a bundle: host tokenize/decode code is the
    live predictor's own; the device call is the frozen artifact."""

    def __init__(self, cfg, bert_cfg, tokenizer, rungs: _ExportedRungs,
                 mm_rungs: Optional[_ExportedRungs] = None,
                 weights=None, resnet_weights=None, image_dtype=np.float32,
                 mm_noaux_rungs: Optional[_ExportedRungs] = None):
        super().__init__(cfg, bert_cfg, None, tokenizer,
                         image_dtype=image_dtype)
        self._rungs = rungs
        self._mm_rungs = mm_rungs
        self._mm_noaux_rungs = mm_noaux_rungs
        # shared-weights bundles: the param tree is the programs' leading
        # runtime argument; baked bundles have it as closure constants
        self._wargs = () if weights is None else (weights,)
        self._guide_wargs = () if resnet_weights is None \
            else (resnet_weights,)

    @property
    def serves_images(self) -> bool:
        # frozen bundles carry the multimodal programs only when exported
        # with them; the live predictor's _guide_fn is always None here
        return self._mm_rungs is not None

    @property
    def export_rungs(self) -> tuple:
        """The bundle's compiled batch sizes — a serving ladder should be
        drawn from these (any other shape pads up to the next rung)."""
        return tuple(self._rungs.rungs)

    def dispatch(self, sentences, images=None, aux_images=None):
        n = len(sentences)
        rung, prog = self._rungs.fit(n)
        sentences = list(sentences)
        padded = sentences + [sentences[-1]] * (rung - n)
        host = self._make_host_batch(padded)
        if images is not None:
            if self._mm_rungs is None:
                raise ValueError("bundle was exported without the "
                                 "multimodal programs")
            # one device call: the frozen program computes the ResNet
            # guides from the raw rows (weights, resnet, batch — the
            # warg tuples are empty for baked bundles)
            mm_prog, extras = _mm_call_args(self, n, rung, images,
                                            aux_images)
            out = mm_prog.call(*self._wargs, *self._guide_wargs,
                               {**host, **extras})
        else:
            out = prog.call(*self._wargs, host)
        # unpadded sentences: collect's zip truncates the padding rows, so
        # callers get exactly len(sentences) results (the live predictor
        # leaves padding to its callers — here the rung pad is internal)
        return (sentences, host["label_ids"], host["input_mask"], out)


def _cast_image_rows(arr, dtype):
    """Normalized fp32 rows → the bundle's transfer representation (the
    exported twin of infer._PredictorBase._cast_image_rows): plain cast
    for fp32/fp16, de-normalized raw pixels for uint8 bundles."""
    if np.dtype(dtype) == np.uint8:
        from .data.images import denormalize_to_u8
        return denormalize_to_u8(arr)
    return np.asarray(arr, dtype)


def _pad_to_rung(rung: int, arr, dtype):
    """Pad a batch array to the rung's frozen batch dim with NORMALIZED-
    zero rows and cast to the bundle's image transfer dtype (for uint8
    that means the padding rows carry the mean-pixel bytes that re-
    normalize back to ~zero inside the program)."""
    arr = np.asarray(arr, np.float32)
    pad = np.zeros((rung - arr.shape[0],) + arr.shape[1:], np.float32)
    full = np.concatenate([arr, pad]) if len(pad) else arr
    return _cast_image_rows(full, dtype)


def _mm_call_args(pred, n: int, rung: int, images, aux_images):
    """(program, image-batch extras) for one exported image batch: the
    no-aux program when the caller has no aux crops (zero rows created
    inside the program — 3/4 of the upload bytes otherwise), else the
    full with-images program."""
    if aux_images is None and pred._mm_noaux_rungs is not None:
        mm_rung, prog = pred._mm_noaux_rungs.fit(n)
        assert mm_rung == rung, "rung ladders must match"
        return prog, {"__images__": _pad_to_rung(rung, images,
                                                 pred.image_dtype)}
    mm_rung, prog = pred._mm_rungs.fit(n)
    assert mm_rung == rung, "rung ladders must match"
    # absent aux crops ship as NORMALIZED zeros in the transfer dtype
    # (zero bytes would re-normalize to -mean/std under uint8 bundles)
    aux = _cast_image_rows(np.zeros((rung, 3, 224, 224, 3), np.float32),
                           pred.image_dtype) \
        if aux_images is None else _pad_to_rung(rung, aux_images,
                                                pred.image_dtype)
    return prog, {"__images__": _pad_to_rung(rung, images,
                                             pred.image_dtype),
                  "__aux_images__": aux}


class ExportedSpanPredictor(_NoReplicate, SpanPredictor):
    """SpanPredictor served from a bundle: the host NMS seam between the
    frozen programs is the live predictor's own code; prefix bundles carry
    a fused extract-with-images program so images serve like the live
    predictor (one device call for the extraction stage)."""

    def __init__(self, cfg, bert_cfg, tokenizer, extract: _ExportedRungs,
                 classify: _ExportedRungs, weights=None,
                 mm_rungs: Optional[_ExportedRungs] = None,
                 resnet_weights=None, image_dtype=np.float32,
                 mm_noaux_rungs: Optional[_ExportedRungs] = None):
        super().__init__(cfg, bert_cfg, None, tokenizer,
                         image_dtype=image_dtype)
        self._extract_rungs = extract
        self._classify_rungs = classify
        self._mm_rungs = mm_rungs
        self._mm_noaux_rungs = mm_noaux_rungs
        self._wargs = () if weights is None else (weights,)
        self._guide_wargs = () if resnet_weights is None \
            else (resnet_weights,)

    @property
    def serves_images(self) -> bool:
        return self._mm_rungs is not None

    @property
    def export_rungs(self) -> tuple:
        """The bundle's compiled batch sizes (see ExportedCrfPredictor)."""
        return tuple(self._extract_rungs.rungs)

    def dispatch(self, sentences, images=None, aux_images=None, gcn=None):
        if gcn is not None:
            raise ValueError("exported span bundles serve without GCN "
                             "side arrays (no-sidecar classify is frozen)")
        n = len(sentences)
        rung, prog = self._extract_rungs.fit(n)
        padded = list(sentences) + [sentences[-1]] * (rung - n)
        examples, feats, host = self._make_host_batch(padded)
        if images is not None:
            if self._mm_rungs is None:
                raise ValueError("bundle was exported without the "
                                 "multimodal programs")
            mm_prog, extras = _mm_call_args(self, n, rung, images,
                                            aux_images)
            s_logits, e_logits, seq, _ = mm_prog.call(
                *self._wargs, *self._guide_wargs, {**host, **extras})
        else:
            s_logits, e_logits, seq, _ = prog.call(*self._wargs, host)
        return (n, examples, feats, s_logits, e_logits, seq, rung)

    def collect(self, handle):
        n, examples, feats, s_logits, e_logits, seq, rung = handle
        s_np, e_np = jax.device_get((s_logits, e_logits))
        all_ss, all_se, all_masks = self._candidates(examples, feats,
                                                     s_np, e_np)
        pairs = np.stack([all_ss, all_se]).astype(np.int32)
        _, classify = self._classify_rungs.fit(rung)
        ac = np.asarray(classify.call(*self._wargs, seq, pairs))
        return self._to_results(examples, feats, all_ss, all_se, all_masks,
                                ac.argmax(axis=-1))[:n]     # drop rung pad

    # The live SpanPredictor.predict_many drives its packed programs
    # directly (self._run_packed/_classify — live-only internals); the
    # exported predictor streams through its own dispatch/collect instead,
    # which is exactly the CRF predictor's generic loop.
    predict_many = CrfPredictor.predict_many


def load_exported_predictor(out_dir: str, tokenizer=None, *,
                            bert_name: str = None):
    """Rebuild a serving predictor from an :func:`export_predictor` bundle.

    ``tokenizer`` matches the training run's (`data.tokenization.
    build_tokenizer` on the same vocab) — tokenization is host code and is
    not part of the frozen artifact.  Default None rebuilds it from the
    run's ``--bert_name`` directory recorded in the manifest (override the
    directory with ``bert_name`` if the vocab moved)."""
    from .core.config import Config
    from .nn.bert import BertConfig

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported bundle version "
                         f"{manifest['format_version']}")
    cfg = Config(**manifest["config"])
    bert_cfg = BertConfig(**manifest["bert_config"])
    rungs = manifest["rungs"]
    if tokenizer is None:
        from .data.tokenization import build_tokenizer
        from .native.binding import maybe_accelerate
        tokenizer = maybe_accelerate(
            build_tokenizer(bert_name or cfg.bert_name, cfg.do_lower_case))

    def load_rungs(prefix: str) -> _ExportedRungs:
        return _ExportedRungs(
            {r: _load_program(out_dir, f"{prefix}_b{r}") for r in rungs})

    weights = resnet_weights = None
    if not manifest.get("bake_weights", True):
        weights = _load_weights(os.path.join(out_dir, "weights.npz"),
                                manifest["weights_tree"])
        if manifest["multimodal"]:
            resnet_weights = _load_weights(
                os.path.join(out_dir, "resnet.npz"),
                manifest["resnet_tree"])

    mm_rungs = mm_noaux_rungs = None
    image_dtype = np.dtype(manifest.get("image_dtype", "float32"))
    if manifest["pipeline"] == "span":
        if manifest["multimodal"]:
            mm_rungs = load_rungs("span_extract_images")
            mm_noaux_rungs = load_rungs("span_extract_images_noaux")
        return ExportedSpanPredictor(cfg, bert_cfg, tokenizer,
                                     load_rungs("span_extract"),
                                     load_rungs("span_classify"),
                                     weights=weights,
                                     mm_rungs=mm_rungs,
                                     mm_noaux_rungs=mm_noaux_rungs,
                                     resnet_weights=resnet_weights,
                                     image_dtype=image_dtype)
    if manifest["multimodal"]:
        mm_rungs = load_rungs("crf_decode_images")
        mm_noaux_rungs = load_rungs("crf_decode_images_noaux")
    return ExportedCrfPredictor(cfg, bert_cfg, tokenizer,
                                load_rungs("crf_decode"),
                                mm_rungs=mm_rungs,
                                mm_noaux_rungs=mm_noaux_rungs,
                                weights=weights,
                                resnet_weights=resnet_weights,
                                image_dtype=image_dtype)
