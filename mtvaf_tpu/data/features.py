"""Feature conversion: examples → fixed-width padded arrays.

Pipeline A follows reference models/utils.py:231-378 (distant-supervision
start/end indicator vectors, BIO labels, polarity positions, padded span
indexes).  Pipeline B follows reference modules/dataset.py:355-598 (WordPiece
expansion labelling subwords ``X``; 1-indexed label map with 0 = PAD).

TPU-first notes:
* All widths are static (max_seq, max_term_num, n_best_size) so downstream
  jit graphs never retrace.
* Images are carried as ids/paths; pixel tensors are produced by
  :mod:`mtvaf_tpu.data.images`, not eagerly held per-feature.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from .readers import (MMInputExample, POLARITY_NAME, pos2term, ts2polarity,
                      ts2start_end)
from ..core.config import POLARITY_TO_ID


@dataclass
class SemEvalExample:
    """Pipeline-A example (reference models/utils.py:21-58)."""
    example_id: str
    sent_tokens: List[str]
    term_texts: List[str]
    start_positions: List[int]
    end_positions: List[int]
    polarities: List[str]
    image_labels: Optional[list] = None
    image_ids: Optional[List[str]] = None


@dataclass
class InputFeatures:
    """Pipeline-A feature (reference models/utils.py:158-206)."""
    unique_id: int
    example_index: int
    tokens: List[str]
    token_to_orig_map: Dict[int, int]
    input_ids: List[int]
    input_mask: List[int]
    segment_ids: List[int]
    start_positions: List[int]
    end_positions: List[int]
    start_indexes: List[int]
    end_indexes: List[int]
    bio_labels: List[int]
    polarity_positions: List[int]
    polarity_labels: List[int]
    label_masks: List[int]
    image_id: Optional[str] = None
    # Precomputed train-mode span candidates (TPU-first: kills the second
    # forward of the reference train step; SURVEY.md §7.1).
    gold_span_starts: Optional[List[int]] = None
    gold_span_ends: Optional[List[int]] = None
    gold_span_labels: Optional[List[int]] = None
    gold_span_masks: Optional[List[int]] = None


def convert_absa_examples(dataset: Dict[str, list], verbose: bool = False
                          ) -> List[SemEvalExample]:
    """dataset dict → SemEvalExamples (reference models/utils.py:610-686,
    minus the image tensor caching which lives in data/images.py)."""
    examples = []
    n = len(dataset["words"])
    for i in range(n):
        words = dataset["words"][i]
        ts_tags = dataset["ts_targets"][i]
        starts, ends = ts2start_end(ts_tags)
        polarities = ts2polarity(ts_tags, starts, ends)
        term_texts = pos2term(words, starts, ends)
        if not term_texts:
            continue
        new_polarities = [POLARITY_NAME[p] for p in polarities]
        assert len(term_texts) == len(starts) == len(new_polarities)
        examples.append(SemEvalExample(
            example_id=str(i), sent_tokens=words, term_texts=term_texts,
            start_positions=starts, end_positions=ends, polarities=new_polarities,
            image_labels=dataset.get("image_labels", [None] * n)[i],
            image_ids=dataset.get("imgs", [None] * n)[i]))
    return examples


def convert_examples_to_features(examples: Sequence[SemEvalExample], tokenizer,
                                 max_seq_length: int, *, is_roberta: bool = False,
                                 max_term_num: Optional[int] = None
                                 ) -> List[InputFeatures]:
    """Reference models/utils.py:231-378 with the same padded layout.

    Deviation (documented): span indicator writes are bounds-checked against
    the truncated sequence (the reference can index one past the end for a
    term ending exactly at max_seq-1; models/utils.py:306-310).
    """
    if max_term_num is None:
        max_term_num = max(len(e.term_texts) for e in examples)
    cls_tok, sep_tok = ("<s>", "</s>") if is_roberta else ("[CLS]", "[SEP]")

    unique_id = 1000000000
    features: List[InputFeatures] = []
    for example_index, example in enumerate(examples):
        tok_to_orig_index: List[int] = []
        orig_to_tok_index: List[int] = []
        all_doc_tokens: List[str] = []
        for i, token in enumerate(example.sent_tokens):
            orig_to_tok_index.append(len(all_doc_tokens))
            for sub_token in tokenizer.tokenize(token):
                tok_to_orig_index.append(i)
                all_doc_tokens.append(sub_token)

        tok_start_positions, tok_end_positions = [], []
        for start_position, end_position in zip(example.start_positions,
                                                example.end_positions):
            tok_start = orig_to_tok_index[start_position]
            if end_position < len(example.sent_tokens) - 1:
                tok_end = orig_to_tok_index[end_position + 1] - 1
            else:
                tok_end = len(all_doc_tokens) - 1
            tok_start_positions.append(tok_start)
            tok_end_positions.append(tok_end)

        if len(all_doc_tokens) > max_seq_length - 2:
            all_doc_tokens = all_doc_tokens[:max_seq_length - 2]

        tokens = [cls_tok]
        token_to_orig_map: Dict[int, int] = {}
        for index, token in enumerate(all_doc_tokens):
            token_to_orig_map[len(tokens)] = tok_to_orig_index[index]
            tokens.append(token)
        tokens.append(sep_tok)
        segment_ids = [0] * len(tokens)

        input_ids = tokenizer.convert_tokens_to_ids(tokens)
        input_mask = [1] * len(input_ids)
        while len(input_ids) < max_seq_length:
            input_ids.append(0)
            input_mask.append(0)
            segment_ids.append(0)
        assert len(input_ids) == len(input_mask) == len(segment_ids) == max_seq_length

        start_positions = [0] * max_seq_length
        end_positions = [0] * max_seq_length
        bio_labels = [0] * max_seq_length
        polarity_positions = [0] * max_seq_length
        start_indexes: List[int] = []
        end_indexes: List[int] = []
        for tok_start, tok_end, polarity in zip(
                tok_start_positions, tok_end_positions, example.polarities):
            start_position = tok_start + 1  # [CLS]
            end_position = tok_end + 1
            if tok_start >= 0 and end_position <= max_seq_length - 1:
                start_positions[start_position] = 1
                end_positions[end_position] = 1
                start_indexes.append(start_position)
                end_indexes.append(end_position)
                bio_labels[start_position] = 2  # 'B'
                for idx in range(start_position + 1, end_position + 1):
                    bio_labels[idx] = 1  # 'I'
                for idx in range(start_position, end_position + 1):
                    polarity_positions[idx] = POLARITY_TO_ID[polarity]
        polarity_labels = [POLARITY_TO_ID[p] for p in example.polarities]
        label_masks = [1] * len(polarity_labels)
        while len(start_indexes) < max_term_num:
            start_indexes.append(0)
            end_indexes.append(0)
            polarity_labels.append(0)
            label_masks.append(0)
        assert len(start_indexes) == len(end_indexes) == len(polarity_labels) \
            == len(label_masks) == max_term_num

        features.append(InputFeatures(
            unique_id=unique_id, example_index=example_index, tokens=tokens,
            token_to_orig_map=token_to_orig_map, input_ids=input_ids,
            input_mask=input_mask, segment_ids=segment_ids,
            start_positions=start_positions, end_positions=end_positions,
            start_indexes=start_indexes[:max_term_num],
            end_indexes=end_indexes[:max_term_num],
            bio_labels=bio_labels, polarity_positions=polarity_positions,
            polarity_labels=polarity_labels[:max_term_num],
            label_masks=label_masks[:max_term_num],
            image_id=example.image_ids[0] if example.image_ids else None))
        unique_id += 1
    return features


def attach_gold_candidates(examples, features, n_best_size: int,
                           do_lower_case: bool) -> None:
    """Precompute train-mode span candidates into each feature (TPU-first
    replacement for per-step host harvesting; reference models/utils.py:436-449
    recomputed these inside every training step)."""
    from ..eval.span_decode import gold_span_candidates
    for f in features:
        example = examples[f.example_index]
        ss, se, lab, lm = gold_span_candidates(example, f, n_best_size, do_lower_case)
        f.gold_span_starts, f.gold_span_ends = ss, se
        f.gold_span_labels, f.gold_span_masks = lab, lm


# ---------------------------------------------------------------------------
# Pipeline B.


@dataclass
class MMInputFeatures:
    """Pipeline-B feature (reference modules/dataset.py:342-353); images kept
    as ids, ANP distribution as a dense vector."""
    input_ids: List[int]
    input_mask: List[int]
    added_input_mask: List[int]
    segment_ids: List[int]
    label_id: List[int]
    auxlabel_id: List[int]
    imagelabel: List[float]
    img_id: str


def convert_mm_examples_to_features(
        examples: Sequence[MMInputExample], label_list: Sequence[str],
        auxlabel_list: Sequence[str], max_seq_length: int, tokenizer, *,
        is_roberta: bool = False, merge_label_mode: str = "reference",
        num_anp_classes: int = 2089) -> List[MMInputFeatures]:
    """Reference modules/dataset.py:355-474 (plain) and :476-598 (merge).

    The merge variant labels appended visual-context words with the sentence's
    *first* label (reference modules/dataset.py:505-506).  That quirk is kept
    under ``merge_label_mode="reference"``; ``"x"`` labels them ``X`` instead
    (excluded from metrics), which is the intended behavior.
    """
    label_map = {label: i for i, label in enumerate(label_list, 1)}
    auxlabel_map = {label: i for i, label in enumerate(auxlabel_list, 1)}
    cls_tok, sep_tok = ("<s>", "</s>") if is_roberta else ("[CLS]", "[SEP]")

    features: List[MMInputFeatures] = []
    for example in examples:
        textlist = example.text_a.split(" ")
        # In merge mode text_a is "<sentence> [SEP] <visual context>"; labels
        # only cover the original sentence.
        text_len = len(example.text_a.split(" [SEP] ", 1)[0].split(" "))
        labellist = example.label
        auxlabellist = example.auxlabel

        imagelabel_value = [0.0] * num_anp_classes
        if example.imagelabel:
            ordered = dict(sorted(example.imagelabel.items()))
            for i, (_, v) in enumerate(ordered.items()):
                if i < num_anp_classes:
                    imagelabel_value[i] = float(v)

        tokens: List[str] = []
        labels: List[str] = []
        auxlabels: List[str] = []
        for i, word in enumerate(textlist):
            sub = tokenizer.tokenize(" " + word)
            tokens.extend(sub)
            if i < text_len:
                label_1 = labellist[i] if i < len(labellist) else "X"
                auxlabel_1 = auxlabellist[i] if i < len(auxlabellist) else "X"
            elif merge_label_mode == "reference":
                label_1, auxlabel_1 = labellist[0], auxlabellist[0]
            else:
                label_1 = auxlabel_1 = "X"
            for m in range(len(sub)):
                labels.append(label_1 if m == 0 else "X")
                auxlabels.append(auxlabel_1 if m == 0 else "X")

        if len(tokens) >= max_seq_length - 1:
            tokens = tokens[:max_seq_length - 2]
            labels = labels[:max_seq_length - 2]
            auxlabels = auxlabels[:max_seq_length - 2]

        ntokens = [cls_tok]
        segment_ids = [0]
        label_ids = [label_map["[CLS]"]]
        auxlabel_ids = [auxlabel_map["[CLS]"]]
        for i, token in enumerate(tokens):
            ntokens.append(token)
            segment_ids.append(0)
            label_ids.append(label_map[labels[i]])
            auxlabel_ids.append(auxlabel_map[auxlabels[i]])
        ntokens.append(sep_tok)
        segment_ids.append(0)
        label_ids.append(label_map["[SEP]"])
        auxlabel_ids.append(auxlabel_map["[SEP]"])

        input_ids = tokenizer.convert_tokens_to_ids(ntokens)
        input_mask = [1] * len(input_ids)
        added_input_mask = [1] * (len(input_ids) + 49)
        while len(input_ids) < max_seq_length:
            input_ids.append(0)
            input_mask.append(0)
            added_input_mask.append(0)
            segment_ids.append(0)
            label_ids.append(0)
            auxlabel_ids.append(0)
        assert len(input_ids) == len(input_mask) == len(segment_ids) \
            == len(label_ids) == len(auxlabel_ids) == max_seq_length

        features.append(MMInputFeatures(
            input_ids=input_ids, input_mask=input_mask,
            added_input_mask=added_input_mask, segment_ids=segment_ids,
            label_id=label_ids, auxlabel_id=auxlabel_ids,
            imagelabel=imagelabel_value, img_id=example.img_id))
    return features


def stack_span_features(features: Sequence[InputFeatures]) -> Dict[str, np.ndarray]:
    """Features → dict of numpy arrays ready for device upload."""
    out = {
        "input_ids": np.array([f.input_ids for f in features], np.int32),
        "input_mask": np.array([f.input_mask for f in features], np.int32),
        "segment_ids": np.array([f.segment_ids for f in features], np.int32),
        "start_positions": np.array([f.start_positions for f in features], np.int32),
        "end_positions": np.array([f.end_positions for f in features], np.int32),
        "bio_labels": np.array([f.bio_labels for f in features], np.int32),
        "polarity_positions": np.array(
            [f.polarity_positions for f in features], np.int32),
        "example_index": np.arange(len(features), dtype=np.int32),
    }
    if features and features[0].gold_span_starts is not None:
        out["span_starts"] = np.array([f.gold_span_starts for f in features], np.int32)
        out["span_ends"] = np.array([f.gold_span_ends for f in features], np.int32)
        out["span_labels"] = np.array([f.gold_span_labels for f in features], np.int32)
        out["span_masks"] = np.array([f.gold_span_masks for f in features], np.int32)
    return out


def stack_mm_features(features: Sequence[MMInputFeatures]) -> Dict[str, np.ndarray]:
    return {
        "input_ids": np.array([f.input_ids for f in features], np.int32),
        "input_mask": np.array([f.input_mask for f in features], np.int32),
        "segment_ids": np.array([f.segment_ids for f in features], np.int32),
        "label_ids": np.array([f.label_id for f in features], np.int32),
        "auxlabel_ids": np.array([f.auxlabel_id for f in features], np.int32),
        "imagelabel": np.array([f.imagelabel for f in features], np.float32),
        "example_index": np.arange(len(features), dtype=np.int32),
    }
