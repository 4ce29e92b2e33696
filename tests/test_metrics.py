"""Metrics tests: ABSA exact-match P/R/F1 and seqeval-equivalent tagging."""

import numpy as np
import pytest

from mtvaf_tpu.eval.metrics import eval_absa, eval_json
from mtvaf_tpu.eval.span_decode import RawFinalResult
from mtvaf_tpu.eval.tagging import (classification_report, extract_entities,
                                    labels_to_tags, tagging_scores)


class TestExtractEntities:
    def test_simple_bio(self):
        tags = ["O", "B-POS", "I-POS", "O", "B-NEG"]
        assert extract_entities(tags) == [("POS", 1, 2), ("NEG", 4, 4)]

    def test_lenient_i_start(self):
        # seqeval default scheme treats a bare I- as starting a chunk
        assert extract_entities(["I-POS", "I-POS", "O"]) == [("POS", 0, 1)]

    def test_type_change_splits(self):
        assert extract_entities(["B-POS", "I-NEG"]) == \
            [("POS", 0, 0), ("NEG", 1, 1)]

    def test_adjacent_b(self):
        assert extract_entities(["B-POS", "B-POS"]) == \
            [("POS", 0, 0), ("POS", 1, 1)]


class TestTaggingScores:
    def test_perfect(self):
        y = [["O", "B-POS", "I-POS"], ["B-NEG", "O"]]
        s = tagging_scores(y, y)
        assert s["micro"]["f1"] == 1.0
        assert s["micro"]["support"] == 2

    def test_half_right(self):
        y_true = [["B-POS", "O", "B-NEG"]]
        y_pred = [["B-POS", "O", "O"]]
        s = tagging_scores(y_true, y_pred)
        assert s["micro"]["p"] == 1.0
        assert s["micro"]["r"] == 0.5
        assert s["micro"]["f1"] == pytest.approx(2 / 3)

    def test_report_format(self):
        y_true = [["B-POS", "I-POS", "O"]]
        y_pred = [["B-POS", "I-POS", "O"]]
        report = classification_report(y_true, y_pred)
        assert "micro avg" in report
        assert "weighted avg" in report
        assert "1.0000" in report

    def test_reference_string_parse_extracts_micro_f1(self):
        """The reference reads its reported F1 by string-slicing the printed
        seqeval report (modules/train.py:667-669).  Pin that our report's
        byte layout survives that exact parse expression."""
        y_true = [["O", "B-POS", "I-POS", "O"], ["B-NEG", "O", "O"]]
        y_pred = [["O", "B-POS", "O", "O"], ["B-NEG", "O", "B-NEU"]]
        report = classification_report(y_true, y_pred, digits=4)
        parsed = float(
            report.split("\n")[-4].split("      ")[0].split("    ")[3])
        exact = tagging_scores(y_true, y_pred)["micro"]["f1"]
        assert parsed == round(exact, 4) == 0.4

    def test_vs_seqeval_if_available(self):
        seqeval = pytest.importorskip("seqeval.metrics")
        if getattr(seqeval, "__file__", None) is None:
            pytest.skip("seqeval in sys.modules is the oracle-test stub")
        y_true = [["O", "B-POS", "I-POS", "B-NEG"], ["I-NEU", "O", "B-POS"]]
        y_pred = [["B-POS", "I-POS", "O", "B-NEG"], ["I-NEU", "I-NEU", "O"]]
        ours = tagging_scores(y_true, y_pred)["micro"]["f1"]
        theirs = seqeval.f1_score(y_true, y_pred)
        assert ours == pytest.approx(theirs)


class TestLabelsToTags:
    def test_skips_cls_x_sep_and_pads(self):
        inv = {0: "PAD", 1: "O", 2: "B-POS", 3: "X", 4: "[CLS]", 5: "[SEP]"}
        label_ids = np.array([[4, 1, 2, 3, 5, 0, 0]])
        preds = np.array([[4, 2, 2, 3, 5, 0, 0]])
        mask = np.array([[1, 1, 1, 1, 1, 0, 0]])
        y_true, y_pred = labels_to_tags(label_ids, mask, inv, preds)
        assert y_true == [["O", "B-POS"]]
        assert y_pred == [["B-POS", "B-POS"]]

    def test_stops_at_pad(self):
        inv = {0: "PAD", 1: "O", 2: "B-POS"}
        label_ids = np.array([[1, 1, 0, 2]])
        mask = np.array([[1, 1, 0, 1]])
        y_true = labels_to_tags(label_ids, mask, inv)
        assert y_true == [["O"]]  # [CLS] column skipped, stop at first pad


class _Feature:
    def __init__(self, unique_id, example_index, tokens, token_to_orig_map):
        self.unique_id = unique_id
        self.example_index = example_index
        self.tokens = tokens
        self.token_to_orig_map = token_to_orig_map


class _Example:
    def __init__(self, example_id, sent_tokens, term_texts, polarities):
        self.example_id = example_id
        self.sent_tokens = sent_tokens
        self.term_texts = term_texts
        self.polarities = polarities


class TestEvalAbsa:
    def make_fixture(self):
        example = _Example("0", ["great", "phone", "bad", "battery"],
                           ["great phone", "battery"],
                           ["positive", "negative"])
        feature = _Feature(1000, 0,
                           ["[CLS]", "great", "phone", "bad", "battery",
                            "[SEP]"],
                           {1: 0, 2: 1, 3: 2, 4: 3})
        return example, feature

    def test_perfect_prediction(self):
        example, feature = self.make_fixture()
        result = RawFinalResult(unique_id=1000, start_indexes=[1, 4],
                                end_indexes=[2, 4], cls_pred=[2, 3],
                                span_masks=[1, 1])
        metrics, nbest = eval_absa([example], [feature], [result], True)
        assert metrics["f1"] == 1.0
        assert nbest["0"]["pred_terms"] == ["great phone", "battery"]

    def test_wrong_polarity_no_credit(self):
        example, feature = self.make_fixture()
        result = RawFinalResult(unique_id=1000, start_indexes=[1],
                                end_indexes=[2], cls_pred=[3],  # negative
                                span_masks=[1])
        metrics, _ = eval_absa([example], [feature], [result], True)
        assert metrics["common"] == 0

    def test_precision_recall(self):
        example, feature = self.make_fixture()
        result = RawFinalResult(unique_id=1000, start_indexes=[1, 3],
                                end_indexes=[2, 3], cls_pred=[2, 3],
                                span_masks=[1, 1])
        metrics, _ = eval_absa([example], [feature], [result], True)
        assert metrics["p"] == 0.5      # 1 of 2 predictions correct
        assert metrics["r"] == 0.5      # 1 of 2 gold found


class TestEvalJson:
    def test_reconstruction(self):
        class Ex:
            def __init__(self, guid, text_a):
                self.guid = guid
                self.text_a = text_a

        examples = [Ex("train-0", "great phone bad battery")]
        y_true = [["B-POS", "I-POS", "O", "B-NEG"]]
        y_pred = [["B-POS", "I-POS", "O", "O"]]
        nbest, errors = eval_json(examples, y_true, y_pred)
        assert nbest["train-0"]["gold_terms"] == ["great phone ", "battery "]
        assert "train-0" in errors  # missed "battery"


class TestClassificationEval:
    def test_acc_and_micro(self):
        from mtvaf_tpu.eval.tagging import classification_eval
        gold = ["pos", "neg", "neu", "none", "pos"]
        pred = ["pos", "neu", "neu", "pos", "none"]
        m = classification_eval(gold, pred, negative_label="none")
        assert m["acc"] == pytest.approx(2 / 5)
        # positives: gold has 4 non-none, pred has 4 non-none, correct
        # positive matches: pos@0, neu@2 → 2
        assert m["micro_p"] == pytest.approx(0.5)
        assert m["micro_r"] == pytest.approx(0.5)
        assert m["micro_f1"] == pytest.approx(0.5)
