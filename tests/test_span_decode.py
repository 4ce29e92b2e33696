"""Span decoding / NMS host-stage tests (reference models/utils.py:417-538)."""

import pytest

from mtvaf_tpu.data.features import (attach_gold_candidates,
                                     convert_absa_examples,
                                     convert_examples_to_features)
from mtvaf_tpu.data.readers import read_absa_data
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.eval.span_decode import (eval_span_candidates, get_best_indexes,
                                        get_final_text)
from mtvaf_tpu.eval.squad_eval import (exact_match_score, f1_score,
                                       normalize_answer)


class TestSquadEval:
    def test_normalize(self):
        assert normalize_answer("The Quick, Brown Fox!") == "quick brown fox"

    def test_em(self):
        assert exact_match_score("the fox", "Fox")
        assert not exact_match_score("fox", "dog")

    def test_f1(self):
        assert f1_score("quick brown fox", "brown dog") == pytest.approx(0.4)
        assert f1_score("abc", "xyz") == 0


class TestGetFinalText:
    def test_identity(self):
        assert get_final_text("chuck bass", "chuck bass", True) == "chuck bass"

    def test_case_restoration(self):
        # prediction is lowercase/tokenized; original has casing+punct
        assert get_final_text("chuck bass", "Chuck Bass", True) == "Chuck Bass"

    def test_substring(self):
        assert get_final_text("bass", "Chuck Bass!", True) == "Bass"

    def test_not_found_returns_orig(self):
        assert get_final_text("zzz", "Chuck Bass", True) == "Chuck Bass"

    def test_best_indexes(self):
        assert get_best_indexes([0.1, 5.0, 3.0, 4.0], 2) == [1, 3]


def build_fixture(tmp_path):
    line = ("x####great=T-POS-B phone=T-POS but=O bad=T-NEG-B battery=T-NEG"
            "____label=[1]____imgid=['a.jpg']")
    p = tmp_path / "t.txt"
    p.write_text(line + "\n")
    ds = read_absa_data(str(p))
    examples = convert_absa_examples(ds)
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "great", "phone", "but",
              "bad", "battery"]
    tok = FullTokenizer({t: i for i, t in enumerate(tokens)})
    feats = convert_examples_to_features(examples, tok, 16)
    return examples, feats


class TestEvalCandidates:
    def test_topk_filters_and_nms(self, tmp_path):
        examples, feats = build_fixture(tmp_path)
        f = feats[0]
        # tokens: [CLS] great phone but bad battery [SEP]
        seq = len(f.input_ids)
        start_logits = [0.0] * seq
        end_logits = [0.0] * seq
        start_logits[1] = 9.0   # "great"
        end_logits[2] = 9.0     # "phone"
        start_logits[4] = 8.0   # "bad"
        end_logits[5] = 8.0     # "battery"
        ss, se, labels, masks = eval_span_candidates(
            examples[0], f, start_logits, end_logits, filter_type="f1",
            use_heuristics=True, use_nms=True, logit_threshold=8.0,
            n_best_size=20, max_answer_length=12, do_lower_case=True)
        picked = [(s, e) for s, e, m in zip(ss, se, masks) if m]
        assert (1, 2) in picked
        assert (4, 5) in picked
        # NMS: overlapping sub-spans like (1,1) must not survive alongside (1,2)
        texts = set()
        for s, e, m in zip(ss, se, masks):
            if m:
                texts.add((s, e))
        for (s1, e1) in texts:
            for (s2, e2) in texts:
                if (s1, e1) < (s2, e2):
                    assert not (s1 <= s2 <= e1 or s1 <= e2 <= e1)

    def test_threshold_excludes(self, tmp_path):
        examples, feats = build_fixture(tmp_path)
        f = feats[0]
        seq = len(f.input_ids)
        start_logits = [-10.0] * seq
        end_logits = [-10.0] * seq
        ss, se, labels, masks = eval_span_candidates(
            examples[0], f, start_logits, end_logits, filter_type="f1",
            use_heuristics=True, use_nms=True, logit_threshold=8.0,
            n_best_size=20, max_answer_length=12, do_lower_case=True)
        assert sum(masks) == 0
        assert len(ss) == 20

    def test_gold_candidates_dedup(self, tmp_path):
        examples, feats = build_fixture(tmp_path)
        attach_gold_candidates(examples, feats, 20, True)
        f = feats[0]
        assert sum(f.gold_span_masks) == 2  # two distinct gold terms
