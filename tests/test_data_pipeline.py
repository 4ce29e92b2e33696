"""Data reader + feature conversion tests (pipeline A and B).

Golden vectors are hand-computed from the reference format definitions
(reference models/utils.py:231-378,688-761; modules/dataset.py:150-209,355-474).
"""

import numpy as np
import pytest

from mtvaf_tpu.core.config import CRF_LABEL_LIST
from mtvaf_tpu.data.features import (
    InputFeatures, attach_gold_candidates, convert_absa_examples,
    convert_examples_to_features, convert_mm_examples_to_features,
    stack_mm_features, stack_span_features)
from mtvaf_tpu.data.readers import (
    create_mm_examples, read_absa_data, read_agn_data, read_mmtsv,
    read_visual_context, sample_dataset, ts2polarity, ts2start_end)
from mtvaf_tpu.data.tokenization import FullTokenizer


SPAN_LINE = ("RT @ltsChuckBass : Chuck Bass is everything #MCM"
             "####rt=O @ltschuckbass=O :=O chuck=T-POS-B bass=T-POS is=O"
             " everything=O #mcm=O____label=[1, 0]____imgid=['17_06_315.jpg']")


@pytest.fixture
def vocab_tokenizer():
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "rt", "@", "lts", "##chuck",
              "##bass", ":", "chuck", "bass", "is", "everything", "#", "mcm",
              "great", "phone", "bad", "battery", "the", "good"]
    return FullTokenizer({t: i for i, t in enumerate(tokens)})


class TestReadAbsa:
    def test_parse(self, tmp_path):
        p = tmp_path / "train.txt"
        p.write_text(SPAN_LINE + "\n")
        ds = read_absa_data(str(p))
        assert ds["words"][0] == ["rt", "@ltschuckbass", ":", "chuck", "bass",
                                 "is", "everything", "#mcm"]
        assert ds["ts_targets"][0] == ["O", "O", "O", "T-POS-B", "T-POS", "O",
                                       "O", "O"]
        assert ds["image_labels"][0] == [1, 0]
        assert ds["imgs"][0] == ["17_06_315.jpg"]

    def test_multi_equals_token(self, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("a == b####a=O ===O b=O____label=[0]____imgid=['x.jpg']\n")
        ds = read_absa_data(str(p))
        assert ds["words"][0] == ["a", "==", "b"]

    def test_sample_ratio(self, tmp_path):
        import random
        p = tmp_path / "t.txt"
        p.write_text((SPAN_LINE + "\n") * 10)
        ds = read_absa_data(str(p))
        sampled = sample_dataset(ds, 0.5, random.Random(0))
        assert len(sampled["words"]) == 5


class TestTs2StartEnd:
    def test_single_span(self):
        starts, ends = ts2start_end(["O", "T-POS-B", "T-POS", "O"])
        assert (starts, ends) == ([1], [2])

    def test_span_at_end(self):
        starts, ends = ts2start_end(["O", "T-NEG-B", "T-NEG"])
        assert (starts, ends) == ([1], [2])

    def test_adjacent_spans(self):
        starts, ends = ts2start_end(["T-POS-B", "T-NEU-B", "O"])
        assert (starts, ends) == ([0, 1], [0, 1])

    def test_bx_terminates(self):
        starts, ends = ts2start_end(["T-POS-B", "O", "B-X", "B-X"])
        assert (starts, ends) == ([0], [0])

    def test_polarity(self):
        tags = ["O", "T-POS-B", "T-POS", "O", "T-NEG-B"]
        starts, ends = ts2start_end(tags)
        assert ts2polarity(tags, starts, ends) == ["POS", "NEG"]


class TestSpanFeatures:
    def test_feature_layout(self, tmp_path, vocab_tokenizer):
        p = tmp_path / "train.txt"
        p.write_text(SPAN_LINE + "\n")
        ds = read_absa_data(str(p))
        examples = convert_absa_examples(ds)
        assert len(examples) == 1
        ex = examples[0]
        assert ex.term_texts == ["chuck bass"]
        assert ex.polarities == ["positive"]

        feats = convert_examples_to_features(examples, vocab_tokenizer, 32)
        f = feats[0]
        # words: rt @ltschuckbass : chuck bass is everything #mcm
        # wordpiece: rt | @ lts ##chuck ##bass | : | chuck | bass | is |
        #   everything | # mcm
        assert f.tokens == ["[CLS]", "rt", "@", "lts", "##chuck", "##bass", ":",
                            "chuck", "bass", "is", "everything", "#", "mcm",
                            "[SEP]"]
        # "chuck bass" at word idx 3..4 → token idx 7..8 (incl [CLS] offset)
        assert f.start_indexes[0] == 7
        assert f.end_indexes[0] == 8
        assert f.start_positions[7] == 1 and f.end_positions[8] == 1
        assert f.bio_labels[7] == 2 and f.bio_labels[8] == 1
        assert f.polarity_positions[7] == 2 and f.polarity_positions[8] == 2
        assert f.polarity_labels[0] == 2  # positive
        assert f.label_masks[0] == 1
        assert f.token_to_orig_map[7] == 3
        assert len(f.input_ids) == 32
        assert f.input_mask[:14] == [1] * 14 and f.input_mask[14] == 0

    def test_gold_candidates(self, tmp_path, vocab_tokenizer):
        p = tmp_path / "train.txt"
        p.write_text(SPAN_LINE + "\n")
        ds = read_absa_data(str(p))
        examples = convert_absa_examples(ds)
        feats = convert_examples_to_features(examples, vocab_tokenizer, 32)
        attach_gold_candidates(examples, feats, n_best_size=20, do_lower_case=True)
        f = feats[0]
        assert f.gold_span_starts[0] == 7 and f.gold_span_ends[0] == 8
        assert f.gold_span_labels[0] == 2
        assert f.gold_span_masks[0] == 1 and f.gold_span_masks[1] == 0
        assert len(f.gold_span_starts) == 20

        arrays = stack_span_features(feats)
        assert arrays["input_ids"].shape == (1, 32)
        assert arrays["span_starts"].shape == (1, 20)

    def test_truncation(self, vocab_tokenizer):
        from mtvaf_tpu.data.features import SemEvalExample
        ex = SemEvalExample(
            example_id="0", sent_tokens=["great"] * 30,
            term_texts=["great"], start_positions=[0], end_positions=[0],
            polarities=["positive"])
        feats = convert_examples_to_features([ex], vocab_tokenizer, 16)
        f = feats[0]
        assert len(f.tokens) == 16
        assert len(f.input_ids) == 16


class TestAgnMerge:
    def test_merge(self, tmp_path):
        p = tmp_path / "train.txt"
        p.write_text(SPAN_LINE + "\n")
        ds = read_absa_data(str(p))
        agn = tmp_path / "aux.txt"
        agn.write_text("17_06_315.jpg gossip girl tv\n")
        merged = read_agn_data(str(agn), ds)
        assert merged["words"][0][-3:] == ["gossip", "girl", "tv"]
        assert merged["ts_targets"][0][-3:] == ["B-X"] * 3


MMTSV = """IMGID:1860693
RT\tO
@ltsChuckBass\tO
Chuck\tB-POS
Bass\tI-POS
everything\tO

IMGID:16_05_01_100
bad\tB-NEG
battery\tI-NEG

"""


class TestMMReaders:
    def test_read_mmtsv(self, tmp_path):
        import json
        tsv = tmp_path / "train.txt"
        tsv.write_text(MMTSV)
        anp = tmp_path / "anp.json"
        anp.write_text(json.dumps({
            "1860693.jpg": {"b_anp": 0.25, "a_anp": 0.75}}))
        data, imgs, auxlabels, imagelabels = read_mmtsv(str(tsv), str(anp))
        assert len(data) == 2
        assert data[0][0][2] == "Chuck"
        assert data[0][1][2] == "B-POS"
        assert imgs == ["1860693.jpg", "16_05_01_100.jpg"]
        assert imagelabels[0] == {"b_anp": 0.25, "a_anp": 0.75}
        assert imagelabels[1] is None

    def test_mm_features(self, tmp_path, vocab_tokenizer):
        import json
        tsv = tmp_path / "train.txt"
        tsv.write_text(MMTSV)
        anp = tmp_path / "anp.json"
        anp.write_text(json.dumps({"1860693.jpg": {"b": 0.25, "a": 0.75}}))
        data, imgs, auxlabels, imagelabels = read_mmtsv(str(tsv), str(anp))
        examples = create_mm_examples(data, imgs, auxlabels, imagelabels, "train")
        feats = convert_mm_examples_to_features(
            examples, CRF_LABEL_LIST, CRF_LABEL_LIST, 32, vocab_tokenizer,
            num_anp_classes=4)
        f = feats[0]
        label_map = {label: i for i, label in enumerate(CRF_LABEL_LIST, 1)}
        assert f.label_id[0] == label_map["[CLS]"]
        # rt → O; @ltschuckbass → '@','lts','##chuck','##bass' → O,X,X,X
        assert f.label_id[1] == label_map["O"]
        assert f.label_id[2] == label_map["O"]
        assert f.label_id[3] == label_map["X"]
        # sorted ANP keys: a=0.75, b=0.25
        assert f.imagelabel[:2] == [0.75, 0.25]
        arrays = stack_mm_features(feats)
        assert arrays["label_ids"].shape == (2, 32)
        assert arrays["imagelabel"].shape == (2, 4)

    def test_merge_examples(self, tmp_path):
        import json
        tsv = tmp_path / "train.txt"
        tsv.write_text(MMTSV)
        anp = tmp_path / "anp.json"
        anp.write_text("{}")
        ctx = tmp_path / "merge_train.txt"
        ctx.write_text("1860693.jpg [SEP] a man in a suit\n")
        data, imgs, auxlabels, imagelabels = read_mmtsv(str(tsv), str(anp))
        vc = read_visual_context(str(ctx))
        examples = create_mm_examples(data, imgs, auxlabels, imagelabels,
                                      "train", visual_context=vc)
        assert examples[0].text_a.endswith(" [SEP] a man in a suit")
        assert " [SEP] " not in examples[1].text_a


class TestPrefetch:
    def test_order_preserved(self):
        from mtvaf_tpu.data.datasets import prefetch
        assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

    def test_exception_propagates(self):
        from mtvaf_tpu.data.datasets import prefetch

        def gen():
            yield 1
            raise RuntimeError("boom")

        it = prefetch(gen(), size=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)
