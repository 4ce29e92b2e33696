"""Tokenizer unit tests: golden WordPiece outputs (SURVEY.md §4)."""

import pytest

from mtvaf_tpu.data.tokenization import (
    BasicTokenizer, ByteLevelBPETokenizer, FullTokenizer, WordpieceTokenizer)


def make_vocab(tokens):
    return {t: i for i, t in enumerate(tokens)}


class TestBasicTokenizer:
    def test_lower_and_split(self):
        tok = BasicTokenizer(do_lower_case=True)
        assert tok.tokenize(" \tHeLLo!how  \n are You?  ") == \
            ["hello", "!", "how", "are", "you", "?"]

    def test_no_lower(self):
        tok = BasicTokenizer(do_lower_case=False)
        assert tok.tokenize("HeLLo How") == ["HeLLo", "How"]

    def test_accents(self):
        tok = BasicTokenizer(do_lower_case=True)
        assert tok.tokenize("Héllo") == ["hello"]

    def test_chinese(self):
        tok = BasicTokenizer()
        assert tok.tokenize("ah博推zz") == ["ah", "博", "推", "zz"]

    def test_punctuation_ascii_specials(self):
        tok = BasicTokenizer()
        assert tok.tokenize("a$b^c") == ["a", "$", "b", "^", "c"]

    def test_control_chars_removed(self):
        tok = BasicTokenizer()
        assert tok.tokenize("a\x00b�c") == ["abc"]


class TestWordpieceTokenizer:
    VOCAB = ["[UNK]", "[CLS]", "[SEP]", "want", "##want", "##ed", "wa", "un",
             "runn", "##ing"]

    def test_greedy_longest_match(self):
        tok = WordpieceTokenizer(vocab=make_vocab(self.VOCAB))
        assert tok.tokenize("unwanted running") == \
            ["un", "##want", "##ed", "runn", "##ing"]

    def test_unk_for_unmatchable(self):
        tok = WordpieceTokenizer(vocab=make_vocab(self.VOCAB))
        assert tok.tokenize("unwantedX") == ["[UNK]"]

    def test_empty(self):
        tok = WordpieceTokenizer(vocab=make_vocab(self.VOCAB))
        assert tok.tokenize("") == []

    def test_too_long_word(self):
        tok = WordpieceTokenizer(vocab=make_vocab(self.VOCAB))
        assert tok.tokenize("a" * 101) == ["[UNK]"]


class TestFullTokenizer:
    def test_end_to_end(self):
        vocab = make_vocab(["[UNK]", "[CLS]", "[SEP]", "want", "##want",
                            "##ed", "wa", "un", "runn", "##ing", ","])
        tok = FullTokenizer(vocab)
        tokens = tok.tokenize("UNwantéd,running")
        assert tokens == ["un", "##want", "##ed", ",", "runn", "##ing"]
        assert tok.convert_tokens_to_ids(tokens) == [7, 4, 5, 10, 8, 9]
        assert tok.convert_ids_to_tokens([7, 4, 5]) == ["un", "##want", "##ed"]

    def test_vs_hf_bert_tokenizer(self):
        """Golden parity vs HF BertTokenizer over a constructed vocab."""
        transformers = pytest.importorskip("transformers")
        import tempfile, os
        vocab_tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick",
                        "brown", "fox", "jump", "##s", "##ed", "over", "lazy",
                        "dog", "!", "#", "a", "b", "##c"]
        with tempfile.TemporaryDirectory() as d:
            vf = os.path.join(d, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(vocab_tokens) + "\n")
            hf = transformers.BertTokenizer(vf, do_lower_case=True)
            ours = FullTokenizer(vf, do_lower_case=True)
            for text in ["The quick brown Fox jumps!",
                         "jumped over the LAZY dog",
                         "abc a b #unknownword",
                         "  spaces\tand\nnewlines  "]:
                assert ours.tokenize(text) == hf.tokenize(text), text


class TestByteLevelBPE:
    def test_roundtrip(self, tmp_path):
        import json
        # Tiny GPT-2-style vocab: letters + one merge.
        vocab = {"h": 0, "e": 1, "l": 2, "o": 3, "he": 4, "Ġ": 5, "w": 6,
                 "<unk>": 7}
        merges = ["h e"]
        vf = tmp_path / "vocab.json"
        mf = tmp_path / "merges.txt"
        vf.write_text(json.dumps(vocab))
        mf.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
        tok = ByteLevelBPETokenizer(str(vf), str(mf))
        toks = tok.tokenize("hello")
        assert toks == ["he", "l", "l", "o"]
        assert tok.convert_tokens_to_ids(toks) == [4, 2, 2, 3]


class TestNeverSplit:
    def test_sep_passes_through(self):
        vocab = make_vocab(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "man",
                            "in", "suit", "[", "]", "sep"])
        tok = FullTokenizer(vocab)
        assert tok.tokenize("a man [SEP] in suit") == \
            ["a", "man", "[SEP]", "in", "suit"]

    def test_vs_hf_special_token(self):
        transformers = pytest.importorskip("transformers")
        import tempfile, os
        vocab_tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a",
                        "man", "in", "suit", "[", "]", "sep"]
        with tempfile.TemporaryDirectory() as d:
            vf = os.path.join(d, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(vocab_tokens) + "\n")
            hf = transformers.BertTokenizer(vf, do_lower_case=True)
            ours = FullTokenizer(vf, do_lower_case=True)
            text = "a man [SEP] in suit"
            assert ours.tokenize(text) == hf.tokenize(text)

    def test_native_accel_routes_specials_to_python(self):
        from mtvaf_tpu.native.binding import load_library, maybe_accelerate
        if load_library() is None:
            pytest.skip("native lib unavailable")
        vocab = make_vocab(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "man",
                            "in", "suit", "[", "]", "sep"])
        tok = FullTokenizer(vocab)
        fast = maybe_accelerate(tok)
        assert fast.tokenize("a man [SEP] in suit") == \
            tok.tokenize("a man [SEP] in suit")
