"""CLI smoke test: full synthetic data tree → main() → artifacts."""

import json
import os

import pytest

from mtvaf_tpu.data.synthetic import (make_crf_files, make_span_file,
                                      make_vocab_file)
from mtvaf_tpu.nn.bert import BertConfig


@pytest.fixture
def data_tree(tmp_path):
    """Reference-layout data tree (MTVAF_training.py:52-107)."""
    root = tmp_path / "data"
    base15 = root / "twitter2015"
    (base15 / "twitter2015").mkdir(parents=True)
    for mode, fname in (("train", "train.txt"), ("dev", "valid.txt"),
                        ("test", "test.txt")):
        make_crf_files(str(base15 / "twitter2015" / fname),
                       str(tmp_path / f"anp_{mode}.json"), 8,
                       seed=hash(mode) % 100, num_anp=8)
        make_span_file(str(base15 / fname), 8, seed=hash(mode) % 100)
    anp_dir = root / "ANP_data"
    anp_dir.mkdir()
    # merge all mode anp files
    merged = {}
    for mode in ("train", "dev", "test"):
        with open(tmp_path / f"anp_{mode}.json") as f:
            merged.update(json.load(f))
    with open(anp_dir / "image_output2015.json", "w") as f:
        json.dump(merged, f)

    bert_dir = tmp_path / "bert"
    bert_dir.mkdir()
    make_vocab_file(str(bert_dir / "vocab.txt"))
    return root, bert_dir


def test_cli_crf_pipeline(tmp_path, data_tree):
    from mtvaf_tpu.cli.main import main
    from mtvaf_tpu.data.tokenization import load_vocab

    root, bert_dir = data_tree
    vocab_size = len(load_vocab(str(bert_dir / "vocab.txt")))
    save = tmp_path / "out"
    argv = ["--dataset_name", "twitter2015", "--do_train",
            "--bert_name", str(bert_dir), "--num_epochs", "1",
            "--eval_begin_epoch", "1", "--train_batch_size", "4",
            "--eval_batch_size", "4", "--max_seq", "32",
            "--save_path", str(save), "--data_root", str(root), "--no_bf16"]
    main(argv, bert_cfg_override=BertConfig.tiny(vocab_size=vocab_size))
    assert (save / "best_model.npz").exists()
    assert (save / "dev_predictions.json").exists()


def test_cli_crf_use_align(tmp_path, data_tree):
    """Config-2/4 shape: merged visual-context text after [SEP]
    (--use_align), exercising max_seq_agn and the merge reader through the
    CLI."""
    from mtvaf_tpu.cli.main import main
    from mtvaf_tpu.data.synthetic import make_merge_file
    from mtvaf_tpu.data.tokenization import load_vocab

    root, bert_dir = data_tree
    # image ids referenced by the synthetic crf files
    img_ids = sorted({f"{700000 + i}.jpg" for i in range(8)})
    agn_dir = root / "AGN_data" / "twitter2015"
    agn_dir.mkdir(parents=True, exist_ok=True)
    for mode in ("train", "dev", "test"):
        make_merge_file(str(agn_dir / f"merge_{mode}.txt"), img_ids)

    vocab_size = len(load_vocab(str(bert_dir / "vocab.txt")))
    save = tmp_path / "out_align"
    argv = ["--dataset_name", "twitter2015", "--do_train", "--use_align",
            "--bert_name", str(bert_dir), "--num_epochs", "1",
            "--eval_begin_epoch", "1", "--train_batch_size", "4",
            "--eval_batch_size", "4", "--max_seq_agn", "48",
            "--save_path", str(save), "--data_root", str(root), "--no_bf16"]
    main(argv, bert_cfg_override=BertConfig.tiny(vocab_size=vocab_size))
    assert (save / "best_model.npz").exists()


def test_cli_span_use_align(tmp_path, data_tree):
    """Pipeline-A AGN auxiliary-text merge through the CLI (--use_align):
    aux words appended with B-X tags (reference models/utils.py:763-786)."""
    from mtvaf_tpu.cli.main import main
    from mtvaf_tpu.data.synthetic import make_agn_file
    from mtvaf_tpu.data.tokenization import load_vocab

    root, bert_dir = data_tree
    img_ids = [f"img_{i}.jpg" for i in range(8)]
    agn_dir = root / "AGN_data" / "twitter2015"
    agn_dir.mkdir(parents=True, exist_ok=True)
    for mode in ("train", "dev", "test"):
        make_agn_file(str(agn_dir / f"aux_{mode}.txt"), img_ids)

    vocab_size = len(load_vocab(str(bert_dir / "vocab.txt")))
    save = tmp_path / "out_span_align"
    argv = ["--dataset_name", "twitter15", "--do_train", "--use_align",
            "--bert_name", str(bert_dir), "--num_epochs", "1",
            "--eval_begin_epoch", "1", "--train_batch_size", "4",
            "--eval_batch_size", "4", "--max_seq_agn", "48",
            "--n_best_size", "8", "--max_answer_length", "4",
            "--save_path", str(save), "--data_root", str(root), "--no_bf16"]
    main(argv, bert_cfg_override=BertConfig.tiny(vocab_size=vocab_size))
    assert (save / "best_model.npz").exists()


def test_cli_span_pipeline(tmp_path, data_tree):
    from mtvaf_tpu.cli.main import main
    from mtvaf_tpu.data.tokenization import load_vocab

    root, bert_dir = data_tree
    vocab_size = len(load_vocab(str(bert_dir / "vocab.txt")))
    save = tmp_path / "out_span"
    argv = ["--dataset_name", "twitter15", "--do_train",
            "--bert_name", str(bert_dir), "--num_epochs", "1",
            "--eval_begin_epoch", "1", "--train_batch_size", "4",
            "--eval_batch_size", "4", "--max_seq", "32",
            "--n_best_size", "8", "--max_answer_length", "4",
            "--save_path", str(save), "--data_root", str(root), "--no_bf16"]
    main(argv, bert_cfg_override=BertConfig.tiny(vocab_size=vocab_size))
    assert (save / "best_model.npz").exists()
    assert (save / "test_predictions.json").exists()
