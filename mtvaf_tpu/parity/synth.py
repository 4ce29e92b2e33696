"""Synthetic reference-layout data tree + checkpoints for parity dry runs.

Builds everything the five BASELINE.json configs touch, in the exact layout
the reference's path tables expect (MTVAF_training.py:52-192): span and CRF
text files, ANP JSONs, AGN aux/merge/caption files, main + aux-crop images,
aux-image dicts (.pth), a tiny-but-real HF BERT and RoBERTa checkpoint and
random torchvision-layout ResNet weights.  ``mtvaf-parity --dry_run`` runs
the full harness against this tree to validate the plumbing end-to-end
without the (non-redistributable) real data.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

from ..data.synthetic import (make_agn_file, make_crf_files, make_images,
                              make_merge_file, make_roberta_vocab,
                              make_span_file, make_vocab_file)

# the tiny backbones stay 768-wide with >= 8 hidden layers: the reference
# hard-codes the probe at hidden 768 (models/bert_model.py:241-242) and taps
# encoder layer 7 for it, so anything smaller cannot run config 5
HIDDEN, LAYERS, HEADS, INTERMEDIATE = 768, 8, 12, 1024
_MODES = (("train", "train.txt"), ("dev", "valid.txt"), ("test", "test.txt"))


def _span_ids(n: int) -> List[str]:
    return [f"img_{i}.jpg" for i in range(n)]


def _crf_ids(n: int) -> List[str]:
    return [f"{700000 + i}.jpg" for i in range(n)]


def build_data_tree(root: str, *, years=("2015", "2017"), n: int = 8,
                    seed: int = 0) -> str:
    """Create ``<root>/data`` in the reference layout; returns its path."""
    import torch

    data = os.path.join(root, "data")
    for year in years:
        base = os.path.join(data, f"twitter{year}")
        os.makedirs(os.path.join(base, f"twitter{year}"), exist_ok=True)
        span_ids, crf_ids = _span_ids(n), _crf_ids(n)
        anp_merged: Dict[str, Dict[str, float]] = {}
        for mi, (mode, fname) in enumerate(_MODES):
            make_span_file(os.path.join(base, fname), n,
                           seed=seed + mi, image_ids=span_ids)
            anp_tmp = os.path.join(base, f"_anp_{mode}.json")
            # the reference hard-codes 2089 ANP classes (its vao KL loss
            # compares against the full image_output*.json distribution,
            # bert_model.py:458) — the synthetic ANP vectors must match
            make_crf_files(os.path.join(base, f"twitter{year}", fname),
                           anp_tmp, n, seed=seed + mi, num_anp=2089,
                           image_ids=crf_ids)
            with open(anp_tmp) as f:
                anp_merged.update(json.load(f))
            os.remove(anp_tmp)
            # aux-image dict: img -> crop file names under the crops dir
            crops = [f"crop_{i}_{k}.jpg" for i in range(n) for k in range(2)]
            aux_map = {img: [f"crop_{i}_{k}.jpg" for k in range(2)]
                       for i, img in enumerate(crf_ids)}
            aux_map.update({img: [f"crop_{i}_{k}.jpg" for k in range(2)]
                            for i, img in enumerate(span_ids)})
            ref_mode = "val" if mode == "dev" else mode
            torch.save(aux_map, os.path.join(
                base, f"twitter{year}_{ref_mode}_dict.pth"))
            make_images(os.path.join(data, f"twitter{year}_aux_images",
                                     ref_mode, "crops"), crops,
                        size=64, seed=seed + mi)
        # main images (span + crf ids) and the reference's hard-coded
        # missing-image fallback (modules/dataset.py:116,437)
        make_images(os.path.join(data, f"twitter{year}_images"),
                    span_ids + crf_ids + ["17_06_4705.jpg"],
                    size=64, seed=seed)
        os.makedirs(os.path.join(data, "ANP_data"), exist_ok=True)
        with open(os.path.join(data, "ANP_data",
                               f"image_output{year}.json"), "w") as f:
            json.dump(anp_merged, f)
        # AGN aux / merge / caption files for both pipelines
        agn = os.path.join(data, "AGN_data", f"twitter{year}")
        os.makedirs(agn, exist_ok=True)
        for mode, _ in _MODES:
            make_agn_file(os.path.join(agn, f"aux_{mode}.txt"),
                          span_ids, seed=seed)
            make_merge_file(os.path.join(agn, f"merge_{mode}.txt"),
                            crf_ids, seed=seed)
            make_merge_file(os.path.join(
                agn, f"{year[2:]}_{mode}_caption.txt"), crf_ids, seed=seed)
    return data


def build_bert_dir(path: str, *, kind: str = "bert", seed: int = 0,
                   hidden_size: int = HIDDEN, num_layers: int = LAYERS,
                   num_heads: int = HEADS,
                   intermediate: int = INTERMEDIATE) -> str:
    """REAL HF checkpoint directory (config.json + vocab +
    pytorch_model.bin) loadable by both the reference's forked
    ``from_pretrained`` and our converter; tiny by default,
    bert-base-shaped for throughput benches (bench_reference.py)."""
    import torch
    import transformers

    os.makedirs(path, exist_ok=True)
    torch.manual_seed(seed)
    if kind == "roberta":
        make_roberta_vocab(path)
        with open(os.path.join(path, "vocab.json")) as f:
            vocab_size = len(json.load(f))
        config = transformers.RobertaConfig(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_layers, num_attention_heads=num_heads,
            intermediate_size=intermediate, max_position_embeddings=514,
            type_vocab_size=1)
        model = transformers.RobertaModel(config)
    else:
        make_vocab_file(os.path.join(path, "vocab.txt"))
        with open(os.path.join(path, "vocab.txt")) as f:
            vocab_size = sum(1 for _ in f)
        config = transformers.BertConfig(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_layers, num_attention_heads=num_heads,
            intermediate_size=intermediate)
        model = transformers.BertModel(config)
    config.to_json_file(os.path.join(path, "config.json"))
    torch.save(model.state_dict(), os.path.join(path, "pytorch_model.bin"))
    return path


def build_resnet_pth(dir_path: str, *, depth: int = 152, seed: int = 0) -> str:
    """Random torchvision-layout ``resnet<depth>.pth`` (stage parity of the
    layout is covered by tests/test_resnet.py)."""
    import torch

    from .torchstubs import make_resnet
    os.makedirs(dir_path, exist_ok=True)
    torch.manual_seed(seed)
    model = make_resnet(depth)
    # frozen-BN stats must be non-trivial or both sides degenerate the same
    # way and hide layout bugs
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * .1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + .5)
    out = os.path.join(dir_path, f"resnet{depth}.pth")
    torch.save(model.state_dict(), out)
    return dir_path
