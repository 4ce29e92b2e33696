"""Measure the REFERENCE's own training throughput (examples/s).

BASELINE.md's reference number is a derived ~25 ex/s estimate (the
reference publishes none).  This script replaces the estimate with a
measurement of the reference's ACTUAL per-step work — SATrainer2's train
loop body (modules/train.py:596-645): `_step` forward (2 BERT forwards on
prefix configs + 4 ResNet forwards per step, models/bert_model.py:256,379),
`loss.backward()`, AdamW + scheduler step, and the unconditional per-step
logits→CPU label collection — on whatever device torch sees.

  python bench_reference.py                  # flagship shape (c5: prefix+vao+probe)
  python bench_reference.py --text_only      # text-only CRF shape
  python bench_reference.py --device cuda    # on a GPU machine: the real baseline

In this image there is no GPU, so it reports a CPU number (still useful as
a lower bound / sanity anchor); on the reference's intended hardware it
produces the denominator for the ≥5x throughput target in minutes.
Missing reference deps (apex/torchcrf/torchvision/seqeval) are stubbed via
mtvaf_tpu.parity.torchstubs; real installs are preferred automatically.

Prints one JSON line: {"reference_train_examples_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser("bench_reference")
    p.add_argument("--reference_path", default="/root/reference")
    p.add_argument("--bert_name", default=None,
                   help="local bert-base-uncased dir; default: build a "
                        "random bert-base-SHAPED checkpoint in tmp (same "
                        "FLOPs as the real one)")
    p.add_argument("--device", default=None, help="cuda|cpu (default: auto)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_seq", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--text_only", action="store_true",
                   help="c1-shape text-only CRF step instead of the "
                        "flagship prefix+vao+probe step")
    ns = p.parse_args()

    sys.path.insert(0, REPO)
    import numpy as np
    import torch

    from mtvaf_tpu.parity.refrun import stage_reference
    from mtvaf_tpu.parity.synth import build_bert_dir, build_resnet_pth
    from mtvaf_tpu.parity.torchstubs import install_reference_stubs

    logging.basicConfig(level=logging.WARNING)
    stubbed = install_reference_stubs()
    device = ns.device or ("cuda" if torch.cuda.is_available() else "cpu")

    tmp = tempfile.mkdtemp(prefix="mtvaf_refbench_")
    staging = stage_reference(ns.reference_path, tmp, os.path.join(
        tmp, "staging"))
    sys.path.insert(0, staging)
    os.chdir(staging)   # the probe ckpt loads from ./models/ (bert_model.py:474)

    bert_name = ns.bert_name
    if bert_name is None:
        # bert-base-uncased geometry, random weights: identical step FLOPs
        bert_name = build_bert_dir(os.path.join(tmp, "bert"),
                                   hidden_size=768, num_layers=12,
                                   num_heads=12, intermediate=3072)
    resnet_root = build_resnet_pth(os.path.join(tmp, "resnets"), depth=152)

    import types

    from models.bert_model import TVNetSAModel2
    from modules.dataset import TVSAProcessor2
    from modules.train import SATrainer2

    use_prefix = not ns.text_only
    args = types.SimpleNamespace(
        bert_name=bert_name, device=device, num_epochs=1,
        train_batch_size=ns.batch_size, eval_batch_size=ns.batch_size,
        lr=5e-5, warmup_ratio=0.01, eval_begin_epoch=1, seed=1,
        prefix_len=10, prefix_dim=800, load_path=None, save_path=None,
        use_pretrained=False, use_prefix=use_prefix, use_align=False,
        only_caption=False, use_probe=use_prefix, use_152=use_prefix,
        # the model reads use_101/use_34/use_18 although MTVAF_training's
        # argparse never defines them (bert_model.py:216-220)
        use_101=False, use_34=False, use_18=False,
        vao=use_prefix, noauxloss=False, gcn_layer_number=0, num_layers=0,
        alpha=0.25, beta=0.5, resnet_root=resnet_root, do_aug=False,
        aug_type=None, aug_cutoff_ratio=0.1, aug_ce_loss=1.0,
        aug_js_loss=1.0, max_seq=ns.max_seq, ignore_idx=-100,
        sample_ratio=1.0, n_gpu=1, local_rank=-1,
        gradient_accumulation_steps=1)

    from transformers import BertTokenizer
    tokenizer = BertTokenizer.from_pretrained(bert_name, do_lower_case=True)
    label_list = TVSAProcessor2.get_labels(None)
    label_map = {label: i for i, label in enumerate(label_list, 1)}

    from models.utils import E2EASAOTProcessor
    type_num = E2EASAOTProcessor().get_type_num()
    torch.manual_seed(0)
    model = TVNetSAModel2(label_list, tokenizer, args, type_num)

    trainer = SATrainer2(model=model, args=args,
                         logger=logging.getLogger("bench_reference"),
                         label_map=label_map)
    trainer.train_num_steps = ns.steps + ns.warmup
    if use_prefix:
        trainer.multiModal_before_train()
    else:
        trainer.bert_before_train()

    b, s = ns.batch_size, ns.max_seq
    rng = np.random.RandomState(0)
    vocab_size = len(tokenizer)
    input_ids = torch.tensor(rng.randint(10, vocab_size, (b, s)))
    attention_mask = torch.ones(b, s, dtype=torch.long)
    segment_ids = torch.zeros(b, s, dtype=torch.long)
    labels = torch.tensor(rng.randint(1, 8, (b, s)))
    if use_prefix:
        imagelabel = torch.tensor(
            rng.dirichlet(np.ones(2089), size=b).astype(np.float32))
        images = torch.tensor(rng.randn(b, 3, 224, 224).astype(np.float32))
        aux_imgs = torch.tensor(
            rng.randn(b, 3, 3, 224, 224).astype(np.float32))
        batch = (input_ids, attention_mask, segment_ids, labels, labels,
                 imagelabel, images, aux_imgs)
    else:
        batch = (input_ids, attention_mask, segment_ids, labels)

    inv_label_map = {idx: label for label, idx in label_map.items()}
    inv_label_map[0] = "PAD"

    def one_step():
        # the reference train-loop body (modules/train.py:607-645)
        if args.use_probe:
            attention_mask_, labels_, logits, loss, prob_loss, img_loss = \
                trainer._step(batch, mode="train")
        else:
            attention_mask_, labels_, logits, loss = trainer._step(
                batch, mode="train")
        loss.backward()
        trainer.optimizer.step()
        trainer.scheduler.step()
        trainer.optimizer.zero_grad()
        # unconditional per-step logits→CPU label collection (train.py:625)
        label_ids = labels_.to("cpu").numpy()
        input_mask = attention_mask_.to("cpu").numpy()
        for row, mask_line in enumerate(input_mask):
            for column, mask in enumerate(mask_line):
                if column == 0:
                    continue
                if mask:
                    lab = inv_label_map[label_ids[row][column]]
                    if lab not in ("X", "[SEP]"):
                        _ = (lab, inv_label_map[int(logits[row][column])])
                else:
                    break

    model.train()
    for _ in range(ns.warmup):
        one_step()
    if device == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(ns.steps):
        one_step()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "reference_train_examples_per_sec": round(b * ns.steps / dt, 2),
        "step_ms": round(dt / ns.steps * 1e3, 1),
        "config": ("text-only CRF" if ns.text_only
                   else "flagship prefix+vao+probe"),
        "batch": b, "seq": s, "device": device,
        "torch": torch.__version__,
        "stubbed_deps": stubbed}))


if __name__ == "__main__":
    main()
