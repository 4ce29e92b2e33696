"""TPU learning-run artifact: the COMPLETE production stack must LEARN on
the chip, not just step.

Trains the full multimodal CRF pipeline — JPEG files → image pipeline →
frozen-ResNet guide cache → visual prefix + VAO ANP KL + probe losses →
fused train step, in production bf16 — on a synthetic task with a learnable
rule (the sentiment word determines the adjacent aspect's polarity,
data/synthetic.make_learnable_crf_files) and records the dev-F1 trajectory.

Closes two evidence gaps no other artifact covers:
* the CPU learning-dynamics tests (tests/test_learning.py) run fp32
  text-only tiny models — this is bf16, multimodal, through the trainers'
  production ingest on real TPU hardware;
* accuracy parity vs the reference needs the non-redistributable Twitter
  data — a hardware run that demonstrably learns bounds the wiring/precision
  risk the parity oracles cannot reach.

The encoder is mid-width (256h/6L — the visual prefix generalizes over
width/layers; the reference hardcodes BERT-base) because no pretrained
weights exist in this image: a random-init encoder has to learn the rule
from scratch.  Prints ONE JSON line; writes BENCH_LEARN.json.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

EPOCHS = 20
N_TRAIN, N_DEV, BATCH = 256, 64, 32
LR, WARMUP = 1e-3, 0.1
TARGET_F1 = 0.8


def main():
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    import jax

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.datasets import CrfDataset
    from mtvaf_tpu.data.synthetic import (make_images,
                                          make_learnable_crf_files,
                                          make_vocab_file)
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params
    from mtvaf_tpu.train.trainer_crf import CrfTrainer

    class Recorder:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, tag=None, scalar_value=None, global_step=None,
                       **kw):
            self.scalars.setdefault(tag, []).append(float(scalar_value))

    t_start = time.perf_counter()
    with tempfile.TemporaryDirectory() as d:
        vocab = os.path.join(d, "vocab.txt")
        make_vocab_file(vocab)
        tok = FullTokenizer(vocab)
        # make_learnable_crf_files assigns image ids 800000..800003 round-robin
        img_ids = [f"{800000 + i}.jpg" for i in range(4)]
        img_dir = os.path.join(d, "imgs")
        make_images(img_dir, img_ids, size=96)
        make_learnable_crf_files(os.path.join(d, "train.txt"),
                                 os.path.join(d, "train_anp.json"),
                                 N_TRAIN, seed=0)
        make_learnable_crf_files(os.path.join(d, "dev.txt"),
                                 os.path.join(d, "dev_anp.json"),
                                 N_DEV, seed=99)

        cfg = Config(dataset_name="twitter2015", max_seq=16,
                     use_prefix=True, vao=True, use_probe=True, prefix_len=4,
                     num_anp_classes=8, train_batch_size=BATCH,
                     eval_batch_size=BATCH, num_epochs=EPOCHS,
                     eval_begin_epoch=1, lr=LR, warmup_ratio=WARMUP,
                     bf16=True,                 # production precision
                     cache_dir=os.path.join(d, "cache"),
                     save_path=os.path.join(d, "out"))
        bert_cfg = BertConfig.tiny(vocab_size=len(tok.vocab),
                                   hidden_size=256, num_attention_heads=4,
                                   intermediate_size=1024,
                                   num_hidden_layers=6)
        train_ds = CrfDataset.load(cfg, tok, os.path.join(d, "train.txt"),
                                   os.path.join(d, "train_anp.json"),
                                   img_dir=img_dir)
        dev_ds = CrfDataset.load(cfg, tok, os.path.join(d, "dev.txt"),
                                 os.path.join(d, "dev_anp.json"),
                                 img_dir=img_dir, mode="dev")

        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        resnet_params = init_resnet_params(jax.random.PRNGKey(1),
                                           depth=cfg.resnet_depth)
        writer = Recorder()
        trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=train_ds,
                             dev_dataset=dev_ds, test_dataset=dev_ds,
                             resnet_params=resnet_params, writer=writer)
        trainer.train()

    wall_s = time.perf_counter() - t_start
    out = {
        "metric": "tpu_learning_run_best_dev_f1",
        "value": round(trainer.best_dev_metric, 4),
        "unit": "entity F1",
        "target": TARGET_F1,
        "learned": trainer.best_dev_metric >= TARGET_F1,
        "dev_f1_per_epoch": [round(v, 4)
                             for v in writer.scalars.get("dev_f1", [])],
        "train_loss_per_epoch": [round(v, 4)
                                 for v in writer.scalars.get("train_loss", [])],
        "wall_s": round(wall_s, 1),
        "config": ("full multimodal CRF pipeline, bf16, prefix+vao+probe, "
                   f"{bert_cfg.num_hidden_layers}L/{bert_cfg.hidden_size}h "
                   f"random init, {N_TRAIN} learnable-rule examples, "
                   f"b{BATCH} s{cfg.max_seq}, {EPOCHS} epochs, TPU"),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LEARN.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
