"""MTVAF-TPU: a TPU-native (JAX/XLA/Pallas) framework for multimodal
aspect-based sentiment analysis, re-designed from scratch with the
capabilities of the MKMaS-GUET/MTVAF reference (PyTorch/CUDA).

Layers (bottom-up, mirroring SURVEY.md §1):
  data/     tokenization, readers, feature conversion, image pipeline
  nn/       BERT/RoBERTa encoder, ResNet, visual-prefix projector, CRF,
            probe, GCN heads, full models
  kernels/  Pallas TPU kernels (prefix-KV flash attention)
  core/     config, mesh/sharding, precision, rng, checkpointing, weight
            conversion
  train/    optimizers, schedules, jitted train/eval steps, trainers,
            cutoff augmentation
  eval/     span decoding/NMS (host), ABSA metrics, tagging metrics
  cli/      command-line entry mirroring MTVAF_training.py
"""

__version__ = "0.3.0"


def __getattr__(name):
    """Lazy public API (keeps `import mtvaf_tpu` free of jax import cost)."""
    surface = {
        "Config": ("mtvaf_tpu.core.config", "Config"),
        "BertConfig": ("mtvaf_tpu.nn.bert", "BertConfig"),
        "SpanDataset": ("mtvaf_tpu.data.datasets", "SpanDataset"),
        "CrfDataset": ("mtvaf_tpu.data.datasets", "CrfDataset"),
        "SpanTrainer": ("mtvaf_tpu.train.trainer_span", "SpanTrainer"),
        "CrfTrainer": ("mtvaf_tpu.train.trainer_crf", "CrfTrainer"),
        "SpanPredictor": ("mtvaf_tpu.infer", "SpanPredictor"),
        "CrfPredictor": ("mtvaf_tpu.infer", "CrfPredictor"),
        "FullTokenizer": ("mtvaf_tpu.data.tokenization", "FullTokenizer"),
        "build_tokenizer": ("mtvaf_tpu.data.tokenization", "build_tokenizer"),
    }
    if name in surface:
        import importlib
        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'mtvaf_tpu' has no attribute {name!r}")
