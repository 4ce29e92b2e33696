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

__version__ = "0.1.0"
