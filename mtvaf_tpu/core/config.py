"""Typed configuration for the framework.

Mirrors the reference argparse surface (MTVAF_training.py:203-281 in the
reference repo) as a validated dataclass.  Differences from the reference are
deliberate fixes documented in SURVEY.md §5 "Config / flag system":

* ``use_101 / use_34 / use_18`` are real flags here (the reference reads
  them from ``args`` but never defines them — models/bert_model.py:216-221).
* ``fp16`` exists and maps to bf16 mixed precision on TPU (the reference's
  apex path is dead code — modules/augument.py:46).
* invalid combinations are rejected at construction instead of crashing at
  first use.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


# Reference label inventories (modules/dataset.py:65,212; models/utils.py:16).
POLARITY_TO_ID = {"other": 0, "neutral": 1, "positive": 2, "negative": 3, "conflict": 4}
ID_TO_POLARITY = {v: k for k, v in POLARITY_TO_ID.items()}

# Pipeline A label list (modules/dataset.py:65).
SPAN_LABEL_LIST = [
    "O", "EQ", "B-POS", "I-POS", "E-POS", "S-POS", "B-NEG", "I-NEG", "E-NEG",
    "S-NEG", "B-NEU", "I-NEU", "E-NEU", "S-NEU", "[CLS]", "[SEP]",
]

# Pipeline B label list (modules/dataset.py:212).
CRF_LABEL_LIST = [
    "O", "B-NEU", "I-NEU", "B-POS", "I-POS", "B-NEG", "I-NEG", "X", "[CLS]", "[SEP]",
]

# Datasets routed to the span pipeline vs the CRF pipeline
# (MTVAF_training.py:32-50).
SPAN_DATASETS = ("twitter15", "twitter17")
CRF_DATASETS = ("twitter2015", "twitter2017")

RESNET_STAGE_CHANNELS = {
    18: (64, 128, 256, 512),
    34: (64, 128, 256, 512),
    50: (256, 512, 1024, 2048),
    101: (256, 512, 1024, 2048),
    152: (256, 512, 1024, 2048),
}


@dataclass
class Config:
    """Full training configuration.

    Field defaults follow MTVAF_training.py:203-281.
    """

    # -- model / data selection ------------------------------------------------
    dataset_name: str = "twitter15"
    bert_name: str = "bert-base-uncased"
    num_epochs: int = 35
    device: str = "tpu"
    train_batch_size: int = 32
    eval_batch_size: int = 16
    lr: float = 5e-5
    warmup_ratio: float = 0.01
    eval_begin_epoch: int = 16
    seed: int = 1

    # -- visual prefix ---------------------------------------------------------
    prefix_len: int = 4          # number of multi-scale guides; must be 4 when
                                 # use_prefix (4 ResNet stages, bert_model.py:383)
    prefix_dim: int = 800        # hidden dim of the prefix MLP (encoder_conv)
    use_prefix: bool = False
    use_152: bool = False
    use_101: bool = False
    use_34: bool = False
    use_18: bool = False
    resnet_root: Optional[str] = None   # directory with torchvision .pth weights
    vao: bool = False            # ANP KL-divergence supervision (pipeline B)
    noauxloss: bool = False      # drop the 3 aux-crop ANP losses
    num_anp_classes: int = 2089  # ANP vocabulary (bert_model.py:458)

    # -- auxiliary text channel ------------------------------------------------
    use_align: bool = False      # merge visual-context text after [SEP]
    only_caption: bool = False   # use caption-only merge files

    # -- probe -----------------------------------------------------------------
    use_probe: bool = False
    beta: float = 0.5            # CombineLoss super-parameter
    probe_rank: int = 384        # rank of the PSD probe projection (768/2)
    probe_layer: int = 7         # hidden layer tapped for the probe
    probe_ckpt: Optional[str] = None  # pretrained psdProbe .pt to warm-start
                                      # (reference models/bert_model.py:474-475)

    # -- GCN heads (optional) --------------------------------------------------
    gcn_layer_number: int = 0    # DiGCNModuleAtt depth
    num_layers: int = 0          # GCNBert (DualGCN) depth
    direct: bool = False
    embed_dim: int = 300
    post_dim: int = 30
    pos_dim: int = 30
    hidden_dim: int = 50
    input_dropout: float = 0.7
    gcn_dropout: float = 0.1
    bert_dropout: float = 0.3
    alpha: float = 0.25
    # NOTE: `beta` doubles as the GCNBert penalty weight in the reference.

    # -- augmentation ----------------------------------------------------------
    do_aug: bool = False
    aug_type: Optional[str] = None   # span_cutoff | token_cutoff | dim_cutoff
    aug_cutoff_ratio: float = 0.1
    aug_ce_loss: float = 1.0
    aug_js_loss: float = 1.0

    # -- run modes / IO --------------------------------------------------------
    do_train: bool = False
    only_test: bool = False
    load_path: Optional[str] = None
    save_path: Optional[str] = None
    use_pretrained: bool = False
    write_path: Optional[str] = None
    notes: str = ""
    cache_dir: str = "data/image_cache_dir/"

    # -- sequence / decoding ---------------------------------------------------
    max_seq: int = 128
    max_seq_agn: int = 500
    ignore_idx: int = -100
    sample_ratio: float = 1.0
    do_lower_case: bool = True
    n_best_size: int = 20
    max_answer_length: int = 12
    logit_threshold: float = 8.0
    filter_type: str = "f1"
    use_heuristics: bool = True
    use_nms: bool = True
    verbose_logging: bool = False

    # -- optimization / distributed --------------------------------------------
    gradient_accumulation_steps: int = 1
    fp16: bool = False           # on TPU: bf16 activations (no loss scaling)
    loss_scale: float = 0.0
    n_gpu: int = 1               # kept for config-surface parity; unused (SPMD)
    gpus: int = 1
    nodes: int = 1
    local_rank: int = -1

    # -- TPU-native knobs (new) ------------------------------------------------
    mesh_data: int = 0           # data-parallel mesh axis size; 0 = all devices
    mesh_model: int = 1          # tensor-parallel axis size (extensible)
    use_pallas_attention: bool = True
    bf16: bool = True            # bf16 activations, fp32 params/master
    cache_prefix_features: bool = True  # ResNet frozen → cache stage features
    guide_cache_size: int = 8192        # max images whose guides stay in host
                                        # RAM (LRU; ~245 KB/image); evicted
                                        # entries spill to a .npy disk cache
    guide_cache_device_items: int = 8192  # device-RESIDENT bf16 guide table
                                        # rows (~123 KB/image HBM); batches
                                        # gather on device — no per-step
                                        # guide upload. 0 disables. Engages
                                        # on bf16 runs, single-device and
                                        # single-host SPMD meshes alike
                                        # (table replicated over the mesh).
    deterministic_eval_images: bool = True  # center crop at eval (survey §5)
    profile_dir: Optional[str] = None   # jax.profiler trace output directory
    profile_steps: int = 5              # trace window length (train steps)
    log_grad_norm: bool = False         # global grad-norm metric → TensorBoard
                                        # (full-tree fp32 reduce, ~0.8 ms/step)
    remat: bool = False                 # checkpoint encoder layers (recompute
                                        # activations in backward; for larger
                                        # backbones / long context)
    selective_remat: bool = True        # checkpoint the XLA attention core
                                        # only: kills the scan-stacked fp32
                                        # probs stash for one scores+softmax
                                        # recompute per layer (same math;
                                        # rationale in nn/bert.BertConfig)
    save_checkpoints: bool = False      # full train-state checkpoint per epoch
    checkpoint_every: int = 1           # checkpoint every N epochs (writes are
                                        # async but serialize with each other;
                                        # raise N when epochs are shorter than
                                        # a ~1.7 GB state write)
    resume: bool = False                # resume from latest checkpoint
    optimizer_mu_bf16: bool = True      # AdamW first moment in bf16 (halves
                                        # its HBM traffic, ~1.4ms/step; second
                                        # moment + params stay fp32)
    params_bf16: bool = False           # live params stored in bf16 with an
                                        # fp32 master inside the optimizer
                                        # state (torch-AMP master-weight
                                        # semantics): fwd+bwd read half the
                                        # parameter bytes; AdamW walks the
                                        # fp32 master and re-casts. Off by
                                        # default — fp32 live params keep
                                        # torch-interop checkpoints and
                                        # parity tests bit-exact.
    span_ac_loss_mode: str = "reference"  # 'reference' (unmasked mean CE —
                                          # the reference's mask is a no-op,
                                          # models/bert_model.py:302-303) or
                                          # 'masked' (the evident intent)
    deterministic: bool = False         # disable ALL train-time dropout (the
                                        # trainers pass no RNG into the step):
                                        # bit-reproducible runs for debugging
                                        # and code-vs-code parity oracles.
                                        # The reference has no equivalent
                                        # (its dropout is always live in
                                        # train mode).
    groups_mode: str = "all"            # optimizer param-group surface on
                                        # prefix runs: 'reference' replicates
                                        # multiModal_before_train exactly
                                        # (projectors/ANP heads and pipeline-A
                                        # task heads LEFT OUT of the optimizer,
                                        # modules/train.py:468-493,894-926);
                                        # 'all' trains them at base lr (the
                                        # evident intent; PARITY deviation #3)

    crf_decode_impl: str = "scan"       # Viterbi implementation: 'scan'
                                        # (sequential, bit-matches torchcrf
                                        # tie-breaking) or 'parallel'
                                        # (O(log S)-depth max-plus prefix
                                        # products + pointer-doubling
                                        # backtrace; fp-reordered adds may
                                        # break exact ties differently).
                                        # Measured at (B32, S128, N13) the
                                        # parallel variant LOSES (+1.7 ms
                                        # fused step: the (S,N,N) prefix
                                        # products do ~N/2 x the work of the
                                        # sequential maxes) — it is kept as
                                        # the escape hatch for long-S /
                                        # wide-N tag sets (bench_crf_probe.py)

    def __post_init__(self):
        if self.crf_decode_impl not in ("scan", "parallel"):
            raise ValueError(
                f"crf_decode_impl must be 'scan' or 'parallel', got "
                f"{self.crf_decode_impl!r}")
        if self.dataset_name not in SPAN_DATASETS + CRF_DATASETS:
            raise ValueError(f"unknown dataset_name: {self.dataset_name!r}")
        if self.gradient_accumulation_steps < 1:
            raise ValueError("gradient_accumulation_steps must be >= 1")
        if self.train_batch_size % self.gradient_accumulation_steps != 0:
            raise ValueError(
                "train_batch_size must be divisible by "
                "gradient_accumulation_steps (micro-batching)")
        if self.use_prefix:
            if self.prefix_len != 4:
                raise ValueError(
                    "use_prefix requires prefix_len == 4 (one guide per ResNet "
                    "stage; reference models/bert_model.py:383 hard-codes the "
                    "4-chunk split)")
            n_variants = sum([self.use_152, self.use_101, self.use_34, self.use_18])
            if n_variants > 1:
                raise ValueError("at most one of use_152/use_101/use_34/use_18")
        if self.do_aug and self.aug_type not in (
                "span_cutoff", "token_cutoff", "dim_cutoff"):
            raise ValueError(f"do_aug requires a valid aug_type, got {self.aug_type!r}")
        if self.filter_type not in ("em", "f1"):
            raise ValueError(f"filter_type must be 'em' or 'f1', got {self.filter_type!r}")
        if self.sample_ratio <= 0 or self.sample_ratio > 1:
            raise ValueError("sample_ratio must be in (0, 1]")
        if self.checkpoint_every < 1:
            raise ValueError(
                "checkpoint_every must be >= 1 (use --no_save_checkpoints "
                "to disable checkpointing)")
        if self.deterministic and self.do_aug:
            raise ValueError(
                "deterministic training is incompatible with cutoff "
                "augmentation (--do_aug draws random cut masks)")
        if self.groups_mode not in ("all", "reference"):
            raise ValueError(
                f"groups_mode must be 'all' or 'reference', got "
                f"{self.groups_mode!r}")

    # ---------------------------------------------------------------------
    @property
    def is_span_pipeline(self) -> bool:
        return self.dataset_name in SPAN_DATASETS

    @property
    def is_roberta(self) -> bool:
        return "roberta" in self.bert_name

    @property
    def resnet_depth(self) -> int:
        if self.use_152:
            return 152
        if self.use_101:
            return 101
        if self.use_34:
            return 34
        if self.use_18:
            return 18
        return 50

    @property
    def resnet_concat_channels(self) -> int:
        """Per-stage channel sum after 2x2 pooling concat (3840 or 960)."""
        return sum(RESNET_STAGE_CHANNELS[self.resnet_depth])

    @property
    def type_num(self) -> int:
        """Dependency-type inventory for the DiGCN dep_embedding
        (reference models/utils.py:836: 100 if direct else 50)."""
        return 100 if self.direct else 50

    @property
    def effective_max_seq(self) -> int:
        return self.max_seq_agn if self.use_align else self.max_seq

    @property
    def label_list(self):
        return list(SPAN_LABEL_LIST if self.is_span_pipeline else CRF_LABEL_LIST)

    @property
    def num_crf_labels(self) -> int:
        # Reference: len(label_list) + 1 (labels are 1-indexed; 0 = PAD)
        return len(CRF_LABEL_LIST) + 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_from_args(argv=None) -> Config:
    """Parse the reference CLI flag surface into a Config."""
    import argparse

    p = argparse.ArgumentParser(description="MTVAF-TPU training")
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            # --flag sets True, --no_flag sets False (default from Config).
            group = p.add_mutually_exclusive_group()
            group.add_argument(name, dest=f.name, action="store_true",
                               default=f.default)
            group.add_argument("--no_" + f.name, dest=f.name,
                               action="store_false")
        elif f.default is None:
            p.add_argument(name, default=None, type=str)
        else:
            p.add_argument(name, default=f.default, type=type(f.default))
    args = p.parse_args(argv)
    return Config(**vars(args))
