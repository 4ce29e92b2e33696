"""Command-line entry mirroring the reference ``MTVAF_training.py``.

Registry dispatch by dataset name (reference MTVAF_training.py:32-50), path
tables (:52-192) relative to ``--data_root``, seed setting, TensorBoard
writer, dataset/model/trainer construction, ``--do_train`` / ``--only_test``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import random
import sys
from typing import Optional

import numpy as np

from ..core.config import Config, config_from_args
from ..nn.bert import BertConfig

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s -   %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S", level=logging.INFO)
logger = logging.getLogger(__name__)


def data_paths(cfg: Config, data_root: str) -> dict:
    """Path table (reference MTVAF_training.py:52-192)."""
    name = cfg.dataset_name
    year = "2015" if "15" in name else "2017"
    base = os.path.join(data_root, f"twitter{year}")
    paths = {
        "train": os.path.join(base, "train.txt"),
        "dev": os.path.join(base, "valid.txt"),
        "test": os.path.join(base, "test.txt"),
        "img_dir": os.path.join(data_root, f"twitter{year}_images"),
        "aux_dir": {m: os.path.join(data_root, f"twitter{year}_aux_images",
                                    m if m != "dev" else "val", "crops")
                    for m in ("train", "dev", "test")},
        "aux_map": {m: os.path.join(base, f"twitter{year}_{'val' if m == 'dev' else m}_dict.pth")
                    for m in ("train", "dev", "test")},
        "anp": os.path.join(data_root, "ANP_data", f"image_output{year}.json"),
        "agn": {m: os.path.join(data_root, "AGN_data", f"twitter{year}",
                                f"aux_{m}.txt") for m in ("train", "dev", "test")},
        "merge": {m: os.path.join(data_root, "AGN_data", f"twitter{year}",
                                  f"merge_{m}.txt")
                  for m in ("train", "dev", "test")},
        "caption": {m: os.path.join(data_root, "AGN_data", f"twitter{year}",
                                    f"{year[2:]}_{m}_caption.txt")
                    for m in ("train", "dev", "test")},
        "gcn": {m: os.path.join(base, f"twitter{year[2:]}_{m}.json")
                for m in ("train", "dev", "test")},
    }
    if name in ("twitter2015", "twitter2017"):
        paths.update({
            "train": os.path.join(base, f"twitter{year}", "train.txt"),
            "dev": os.path.join(base, f"twitter{year}", "valid.txt"),
            "test": os.path.join(base, f"twitter{year}", "test.txt"),
        })
    return paths


def set_seed(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def load_aux_map(path: str) -> Optional[dict]:
    """Aux-image crop dict stored as a torch .pth (reference
    modules/dataset.py:36-37)."""
    if not os.path.exists(path):
        return None
    from ..core.checkpoint import load_torch_file
    try:
        return load_torch_file(path)
    except Exception:  # noqa: BLE001
        return None


def load_backbone_params(cfg: Config, bert_cfg: BertConfig):
    """HF checkpoint directory → bert params, or None for random init."""
    from ..core.convert import bert_params_from_torch
    path = cfg.bert_name
    if os.path.isdir(path):
        for fname in ("pytorch_model.bin", "model.pt"):
            full = os.path.join(path, fname)
            if os.path.exists(full):
                from ..core.checkpoint import load_torch_file
                sd = load_torch_file(full)
                return bert_params_from_torch(sd, bert_cfg.num_hidden_layers)
    logger.warning("no local weights for %s — random init", path)
    return None


# re-export: the loader lives in core/convert so the inference library can
# use it without importing this CLI module (which configures logging)
from ..core.convert import load_resnet  # noqa: E402,F401


def main(argv=None, bert_cfg_override: Optional[BertConfig] = None):
    # Accept --data_root in addition to the Config surface.
    argv = list(sys.argv[1:] if argv is None else argv)
    data_root = "data"
    if "--data_root" in argv:
        i = argv.index("--data_root")
        data_root = argv[i + 1]
        del argv[i:i + 2]

    cfg = config_from_args(argv)
    set_seed(cfg.seed)
    logger.info("config: %s", cfg)

    import jax

    from ..core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    # Multi-host SPMD: replaces the reference's
    # torch.distributed.init_process_group('nccl') (MTVAF_training.py:309).
    # Gradient all-reduce rides ICI within a slice and DCN across slices.
    if cfg.nodes > 1:
        jax.distributed.initialize()
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    from ..data.datasets import CrfDataset, SpanDataset
    from ..data.tokenization import build_tokenizer
    from ..kernels.prefix_attention import select_attention_impl
    from ..nn.models import init_crf_model_params, init_span_model_params
    from ..train.trainer_crf import CrfTrainer
    from ..train.trainer_span import SpanTrainer

    paths = data_paths(cfg, data_root)
    from ..native.binding import maybe_accelerate
    tokenizer = maybe_accelerate(
        build_tokenizer(cfg.bert_name, cfg.do_lower_case))
    bert_cfg = bert_cfg_override or BertConfig.from_hf_dir(
        cfg.bert_name, cfg.is_roberta)
    if cfg.remat or not cfg.selective_remat:
        bert_cfg = dataclasses.replace(
            bert_cfg, remat=cfg.remat, selective_remat=cfg.selective_remat)
    bert_params = load_backbone_params(cfg, bert_cfg)
    resnet_params = load_resnet(cfg) if cfg.use_prefix else None

    # Persist the run configuration next to the model artifacts so
    # inference can be rebuilt from the directory alone
    # (infer.load_predictor / the mtvaf-serve entry point).  Training runs
    # only: an --only_test re-run with different flags must not clobber
    # the config that describes best_model.npz.
    if cfg.do_train and cfg.save_path and jax.process_index() == 0:
        import json as _json
        os.makedirs(cfg.save_path, exist_ok=True)
        with open(os.path.join(cfg.save_path, "run_config.json"), "w") as f:
            _json.dump({"config": dataclasses.asdict(cfg),
                        "bert_config": dataclasses.asdict(bert_cfg)},
                       f, indent=1)

    writer = None
    try:
        from tensorboardX import SummaryWriter
        logdir = (f"logs/{cfg.dataset_name}_{cfg.train_batch_size}_"
                  f"{cfg.lr}{cfg.notes}")
        writer = SummaryWriter(logdir=logdir)
    except Exception:  # noqa: BLE001
        pass

    attention_impl = select_attention_impl(cfg, train=True)
    rng = jax.random.PRNGKey(cfg.seed)

    def span_ds(mode):
        gcn_file = None
        if (cfg.num_layers > 0 or cfg.gcn_layer_number > 0) and \
                os.path.exists(paths["gcn"][mode]):
            gcn_file = paths["gcn"][mode]
        return SpanDataset.load(
            cfg, tokenizer, paths[mode], mode=mode, img_dir=paths["img_dir"],
            aux_dir=paths["aux_dir"][mode],
            aux_map=load_aux_map(paths["aux_map"][mode]),
            agn_file=paths["agn"][mode] if cfg.use_align else None,
            gcn_file=gcn_file)

    def crf_ds(mode):
        merge = None
        if cfg.use_align:
            merge = paths["caption" if cfg.only_caption else "merge"][mode]
        return CrfDataset.load(
            cfg, tokenizer, paths[mode], paths["anp"], mode=mode,
            img_dir=paths["img_dir"], aux_dir=paths["aux_dir"][mode],
            aux_map=load_aux_map(paths["aux_map"][mode]), merge_file=merge)

    def maybe_load_probe(params):
        if cfg.use_probe and cfg.probe_ckpt and os.path.exists(cfg.probe_ckpt):
            from ..core.convert import load_probe_checkpoint
            params["probe"] = load_probe_checkpoint(cfg.probe_ckpt)
        return params

    if cfg.is_span_pipeline:
        train_d, dev_d, test_d = span_ds("train"), span_ds("dev"), span_ds("test")
        params = maybe_load_probe(init_span_model_params(
            rng, cfg, bert_cfg, bert_params=bert_params))
        trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=train_d,
                              dev_dataset=dev_d, test_dataset=test_d,
                              resnet_params=resnet_params, writer=writer,
                              attention_impl=attention_impl)
    else:
        train_d, dev_d, test_d = crf_ds("train"), crf_ds("dev"), crf_ds("test")
        params = maybe_load_probe(init_crf_model_params(
            rng, cfg, bert_cfg, bert_params=bert_params))
        trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=train_d,
                             dev_dataset=dev_d, test_dataset=test_d,
                             resnet_params=resnet_params, writer=writer,
                             attention_impl=attention_impl)

    if cfg.load_path:
        if cfg.use_pretrained:
            trainer.load_pretrained(cfg.load_path)
        else:
            from ..core.checkpoint import load_best
            trainer.state = trainer.state._replace(
                params=load_best(cfg.load_path, trainer.state.params))
            trainer._shard_state()

    metrics = {}
    if cfg.do_train:
        metrics["best_dev_f1"] = float(trainer.train())
        if cfg.is_span_pipeline:
            metrics["test_f1"] = float(trainer.test())
        else:
            metrics["test_f1"] = float(
                trainer.test(cfg.num_epochs, load_best_model=True))
    if cfg.only_test:
        if cfg.is_span_pipeline:
            metrics["test_f1"] = float(trainer.test())
        else:
            metrics["test_f1"] = float(
                trainer.test(cfg.num_epochs, load_best_model=True))
    # machine-readable run summary (consumed by mtvaf-parity; the reference
    # only exposes these through its log text)
    if metrics and cfg.save_path and jax.process_index() == 0:
        import json as _json
        with open(os.path.join(cfg.save_path, "final_metrics.json"),
                  "w") as f:
            _json.dump(metrics, f, indent=1)

    if writer:
        writer.close()
    return metrics


if __name__ == "__main__":
    main()
