"""Checkpoint/resume tests: interrupted training continues from the saved
epoch with optimizer state intact."""

import os

import numpy as np

import jax

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import CrfDataset
from mtvaf_tpu.data.synthetic import make_crf_files, make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.train.trainer_crf import CrfTrainer


def build(tmp_path, num_epochs, resume=False):
    tsv = tmp_path / "train.txt"
    anp = tmp_path / "anp.json"
    if not tsv.exists():
        make_crf_files(str(tsv), str(anp), 8, seed=0, num_anp=8)
        make_vocab_file(str(tmp_path / "vocab.txt"))
    tokenizer = FullTokenizer(str(tmp_path / "vocab.txt"))
    cfg = Config(dataset_name="twitter2015", max_seq=24, train_batch_size=4,
                 eval_batch_size=4, num_epochs=num_epochs, eval_begin_epoch=99,
                 bf16=False, num_anp_classes=8, lr=1e-3,
                 save_path=str(tmp_path / "out"), save_checkpoints=True,
                 resume=resume)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    return CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                      dev_dataset=ds, test_dataset=ds)


def test_resume_continues_training(tmp_path):
    # Phase 1: 2 epochs with checkpointing.
    t1 = build(tmp_path, num_epochs=2)
    t1.train()
    assert os.path.isdir(tmp_path / "out" / "ckpt")
    step_after_2 = int(t1.state.step)
    assert step_after_2 == 2 * 2  # 8 examples / batch 4 = 2 steps per epoch

    # Phase 2: resume with num_epochs=4 → continues from epoch 3.
    t2 = build(tmp_path, num_epochs=4, resume=True)
    t2.train()
    assert int(t2.state.step) == 4 * 2
    # resumed params differ from fresh init (they continued, not restarted)
    fresh = build(tmp_path, num_epochs=4)
    a = np.asarray(t2.state.params["fc"]["kernel"])
    b = np.asarray(fresh.state.params["fc"]["kernel"])
    assert not np.allclose(a, b)


def test_resume_noop_without_checkpoints(tmp_path):
    t = build(tmp_path, num_epochs=1, resume=True)
    t.train()  # no checkpoint present → starts from epoch 1
    assert int(t.state.step) == 2


def test_exact_resume_bit_identical(tmp_path):
    """A resumed run must be bit-identical to an uninterrupted one: the
    trainer RNG is checkpointed alongside the state and the epoch data order
    is a pure function of (seed, epoch)."""
    import shutil
    # Uninterrupted: 3 epochs in one go.
    d1 = tmp_path / "straight"
    d1.mkdir()
    t_straight = build(d1, num_epochs=3)
    t_straight.train()

    # Interrupted: same 3-epoch config (same LR schedule), stopped after
    # epoch 1, then resumed for epochs 2-3 in a new trainer.
    d2 = tmp_path / "resumed"
    d2.mkdir()
    t_a = build(d2, num_epochs=3)
    t_a.cfg = t_a.cfg.replace(num_epochs=1)   # stop after epoch 1
    t_a.train()
    t_b = build(d2, num_epochs=3, resume=True)
    t_b.train()

    assert int(t_b.state.step) == int(t_straight.state.step) == 6
    for x, y in zip(jax.tree.leaves(t_straight.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(t_straight.state.opt_state),
                    jax.tree.leaves(t_b.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(t_straight.rng),
                                  np.asarray(t_b.rng))


def test_checkpoint_every_throttles(tmp_path):
    """--checkpoint_every N writes only every Nth epoch's state."""
    import dataclasses
    t = build(tmp_path, num_epochs=4)
    t.cfg = dataclasses.replace(t.cfg, checkpoint_every=2)
    t.train()
    ckpt = tmp_path / "out" / "ckpt"
    steps = sorted(n for n in os.listdir(ckpt) if n.startswith("step_"))
    assert steps == ["step_2", "step_4"]


def test_graceful_preemption_sigterm(tmp_path):
    """A REAL SIGTERM mid-training stops the trainer at the epoch boundary
    with a checkpoint written (regardless of checkpoint_every), and a
    resumed run is bit-identical to an uninterrupted one."""
    import logging
    import signal

    from mtvaf_tpu.train import resume as resume_mod

    d1 = tmp_path / "straight"
    d1.mkdir()
    t_straight = build(d1, num_epochs=3)
    t_straight.train()

    d2 = tmp_path / "preempted"
    d2.mkdir()
    t_a = build(d2, num_epochs=3)
    # checkpoint_every=99: ONLY the preemption write may produce the ckpt
    t_a.cfg = t_a.cfg.replace(checkpoint_every=99)

    class _Sig(logging.Handler):
        def emit(self, record):
            if "epoch 1 train loss" in record.getMessage():
                os.kill(os.getpid(), signal.SIGTERM)   # delivered in-process

    resume_mod.clear_stop()
    h = _Sig()
    tlog = logging.getLogger("mtvaf_tpu.train.trainer_crf")
    old_level = tlog.level
    tlog.setLevel(logging.INFO)   # pytest roots at WARNING → INFO records
    tlog.addHandler(h)            # would never reach the hook otherwise
    try:
        t_a.train()
    finally:
        tlog.removeHandler(h)
        tlog.setLevel(old_level)
        resume_mod.clear_stop()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)

    assert int(t_a.state.step) == 2            # stopped after epoch 1
    assert os.path.isdir(d2 / "out" / "ckpt")  # preemption checkpoint

    t_b = build(d2, num_epochs=3, resume=True)
    t_b.train()
    assert int(t_b.state.step) == int(t_straight.state.step) == 6
    for x, y in zip(jax.tree.leaves(t_straight.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
