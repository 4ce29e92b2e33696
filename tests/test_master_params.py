"""--params_bf16: bf16 live params with an fp32 master in the optimizer
state (torch-AMP master-weight semantics).  The live params must stay the
EXACT bf16 cast of the master at every step — any drift channel between
them corrupts training invisibly — and the fp32-master trajectory must
track the plain fp32-param trajectory."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.train.optim import build_optimizer
from mtvaf_tpu.train.steps import (MasterState, create_train_state,
                                   export_params, make_crf_loss_fn,
                                   make_train_step, replace_params,
                                   shard_train_state)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(dataset_name="twitter2015", bf16=True)
    bert_cfg = BertConfig.tiny(hidden_size=32, num_attention_heads=4)
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    return cfg, bert_cfg, params


def make_batch(cfg, bert_cfg, b=8, s=12, seed=0, accum=1):
    rng = np.random.RandomState(seed)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, bert_cfg.vocab_size, (b, s)), jnp.int32),
        "input_mask": jnp.ones((b, s), jnp.int32),
        "segment_ids": jnp.zeros((b, s), jnp.int32),
        "label_ids": jnp.asarray(rng.randint(1, cfg.num_crf_labels, (b, s)),
                                 jnp.int32),
        "imagelabel": jnp.zeros((b, cfg.num_anp_classes), jnp.float32),
    }
    if accum > 1:
        batch = {k: v.reshape((accum, b // accum) + v.shape[1:])
                 for k, v in batch.items()}
    return batch


def _states(cfg, bert_cfg, params, accum=1):
    opt, _ = build_optimizer(params, cfg, total_steps=100, pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    step = make_train_step(loss_fn, opt, accum_steps=accum, donate=False)
    s32 = create_train_state(params, opt)
    s16 = create_train_state(params, opt, params_dtype=jnp.bfloat16)
    return step, s32, s16


def _assert_params_are_master_cast(state):
    assert isinstance(state.opt_state, MasterState)
    jax.tree.map(
        lambda p, m: np.testing.assert_array_equal(
            np.asarray(p, np.float32),
            np.asarray(m.astype(jnp.bfloat16), np.float32)),
        state.params, state.opt_state.master)


def test_params_stay_exact_cast_of_master(setup):
    cfg, bert_cfg, params = setup
    step, _, s16 = _states(cfg, bert_cfg, params)
    assert all(p.dtype == jnp.bfloat16 for p in jax.tree.leaves(s16.params))
    assert all(m.dtype == jnp.float32
               for m in jax.tree.leaves(s16.opt_state.master))
    rng = jax.random.PRNGKey(3)
    for i in range(3):
        batch = make_batch(cfg, bert_cfg, seed=i)
        s16, metrics = step(s16, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        _assert_params_are_master_cast(s16)
    assert int(s16.step) == 3


def test_master_trajectory_tracks_fp32_params(setup):
    """5 steps, deterministic (no dropout rng): the fp32 master must stay
    close to the plain fp32-param run — the only difference is bf16
    rounding of the weights the forward reads."""
    cfg, bert_cfg, params = setup
    step, s32, s16 = _states(cfg, bert_cfg, params)
    losses32, losses16 = [], []
    for i in range(5):
        batch = make_batch(cfg, bert_cfg, seed=i)
        s32, m32 = step(s32, batch, None)
        s16, m16 = step(s16, batch, None)
        losses32.append(float(m32["loss"]))
        losses16.append(float(m16["loss"]))
    np.testing.assert_allclose(losses16, losses32, rtol=2e-2)
    # both trained (loss moved), and the master stays within bf16-noise
    # of the fp32 params
    assert losses32[-1] != losses32[0]
    flat32 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s32.params)])
    flat16 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(export_params(s16))])
    np.testing.assert_allclose(flat16, flat32, atol=5e-2)


def test_accum_path_keeps_invariant(setup):
    cfg, bert_cfg, params = setup
    cfg2 = cfg.replace(gradient_accumulation_steps=2)
    step, _, s16 = _states(cfg2, bert_cfg, params, accum=2)
    batch = make_batch(cfg2, bert_cfg, seed=0, accum=2)
    s16, metrics = step(s16, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(np.mean(np.asarray(metrics["loss"]))))
    _assert_params_are_master_cast(s16)


def test_master_state_shards_like_params(setup):
    from mtvaf_tpu.core.mesh import make_mesh, param_sharding
    cfg, bert_cfg, params = setup
    mesh = make_mesh(data=4, model=2)
    opt, _ = build_optimizer(params, cfg, total_steps=100, pipeline="crf")
    s16 = create_train_state(params, opt, params_dtype=jnp.bfloat16)
    sharded = shard_train_state(s16, mesh)
    p_sh = param_sharding(mesh, params)
    qkv = sharded.opt_state.master["bert"]["layers"]["attn"]["qkv"]["kernel"]
    want = p_sh["bert"]["layers"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == want.spec
    assert qkv.dtype == jnp.float32
    _assert_params_are_master_cast(sharded)


def test_replace_and_export_params(setup):
    cfg, bert_cfg, params = setup
    opt, _ = build_optimizer(params, cfg, total_steps=100, pipeline="crf")
    s16 = create_train_state(params, opt, params_dtype=jnp.bfloat16)
    # export gives the fp32 master (bit-identical to the init params)
    jax.tree.map(lambda e, p: np.testing.assert_array_equal(
        np.asarray(e), np.asarray(p)), export_params(s16), params)
    # replace with a perturbed fp32 tree: master takes it exactly,
    # live params are its bf16 cast
    new = jax.tree.map(lambda p: p + 0.125, params)
    s16 = replace_params(s16, new)
    jax.tree.map(lambda m, n: np.testing.assert_array_equal(
        np.asarray(m), np.asarray(n)), s16.opt_state.master, new)
    _assert_params_are_master_cast(s16)
    # fp32 states pass through unchanged
    s32 = create_train_state(params, opt)
    s32b = replace_params(s32, new)
    assert s32b.params is new


def test_trainer_params_bf16_end_to_end(tmp_path):
    """CrfTrainer with --params_bf16: trains, best-model npz stores the
    fp32 master, and reloading it reproduces the dev predictions."""
    from mtvaf_tpu.data.datasets import CrfDataset
    from mtvaf_tpu.data.synthetic import make_crf_files, make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.train.trainer_crf import CrfTrainer

    d = str(tmp_path)
    make_crf_files(os.path.join(d, "train.txt"), os.path.join(d, "anp.json"),
                   8, seed=0, num_anp=8)
    make_vocab_file(os.path.join(d, "vocab.txt"))
    tok = FullTokenizer(os.path.join(d, "vocab.txt"))
    cfg = Config(dataset_name="twitter2015", params_bf16=True, num_epochs=1,
                 eval_begin_epoch=1, train_batch_size=4, eval_batch_size=4,
                 max_seq=16, num_anp_classes=8,
                 save_path=os.path.join(d, "out"))
    bc = BertConfig.tiny(vocab_size=len(tok.vocab))
    ds = CrfDataset.load(cfg, tok, os.path.join(d, "train.txt"),
                         os.path.join(d, "anp.json"))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
    trainer = CrfTrainer(cfg, bc, params, train_dataset=ds, dev_dataset=ds,
                         test_dataset=ds)
    trainer.train()
    _assert_params_are_master_cast(trainer.state)
    best = np.load(os.path.join(d, "out", "best_model.npz"))
    assert all(best[k].dtype == np.float32 for k in best.files)
    # reload into the live state: live params become the cast of the file
    trainer.test(epoch=1, load_best_model=True)
    _assert_params_are_master_cast(trainer.state)


def test_master_state_checkpoint_roundtrip(setup, tmp_path):
    """Full-state orbax save/restore with MasterState in opt_state."""
    from mtvaf_tpu.core.checkpoint import (load_checkpoint, save_checkpoint,
                                           wait_for_checkpoints)
    cfg, bert_cfg, params = setup
    step, _, s16 = _states(cfg, bert_cfg, params)
    s16, _ = step(s16, make_batch(cfg, bert_cfg, seed=0), jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), s16, step=1)
    wait_for_checkpoints()
    template = jax.tree.map(jnp.zeros_like, s16)
    restored = load_checkpoint(str(tmp_path), template, step=1)
    assert isinstance(restored.opt_state, MasterState)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)), restored, s16)
    _assert_params_are_master_cast(restored)
