"""SPMD tests on the 8-device virtual CPU mesh (SURVEY.md §4: the TPU-world
equivalent of multi-node tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.core.mesh import batch_sharding, make_mesh, param_sharding
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.train.optim import build_optimizer
from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                   make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(dataset_name="twitter2015", bf16=False)
    bert_cfg = BertConfig.tiny(hidden_size=32, num_attention_heads=4)
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    return cfg, bert_cfg, params


def make_batch(cfg, bert_cfg, b=8, s=12, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "input_ids": jnp.asarray(
            rng.randint(0, bert_cfg.vocab_size, (b, s)), jnp.int32),
        "input_mask": jnp.ones((b, s), jnp.int32),
        "segment_ids": jnp.zeros((b, s), jnp.int32),
        "label_ids": jnp.asarray(rng.randint(1, cfg.num_crf_labels, (b, s)),
                                 jnp.int32),
        "imagelabel": jnp.zeros((b, cfg.num_anp_classes), jnp.float32),
    }


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)


def test_param_sharding_specs():
    mesh = make_mesh(data=4, model=2)
    cfg = Config(dataset_name="twitter2015")
    bert_cfg = BertConfig.tiny(hidden_size=32, num_attention_heads=4)
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    shardings = param_sharding(mesh, params)
    # QKV kernels column-parallel over 'model'
    q_spec = shardings["bert"]["layers"]["attn"]["qkv"]["kernel"].spec
    assert q_spec == P(None, None, "model")
    out_spec = shardings["bert"]["layers"]["attn"]["out"]["kernel"].spec
    assert out_spec == P(None, "model", None)
    ln_spec = shardings["bert"]["layers"]["attn"]["ln"]["scale"].spec
    assert ln_spec == P()


def test_dp_loss_matches_single_device(setup):
    """Sharded-batch loss must equal the unsharded loss exactly (SPMD is a
    layout change, not a numerics change)."""
    cfg, bert_cfg, params = setup
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    batch = make_batch(cfg, bert_cfg)

    loss_single, _ = jax.jit(loss_fn)(params, batch, None)

    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    batch_sharded = {k: jax.device_put(v, sh) for k, v in batch.items()}
    params_rep = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    with mesh:
        loss_dp, _ = jax.jit(loss_fn)(params_rep, batch_sharded, None)
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)


def test_dp_train_step_matches_single_device(setup):
    cfg, bert_cfg, params = setup
    optimizer, _ = build_optimizer(params, cfg, total_steps=10, pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    step = make_train_step(loss_fn, optimizer, donate=False)
    batch = make_batch(cfg, bert_cfg, seed=1)
    rng = jax.random.PRNGKey(7)

    state1 = create_train_state(params, optimizer)
    state1, m1 = step(state1, batch, rng)

    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    state2 = create_train_state(
        jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh, P())), params), optimizer)
    batch_sharded = {k: jax.device_put(v, sh) for k, v in batch.items()}
    with mesh:
        state2, m2 = step(state2, batch_sharded, rng)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    # updated params agree
    a = jax.tree.leaves(state1.params)
    b = jax.tree.leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_tp_step_runs(setup):
    """DP×TP (4×2) mesh: partitioned params, one step executes, loss finite,
    and matches the replicated result."""
    cfg, bert_cfg, params = setup
    optimizer, _ = build_optimizer(params, cfg, total_steps=10, pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    step = make_train_step(loss_fn, optimizer, donate=False)
    batch = make_batch(cfg, bert_cfg, seed=2)
    rng = jax.random.PRNGKey(3)

    state_ref = create_train_state(params, optimizer)
    _, m_ref = step(state_ref, batch, rng)

    mesh = make_mesh(data=4, model=2)
    shardings = param_sharding(mesh, params)
    params_tp = jax.tree.map(lambda x, s: jax.device_put(x, s), params,
                             shardings)
    state = create_train_state(params_tp, optimizer)
    batch_sharded = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                     for k, v in batch.items()}
    with mesh:
        state, metrics = step(state, batch_sharded, rng)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)


def test_grad_accumulation_exact_identity(setup):
    """The scan-accumulated step applies EXACTLY the mean of the per-micro-
    batch gradients (fp32, no dropout): reproduce the update by computing
    jax.grad per micro-batch, averaging, and pushing through the same
    optimizer — resulting params must agree to float-roundoff (a 2x scaling
    bug would diverge by ~lr >> tolerance).  Loss metric must equal the mean
    of per-micro losses exactly."""
    cfg, bert_cfg, params = setup
    optimizer, _ = build_optimizer(params, cfg, total_steps=10, pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    batch = make_batch(cfg, bert_cfg, b=8, seed=3)
    micro = {k: v.reshape((2, 4) + v.shape[1:]) for k, v in batch.items()}

    step2 = make_train_step(loss_fn, optimizer, accum_steps=2, donate=False)
    s2 = create_train_state(params, optimizer)
    s2, m2 = step2(s2, micro, None)

    # reference: mean of standalone per-micro gradients through the same
    # optimizer (identical opt state, identical params)
    grad_fn = jax.jit(jax.grad(lambda p, b: loss_fn(p, b, None)[0]))
    micro_batches = [{k: v[i] for k, v in micro.items()} for i in range(2)]
    losses, grads = [], []
    for mb in micro_batches:
        losses.append(float(jax.jit(loss_fn)(params, mb, None)[0]))
        grads.append(grad_fn(params, mb))
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    s_ref = create_train_state(params, optimizer)
    updates, _ = optimizer.update(g_mean, s_ref.opt_state, s_ref.params)
    params_ref = jax.tree.map(lambda p, u: p + u, s_ref.params, updates)

    np.testing.assert_allclose(float(m2["loss"]), np.mean(losses), rtol=1e-6)
    for (path, y), x in zip(
            jax.tree_util.tree_flatten_with_path(s2.params)[0],
            jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-7,
            err_msg=f"accumulated update diverges at {path}")


def test_opt_state_follows_param_sharding(setup):
    """Optimizer moments (mu/nu) shard exactly like their params under TP —
    a replicated moment tree would waste memory and reshard every update."""
    from mtvaf_tpu.train.steps import shard_train_state

    cfg, bert_cfg, params = setup
    mesh = make_mesh(data=4, model=2)
    optimizer, _ = build_optimizer(params, cfg, total_steps=10,
                                   pipeline="crf")
    state = create_train_state(params, optimizer)
    state = shard_train_state(state, mesh)

    qkv = state.params["bert"]["layers"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, None, "model")
    # find the adam moments inside the optax chain state
    adam = next(s for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu")))
    mu_qkv = adam.mu["bert"]["layers"]["attn"]["qkv"]["kernel"]
    nu_qkv = adam.nu["bert"]["layers"]["attn"]["qkv"]["kernel"]
    assert mu_qkv.sharding.spec == P(None, None, "model")
    assert nu_qkv.sharding.spec == P(None, None, "model")
    # scalars stay replicated
    assert adam.count.sharding.spec == P()

    # the sharded state still trains (one DP x TP step)
    loss_fn = make_crf_loss_fn(cfg, bert_cfg)
    step = make_train_step(loss_fn, optimizer, donate=False)
    from mtvaf_tpu.core.mesh import batch_sharding as bsh
    batch = {k: jax.device_put(v, bsh(mesh))
             for k, v in make_batch(cfg, bert_cfg).items()}
    with mesh:
        state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
