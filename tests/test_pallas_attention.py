"""Pallas prefix-KV attention kernel vs XLA reference (interpreter mode on
CPU; compiled path exercised on real TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.nn.bert import xla_attention
from mtvaf_tpu.nn.layers import mask_to_bias


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def make_inputs(B=1, H=2, S=16, P=4, D=8, seed=0):
    rng = np.random.RandomState(seed)
    T = S + P
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, -3:] = 0
    bias = mask_to_bias(jnp.asarray(mask))
    return q, k, v, bias


def test_forward_matches_xla():
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    q, k, v, bias = make_inputs()
    with jax.default_matmul_precision("highest"):
        ref = xla_attention(q, k, v, bias)
        got = prefix_flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backward_matches_xla():
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    q, k, v, bias = make_inputs(seed=1)

    def loss(fn, q, k, v):
        return (fn(q, k, v, bias) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(lambda *a: loss(xla_attention, *a), argnums=(0, 1, 2))(q, k, v)
        gg = jax.grad(lambda *a: loss(prefix_flash_attention, *a),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-4)


def test_heads_per_program_blocking():
    from mtvaf_tpu.kernels.prefix_attention import _heads_per_program
    assert _heads_per_program(12, 128) == 12   # all heads, one program
    assert _heads_per_program(12, 256) == 6
    assert _heads_per_program(12, 512) == 3    # VMEM-safe at long context
    assert _heads_per_program(12, 4096) == 1
    # always divides the head count
    for h in (4, 8, 12, 16):
        for s in (64, 128, 384, 512):
            hb = _heads_per_program(h, s)
            assert h % hb == 0 and hb >= 1


def test_partial_head_blocks_match_xla():
    """hb < H path (seq long enough to split heads across programs)."""
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    q, k, v, bias = make_inputs(B=1, H=4, S=512, P=4, D=8)
    with jax.default_matmul_precision("highest"):
        ref = xla_attention(q, k, v, bias)
        got = prefix_flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_adaptive_dispatch_by_stash_volume(monkeypatch):
    """adaptive_attention routes below-crossover shapes to XLA and
    above-crossover (long sequence OR large batch: B*S*T >= 2M) to the
    kernel — trace-time static dispatch; crossover measured in
    BENCH_SCALING / BENCH_LONGSEQ."""
    from mtvaf_tpu.kernels import prefix_attention as pa

    calls = []
    monkeypatch.setattr(
        pa, "prefix_flash_attention",
        lambda q, k, v, bias, **kw: calls.append("pallas") or
        xla_attention(q, k, v, bias))

    q, k, v, bias = make_inputs(S=16, P=4)           # tiny -> XLA
    out = pa.adaptive_attention(q, k, v, bias)
    assert calls == [] and out.shape == q.shape

    # reference scale b32 s128 (B*S*T = 0.6M) -> XLA
    q, k, v, bias = make_inputs(B=32, S=128, P=16, D=4)
    pa.adaptive_attention(q, k, v, bias)
    assert calls == []

    # long sequence at small batch -> kernel
    q, k, v, bias = make_inputs(B=32, S=512, P=16, D=4)
    pa.adaptive_attention(q, k, v, bias)
    assert calls == ["pallas"]

    # LARGE BATCH at short sequence (b128 s128: 2.4M) -> kernel
    q, k, v, bias = make_inputs(B=128, S=128, P=16, D=4)
    pa.adaptive_attention(q, k, v, bias)
    assert calls == ["pallas", "pallas"]


def test_resolve_with_checkpointed_core():
    """When the caller checkpoints the XLA core (bert_layer's
    selective_remat default) the probs stash doesn't exist, so dispatch
    ignores B·S·T volume and switches to the kernel only at long KV
    (measured: XLA wins every batch at s128; flash wins at s512)."""
    from mtvaf_tpu.kernels import prefix_attention as pa
    from mtvaf_tpu.nn.bert import xla_attention as xa

    res = pa.adaptive_attention.resolve
    # b128 s128 (T=144): volume rule says pallas, ckpt rule says XLA
    q = (128, 12, 128, 64)
    k = (128, 12, 144, 64)
    assert res(q, k) is pa.prefix_flash_attention
    assert res(q, k, ckpt_core=True) is xa
    # long KV (T=528): pallas either way
    q = (32, 12, 512, 64)
    k = (32, 12, 528, 64)
    assert res(q, k) is pa.prefix_flash_attention
    assert res(q, k, ckpt_core=True) is pa.prefix_flash_attention
    # tiny: XLA either way
    q = (2, 4, 16, 8)
    k = (2, 4, 20, 8)
    assert res(q, k) is xa
    assert res(q, k, ckpt_core=True) is xa


def test_backward_multi_chunk_matches_xla():
    """T > _T_CHUNK exercises the KV-chunked backward (several chunks incl.
    a ragged tail) — gradients must still match the XLA reference."""
    from mtvaf_tpu.kernels.prefix_attention import (_T_CHUNK, _t_chunks,
                                                    prefix_flash_attention)
    S, P = 2 * _T_CHUNK, 16           # T = 528: chunks 256 + 256 + 16
    q, k, v, bias = make_inputs(B=1, H=2, S=S, P=P, D=8, seed=3)
    assert len(_t_chunks(S + P)) == 3

    def loss(fn, q, k, v):
        return (fn(q, k, v, bias) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(lambda *a: loss(xla_attention, *a),
                      argnums=(0, 1, 2))(q, k, v)
        gg = jax.grad(lambda *a: loss(prefix_flash_attention, *a),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-4)


def test_bwd_head_block_budget():
    from mtvaf_tpu.kernels.prefix_attention import (_heads_per_program,
                                                    _heads_per_program_bwd)
    # chunked backward fits ~2x the forward's heads at long sequence
    assert _heads_per_program_bwd(12, 512) == 6
    assert _heads_per_program(12, 512) == 3
    assert _heads_per_program_bwd(12, 128) == 12


def test_bert_large_geometry_matches_xla():
    """bert-large geometry (16 heads, head_dim 64) at s512 + prefix 16:
    the block tables must split 16 heads cleanly at this scale and the
    kernel must match XLA forward AND backward — the supported-scale
    matrix row for larger backbones (BENCH_LONGSEQ.json carries the
    measured throughput)."""
    from mtvaf_tpu.kernels.prefix_attention import (_heads_per_program,
                                                    _heads_per_program_bwd,
                                                    prefix_flash_attention)
    hb_f = _heads_per_program(16, 512)
    hb_b = _heads_per_program_bwd(16, 512)
    assert 16 % hb_f == 0 and hb_f >= 1
    assert 16 % hb_b == 0 and hb_b >= 1

    q, k, v, bias = make_inputs(B=1, H=16, S=512, P=16, D=64, seed=2)
    with jax.default_matmul_precision("highest"):
        ref = xla_attention(q, k, v, bias)
        got = prefix_flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def loss(fn, q, k, v):
        return (fn(q, k, v, bias) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(lambda *a: loss(xla_attention, *a),
                      argnums=(0, 1, 2))(q, k, v)
        gg = jax.grad(lambda *a: loss(prefix_flash_attention, *a),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3,
                                   rtol=1e-3)
