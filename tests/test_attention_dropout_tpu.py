"""In-kernel attention-prob dropout validation — REAL TPU only.

``pltpu.prng_random_bits`` silently returns zeros in interpret mode, so these
checks need hardware (the rest of the kernel is covered in interpret mode by
test_pallas_attention.py).  The pytest suite runs on the virtual CPU mesh and
skips this file; run it on the chip via::

    python tests/test_attention_dropout_tpu.py

which executes the same three checks outside pytest (no conftest platform
override).  Last hardware run recorded in PARITY.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pltpu PRNG needs a real TPU (interpret mode yields zero bits)")


def make_inputs(B=1, H=2, S=16, P=4, D=8, seed=0):
    from mtvaf_tpu.nn.layers import mask_to_bias
    rng = np.random.RandomState(seed)
    T = S + P
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, -3:] = 0
    return q, k, v, mask_to_bias(jnp.asarray(mask))


def check_deterministic_and_gated():
    """Same rng → same output; rate=0 or rng=None → exact no-dropout path."""
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    q, k, v, bias = make_inputs(seed=2)
    f = jax.jit(lambda r, rate: prefix_flash_attention(
        q, k, v, bias, dropout_rate=rate, rng=r), static_argnums=1)
    base = np.asarray(f(jax.random.PRNGKey(5), 0.0))
    r1 = np.asarray(f(jax.random.PRNGKey(5), 0.3))
    r2 = np.asarray(f(jax.random.PRNGKey(5), 0.3))
    r3 = np.asarray(f(jax.random.PRNGKey(6), 0.3))
    np.testing.assert_array_equal(r1, r2)
    assert not np.allclose(r1, r3), "different keys must differ"
    assert not np.allclose(r1, base), "dropout must alter the output"
    # dropped entries exist but the output stays finite and non-degenerate
    assert np.isfinite(r1).all() and np.abs(r1).max() > 0


def check_mean_preserving():
    """E[dropout output] ≈ no-dropout output (1/(1-p) inverted scaling)."""
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    q, k, v, bias = make_inputs(seed=3)
    f = jax.jit(lambda r: prefix_flash_attention(
        q, k, v, bias, dropout_rate=0.25, rng=r))
    base = np.asarray(prefix_flash_attention(q, k, v, bias))
    acc = np.zeros_like(base)
    n = 128
    for i in range(n):
        acc += np.asarray(f(jax.random.PRNGKey(i)))
    np.testing.assert_allclose(acc / n, base, atol=0.25)


def check_forward_backward_vs_extracted_masks():
    """Extract the kernel's exact keep masks with a probe kernel replicating
    its seed + draw order, then compare forward AND gradients against an XLA
    reference that applies those masks — validating both the dropout math and
    the backward's mask regeneration."""
    import math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mtvaf_tpu.kernels.prefix_attention import (_heads_per_program,
                                                    _t_chunks,
                                                    prefix_flash_attention)
    B, H, S, P, D = 1, 2, 8, 4, 8
    T = S + P
    q, k, v, bias = make_inputs(B=B, H=H, S=S, P=P, D=D, seed=4)
    rate = 0.3
    rng = jax.random.PRNGKey(11)
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)

    hb = _heads_per_program(H, S)

    def probe(seed_ref, o_ref):
        # replicate the kernel's seed + draw order: per-(batch, GLOBAL head)
        # seeding, masks drawn per T-chunk
        for h in range(hb):
            total = pl.num_programs(1) * hb
            pltpu.prng_seed(seed_ref[0], pl.program_id(0) * total
                            + pl.program_id(1) * hb + h)
            thr = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
            chunks = [
                (pltpu.bitcast(pltpu.prng_random_bits((S, size)), jnp.uint32)
                 >= thr).astype(jnp.float32)
                for _, size in _t_chunks(T)]
            o_ref[0, h] = jnp.concatenate(chunks, axis=1)

    masks = pl.pallas_call(
        probe, grid=(B, H // hb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, hb, S, T), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, T), jnp.float32))(seed)
    M = jnp.asarray(np.asarray(masks)) / (1 - rate)
    assert 0.55 < float(np.asarray(masks).mean()) < 0.85  # ≈ 1-rate kept

    def ref_fn(q_, k_, v_):
        scores = jnp.einsum("bhsd,bhtd->bhst", q_, k_) / math.sqrt(D) + bias
        probs = jax.nn.softmax(scores, axis=-1) * M
        return jnp.einsum("bhst,bhtd->bhsd", probs, v_)

    w = jnp.asarray(np.random.RandomState(9).randn(B, H, S, D), jnp.float32)

    def loss_kernel(q_, k_, v_):
        return jnp.sum(prefix_flash_attention(
            q_, k_, v_, bias, dropout_rate=rate, rng=rng) * w)

    def loss_ref(q_, k_, v_):
        return jnp.sum(ref_fn(q_, k_, v_) * w)

    with jax.default_matmul_precision("highest"):
        o_kernel = prefix_flash_attention(q, k, v, bias, dropout_rate=rate,
                                          rng=rng)
        o_ref = ref_fn(q, k, v)
        np.testing.assert_allclose(np.asarray(o_kernel), np.asarray(o_ref),
                                   atol=1e-5)
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3,
                                       err_msg=f"grad {name}")


@requires_tpu
def test_dropout_deterministic_and_gated():
    check_deterministic_and_gated()


@requires_tpu
def test_dropout_mean_preserving():
    check_mean_preserving()


@requires_tpu
def test_dropout_vs_extracted_masks():
    check_forward_backward_vs_extracted_masks()


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))     # repo root (run as a script)
    print("backend:", jax.default_backend())
    check_deterministic_and_gated()
    print("deterministic+gated: OK")
    check_mean_preserving()
    print("mean-preserving: OK")
    check_forward_backward_vs_extracted_masks()
    print("forward+backward vs extracted masks: OK")
