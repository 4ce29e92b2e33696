"""Pallas TPU kernel: fused softmax attention with a prefix-KV block.

Implements the reference's prefix attention semantics exactly
(models/modeling_bert.py:282-286 + 1049-1050): keys/values are the
concatenation of a per-layer visual prefix and the token projections, the
additive mask covers prefix+sequence, and position ids never shift.  The
caller concatenates prefix KVs before invoking (cheap at P=16), so the kernel
sees q (B, H, S, D) and k/v (B, H, T, D) with T = P + S.

At MTVAF sizes (S=128..512, T=S+16, D=64) many heads of one batch element fit
VMEM together, so the grid is (B, H/hb) with an unrolled hb-head loop inside
each program — hb adapts to the sequence length (all 12 heads at S=128, 3 at
S=512; see _heads_per_program).  Fewer, fatter programs measured ~20% faster
than a (B, H) grid of tiny ones; scores never round-trip to HBM.  softmax
statistics are fp32; the backward pass recomputes probabilities flash-style
from the saved per-row log-sum-exp instead of saving the (S, T) matrix.

The public entry :func:`prefix_flash_attention` is a drop-in
``attention_impl`` for :mod:`mtvaf_tpu.nn.bert` (same signature as
``xla_attention``), including train-time attention-probability dropout
(reference models/modeling_bert.py:328): keep masks come from the per-core
hardware PRNG inside the kernel, and the backward pass regenerates them from
the same seed rather than saving (S, T) mask tensors.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(shape, rate):
    """Bernoulli(1-rate) keep mask scaled by 1/(1-rate) from the per-core
    PRNG stream (must be seeded first; draws advance the stream, so forward
    and backward must draw in the same order to see the same masks)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return (bits >= threshold).astype(jnp.float32) / (1.0 - rate)


# KV-dimension chunk width for the backward pass (and the dropout-mask draw
# granularity in BOTH passes — masks are drawn per chunk so the two passes
# agree no matter how each one blocks heads).  Two 128-lane tiles; the
# backward's VMEM budget (_heads_per_program_bwd) assumes (S, _T_CHUNK)
# intermediates.
_T_CHUNK = 256


def _t_chunks(t: int):
    """Static (offset, size) chunk list covering the KV dimension."""
    return [(off, min(_T_CHUNK, t - off)) for off in range(0, t, _T_CHUNK)]


def _seed_head(seed_ref, heads: int, h: int):
    """Seed the per-core PRNG for one (batch, GLOBAL head) pair — invariant
    to the head-block factor, so forward and backward may block heads
    differently and still regenerate identical mask streams.  (The hardware
    accepts 2 seed words: the rng-derived word + the folded position.)"""
    total = pl.num_programs(1) * heads
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * total
                    + pl.program_id(1) * heads + h)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, lse_ref, *,
                scale, heads, rate):
    bias = bias_ref[0].astype(jnp.float32)            # (1|S, T)
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32)           # (S, D)
        k = k_ref[0, h].astype(jnp.float32)           # (T, D)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            # dropout on normalized probs a = p/l ⇒ scale the unnormalized p;
            # lse stays the dropout-free softmax statistic.  Masks are drawn
            # per T-chunk in the same (head, chunk) order as the backward.
            _seed_head(seed_ref, heads, h)
            keep = jnp.concatenate(
                [_keep_mask((p.shape[0], size), rate)
                 for _, size in _t_chunks(p.shape[1])], axis=1)
            p = p * keep
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / l
        o_ref[0, h] = o.astype(o_ref.dtype)
        lse_ref[0, h] = m + jnp.log(l)          # (S, 1)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, lse_ref,
                do_ref, dq_ref, dk_ref, dv_ref, *, scale, heads, rate):
    """KV-chunked backward: scores/probs/grad-intermediates exist only as
    (S, T_CHUNK) tiles, never the full (S, T) matrix — at S=512 this keeps
    the per-head working set ~4x smaller, so more heads fit one program
    (_heads_per_program_bwd) and nothing spills out of VMEM.  dk/dv stream
    out per chunk; dq accumulates in fp32 across chunks."""
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32)
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        lse = lse_ref[0, h, :, 0]                     # (S,)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)   # rowsum(do∘o)
        if rate > 0.0:
            _seed_head(seed_ref, heads, h)   # same stream as forward
        dq = jnp.zeros(q.shape, jnp.float32)
        for off, size in _t_chunks(k_ref.shape[2]):
            k = k_ref[0, h, off:off + size].astype(jnp.float32)
            v = v_ref[0, h, off:off + size].astype(jnp.float32)
            # slice at the REF level: a vector-level slice of the loaded
            # bias row carries a lane-offset layout Mosaic cannot broadcast
            # ("Invalid input layout" at the s+bias add)
            bias = bias_ref[0, :, off:off + size].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                * scale + bias
            p = jnp.exp(s - lse[:, None])             # (S, c) softmax probs a
            if rate > 0.0:
                # same seeding + chunk draw order as forward → same masks.
                # With y = a∘mask and o = y@v:  dv = yᵀdo;  da = (do vᵀ)∘mask;
                # ds = a∘(da − delta), delta = rowsum(do∘o) = rowsum(da∘a).
                keep = _keep_mask(p.shape, rate)
                y = p * keep
            else:
                keep = None
                y = p
            dv = jax.lax.dot_general(y, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if keep is not None:
                dp = dp * keep
            ds = p * (dp - delta)                     # (S, c)
            dq = dq + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            dk_ref[0, h, off:off + size] = dk.astype(dk_ref.dtype)
            dv_ref[0, h, off:off + size] = dv.astype(dv_ref.dtype)
        dq_ref[0, h] = dq.astype(dq_ref.dtype)


def _spec4(hb, s, d):
    return pl.BlockSpec((1, hb, s, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


def _spec3(s, t):
    return pl.BlockSpec((1, s, t), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _head_block(h: int, s: int, budget: int) -> int:
    hb = h
    while hb > 1 and (hb * s > budget or h % hb != 0):
        hb -= 1
    while h % hb != 0:
        hb -= 1
    return max(hb, 1)


def _heads_per_program(h: int, s: int) -> int:
    """Largest forward head block that keeps one program's working set in
    VMEM.  At S=128 all 12 heads fit one program (fewest grid iterations,
    measured fastest); at S=512 the (S, T) probs matrix caps the block.
    Budget: hb·S ≤ 1536 rows."""
    return _head_block(h, s, 1536)


def _heads_per_program_bwd(h: int, s: int) -> int:
    """Backward head block.  The KV-chunked backward never materializes the
    full (S, T) matrix — intermediates are (S, T_CHUNK) — so the per-head
    VMEM footprint is dominated by the 6 (S|T, D) head planes and the block
    can be ~2x the forward's (hb·S ≤ 3072: 6 heads at S=512)."""
    return _head_block(h, s, 3072)


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attention(q, k, v, bias, seed, scale, rate):
    o, _ = _attention_fwd_impl(q, k, v, bias, seed, scale, rate)
    return o


def _attention_fwd_impl(q, k, v, bias, seed, scale, rate):
    b, h, s, d = q.shape
    t = k.shape[2]
    hb = _heads_per_program(h, s)
    # bias (B, 1|H, 1|S, T) → (B, S_b, T); heads share the mask in this model.
    bias_f = jnp.broadcast_to(bias[:, 0], (b, bias.shape[2], t))

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=hb, rate=rate),
        grid=(b, h // hb),
        in_specs=[_spec4(hb, s, d), _spec4(hb, t, d), _spec4(hb, t, d),
                  _spec3(bias.shape[2], t), _seed_spec()],
        out_specs=(_spec4(hb, s, d), _spec4(hb, s, 1)),
        out_shape=(jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32)),
    )(q, k, v, bias_f, seed)
    return o, (q, k, v, bias_f, seed, o, lse)


def _attention_fwd(q, k, v, bias, seed, scale, rate):
    o, res = _attention_fwd_impl(q, k, v, bias, seed, scale, rate)
    return o, res + (bias.shape,)


def _attention_bwd(scale, rate, res, g):
    q, k, v, bias_f, seed, o, lse, bias_shape = res
    b, h, s, d = q.shape
    t = k.shape[2]
    hb = _heads_per_program_bwd(h, s)

    lse_spec = _spec4(hb, s, 1)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=hb, rate=rate),
        grid=(b, h // hb),
        in_specs=[_spec4(hb, s, d), _spec4(hb, t, d), _spec4(hb, t, d),
                  _spec3(bias_f.shape[1], t), _seed_spec(), _spec4(hb, s, d),
                  lse_spec, _spec4(hb, s, d)],
        out_specs=(_spec4(hb, s, d), _spec4(hb, t, d), _spec4(hb, t, d)),
        out_shape=(jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, t, d), v.dtype)),
    )(q, k, v, bias_f, seed, o, lse, g)

    # bias is a mask constant in this model (mask_to_bias over ints); seed is
    # an integer operand (float0 cotangent).
    dbias = jnp.zeros(bias_shape, dq.dtype)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


_attention.defvjp(_attention_fwd, _attention_bwd)

# numpy constant (a jnp zeros created under trace would leak the tracer
# through this module-level cache)
_ZERO_SEED = np.zeros((1,), np.int32)


def prefix_flash_attention(q, k, v, bias, *, dropout_rate: float = 0.0,
                           rng=None):
    """Drop-in ``attention_impl`` (see nn.bert.xla_attention signature).

    Attention-probability dropout (reference models/modeling_bert.py:328) is
    applied INSIDE the kernel when ``dropout_rate > 0`` and an rng is given:
    the per-core hardware PRNG is seeded per (example, head-block) program
    from the rng key, and the backward pass regenerates the same keep masks
    (same seed + draw order) instead of materializing (S, T) masks in HBM.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    if dropout_rate > 0.0 and rng is not None:
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
        return _attention(q, k, v, bias, seed, scale, float(dropout_rate))
    return _attention(q, k, v, bias, _ZERO_SEED, scale, 0.0)


# Dispatch crossover.  Two regimes, measured on v5e (flagship step):
#
# Plain XLA core (ckpt_core=False): the train lowering stashes the fp32
# (B, H, S, T) attention probs per layer for the backward; once that stash
# dominates HBM bandwidth/capacity the flash kernel — which recomputes
# probs from the saved lse — wins:
#   b32·s128 (B·S·T=0.6M):  XLA 840-878 vs flash ~790   → XLA
#   b64·s128 (1.2M):        XLA 949    vs flash 902     → XLA
#   b128·s128 (2.4M):       XLA 772    vs flash 860     → flash (+11%)
#   b32·s512 (8.7M):        XLA OOMs 16G vs flash 201   → flash
# Crossover sits between 1.2M and 2.4M B·S·T elements.
#
# Checkpointed XLA core (ckpt_core=True, bert_layer's selective_remat
# default): no probs stash exists, so volume no longer decides — XLA wins
# at s128 at EVERY batch (bench_attn_crossover.py: b64 1015.3 vs flash
# 953.8; b128 957.2 vs 929.6) and only genuinely long KV, where the fp32
# probs don't fit the cache hierarchy even transiently (and the recompute
# re-pays their full HBM round trip), favors flash.  s512 keeps flash
# (the XLA path OOMed 16 GB there even before the probs stash existed in
# the backward).  Threshold set between the measured points (T=144 XLA,
# T=528 flash).
_PALLAS_MIN_STASH = 2 * 1024 * 1024
_PALLAS_MIN_KV = 256


def _resolve_attention(q_shape, k_shape, ckpt_core: bool = False):
    """Trace-time dispatch decision for ``adaptive_attention`` — exposed as
    ``adaptive_attention.resolve`` so ``bert_layer`` can see WHICH core will
    run and wrap the XLA one in its remat (checkpointing the Pallas kernel
    would re-run its forward in the backward; its custom VJP already
    recomputes internally).  ``ckpt_core`` says the caller will checkpoint
    the XLA core, which moves the crossover (see above)."""
    from ..nn.bert import xla_attention
    b, _, s, _ = q_shape
    t = k_shape[2]
    if ckpt_core:
        return xla_attention if t < _PALLAS_MIN_KV else prefix_flash_attention
    if b * s * t < _PALLAS_MIN_STASH:
        return xla_attention
    return prefix_flash_attention


def adaptive_attention(q, k, v, bias, *, dropout_rate: float = 0.0, rng=None):
    """Shape-adaptive ``attention_impl``: XLA below the stash crossover,
    the Pallas flash kernel above (long sequence OR large batch).  Shapes
    are static under jit, so the dispatch resolves at trace time with zero
    runtime cost."""
    impl = _resolve_attention(q.shape, k.shape)
    return impl(q, k, v, bias, dropout_rate=dropout_rate, rng=rng)


adaptive_attention.resolve = _resolve_attention


def select_attention_impl(cfg, train: bool):
    """Pick the attention implementation for a phase.

    Both implementations cover the full semantics including train-time
    attention-prob dropout (the kernel via in-kernel PRNG); the choice is
    purely a per-shape performance decision (see adaptive_attention).
    """
    from ..nn.bert import xla_attention
    if not cfg.use_pallas_attention:
        return xla_attention
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return xla_attention
    return adaptive_attention
