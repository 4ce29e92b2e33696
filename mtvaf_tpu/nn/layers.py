"""Functional NN primitives.

Parameters are nested dicts of ``jnp.ndarray`` (pytrees), modules are pure
functions — the idiomatic JAX shape for pjit/shard_map sharding and for
weight conversion from torch state dicts.  Kernels are stored ``(in, out)``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def dense_init(rng, in_dim: int, out_dim: int, *, stddev: Optional[float] = None,
               dtype=jnp.float32):
    if stddev is None:
        stddev = 1.0 / math.sqrt(in_dim)
    krng, _ = jax.random.split(rng)
    return {
        "kernel": (jax.random.normal(krng, (in_dim, out_dim), dtype) * stddev),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def dense(params, x, *, precision=None):
    y = jnp.dot(x, params["kernel"].astype(x.dtype), precision=precision)
    return y + params["bias"].astype(x.dtype)


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, *, eps: float = 1e-12):
    # Reduce in fp32 for bf16 stability, cast back to input dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def embedding_init(rng, num: int, dim: int, *, stddev: float = 0.02,
                   dtype=jnp.float32):
    return jax.random.normal(rng, (num, dim), dtype) * stddev


def embedding_lookup(table, ids, dtype=None):
    out = jnp.take(table, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out


def dropout(x, rate: float, rng: Optional[jax.Array]):
    """Inverted dropout; identity when rng is None (deterministic/eval)."""
    if rng is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


@jax.custom_vjp
def gelu(x):
    # erf-based gelu, matching torch.nn.functional.gelu default / HF "gelu".
    return jax.nn.gelu(x, approximate=False)


def _gelu_fwd(x):
    return gelu(x), x


def _gelu_bwd(x, g):
    # Analytic d/dx[x·Φ(x)] = Φ(x) + x·φ(x), recomputed from x.  Autodiff of
    # the erf form instead saves several (B, S, 4H)-wide intermediates —
    # under a scanned encoder those stack to (L, B, S, 4H) in HBM and the
    # stash traffic costs more than this one exp+erf recompute.
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(xf * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * xf * xf)
    return ((g.astype(jnp.float32) * (cdf + xf * pdf)).astype(x.dtype),)


gelu.defvjp(_gelu_fwd, _gelu_bwd)


def mask_to_bias(mask, dtype=jnp.float32):
    """(B, S) 0/1 mask → additive attention bias (B, 1, 1, S) with -10000 on
    masked positions (reference modeling_bert.py get_extended_attention_mask)."""
    return ((1.0 - mask.astype(dtype)) * -10000.0)[:, None, None, :]
