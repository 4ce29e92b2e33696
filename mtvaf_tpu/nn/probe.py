"""Syntactic probe subsystem (SURVEY.md C13), fully on-device.

* :func:`probe_depths` — OneWordPSDProbe: squared L2 norm after a rank-384
  projection (reference probes/probe.py:50-79).
* :func:`construct_pseudo_labels` — the sort-and-quantize pseudo-depth labels
  (reference probes/constructLabel.py:11-29).  The reference runs O(B·L²)
  pure-Python loops on the host *inside the training step*; here it is a
  vectorized sort + closed-form cumulative-min inside the jit graph.
* :func:`probe_loss` — MSE(norms, pseudo-labels)
  (reference probes/probe_trainModel.py:15-26).
* :func:`combine_loss` — ``loss + probe_loss·β·2^(−epoch)`` gated on
  probe_loss > 0.1 (reference probes/loss.py:13-18).  NOTE: both reference
  call sites pass a *constant* for ``epoch`` (num_epochs=35 for model A,
  30 for model B — models/bert_model.py:312,523), so the decay factor is a
  fixed small multiplier; reproduced faithfully.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_probe_params(rng, hidden_dim: int = 768, rank: int = 384) -> Dict:
    return {"proj": jax.random.uniform(rng, (hidden_dim, rank), jnp.float32,
                                       -0.05, 0.05)}


def probe_depths(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H) → per-token depth ‖B·h‖² (B, S)."""
    transformed = jnp.dot(hidden.astype(jnp.float32),
                          params["proj"].astype(jnp.float32))
    return jnp.sum(jnp.square(transformed), axis=-1)


def construct_pseudo_labels(norms: jnp.ndarray) -> jnp.ndarray:
    """Sort norms ascending, quantize gaps into integer depth labels, scatter
    back to original positions.

    Per row: label of the smallest norm is 1, second smallest 2, then each
    subsequent sorted norm keeps the previous label when it is closer to it
    than to label+1 (i.e. increments iff ``n_j >= prev_label + 0.5``)
    (reference probes/constructLabel.py:14-28).

    TPU-first closed form (replaces an S-step sequential scan whose tiny
    per-step work left the op latency-bound).  With 1-based sorted position
    ``j``, integer labels, and ``r_j = floor(n_j + 0.5)`` the recurrence
    ``L_j = L_{j-1} + [n_j >= L_{j-1} + 0.5]`` is exactly
    ``L_j = min(max(r_j, 2), L_{j-1} + 1)`` (the sorted norms make ``r``
    nondecreasing, so ``r_j < L_{j-1}`` can only happen while ``L`` still
    sits at its initial 2 — every later increment to ``L`` required
    ``r >= L`` and ``r`` never goes back down).  A pure min-plus recurrence
    unrolls to a running minimum:
    ``L_j = j + min_{2<=i<=j}(v_i - i)``, ``v_2 = 2``, ``v_i = max(r_i, 2)``
    — one ``cummin``, no sequential loop.
    """
    norms = norms.astype(jnp.float32)
    b, s = norms.shape
    order = jnp.argsort(norms, axis=1)
    sorted_norms = jnp.take_along_axis(norms, order, axis=1)   # (B, S)

    pos = jnp.arange(s, dtype=jnp.float32)[None, :]            # 0-based k = j-1
    r = jnp.maximum(jnp.floor(sorted_norms + 0.5), 2.0)
    v = jnp.where(pos == 1.0, 2.0, r)                          # v_2 = 2
    w = jnp.where(pos == 0.0, jnp.inf, v - (pos + 1.0))        # exclude j=1
    labels = (pos + 1.0) + jax.lax.cummin(w, axis=1)
    sorted_labels = jnp.where(pos == 0.0, 1.0, labels)         # L_1 = 1

    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(sorted_labels, inv, axis=1)


def probe_loss(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """MSE between probe depths and (stop-gradient) pseudo-labels."""
    norms = probe_depths(params, hidden)
    labels = jax.lax.stop_gradient(construct_pseudo_labels(norms))
    return jnp.mean(jnp.square(norms - labels))


def combine_loss(loss, p_loss, beta: float, epoch_const: int):
    """loss + probe_loss·β·2^(−epoch) when probe_loss > 0.1, else loss."""
    factor = beta * (2.0 ** (-epoch_const))
    return jnp.where(p_loss > 0.1, loss + p_loss * factor, loss)


# ---------------------------------------------------------------------------
# Probe family variants (reference probes/probe.py:9-152; unused by the
# training pipelines but part of the probe subsystem surface).


def two_word_distances(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """TwoWordPSDProbe: all-pairs squared L2 distance after projection,
    (B, S, H) → (B, S, S)."""
    t = jnp.dot(hidden.astype(jnp.float32), params["proj"].astype(jnp.float32))
    diffs = t[:, :, None, :] - t[:, None, :, :]
    return jnp.sum(jnp.square(diffs), axis=-1)


def init_nonpsd_probe_params(rng, hidden_dim: int = 768) -> Dict:
    return {"proj": jax.random.uniform(rng, (hidden_dim, hidden_dim),
                                       jnp.float32, -0.05, 0.05)}


def one_word_nonpsd_depths(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """OneWordNonPSDProbe: bilinear affinity h_i^T A h_i, (B, S, H) → (B, S)."""
    h = hidden.astype(jnp.float32)
    return jnp.einsum("bsh,hk,bsk->bs", h, params["proj"].astype(jnp.float32), h)


def two_word_nonpsd_scores(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """TwoWordNonPSDProbe: (h_i−h_j)^T A (h_i−h_j), (B, S, H) → (B, S, S)."""
    h = hidden.astype(jnp.float32)
    diffs = h[:, :, None, :] - h[:, None, :, :]
    return jnp.einsum("bsth,hk,bstk->bst", diffs,
                      params["proj"].astype(jnp.float32), diffs)
