"""Syntactic probe subsystem (SURVEY.md C13), fully on-device.

* :func:`probe_depths` — OneWordPSDProbe: squared L2 norm after a rank-384
  projection (reference probes/probe.py:50-79).
* :func:`construct_pseudo_labels` — the sort-and-quantize pseudo-depth labels
  (reference probes/constructLabel.py:11-29).  The reference runs O(B·L²)
  pure-Python loops on the host *inside the training step*; here it is a
  vectorized sort + ``lax.scan`` inside the jit graph.
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
    """
    norms = norms.astype(jnp.float32)
    b, s = norms.shape
    order = jnp.argsort(norms, axis=1)
    sorted_norms = jnp.take_along_axis(norms, order, axis=1)   # (B, S)

    def body(prev_label, n_j):
        # prev_label (B,), n_j (B,)
        inc = jnp.abs(n_j - prev_label) >= jnp.abs(prev_label + 1.0 - n_j)
        label = jnp.where(inc, prev_label + 1.0, prev_label)
        return label, label

    if s == 1:
        sorted_labels = jnp.ones((b, 1), jnp.float32)
    else:
        init = jnp.full((b,), 2.0, jnp.float32)     # sorted position 1 → 2
        _, rest = jax.lax.scan(body, init, jnp.swapaxes(sorted_norms, 0, 1)[2:])
        sorted_labels = jnp.concatenate(
            [jnp.ones((b, 1), jnp.float32),
             jnp.full((b, 1), 2.0, jnp.float32),
             jnp.swapaxes(rest, 0, 1)], axis=1)

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
