"""Optional GCN heads (SURVEY.md C12), off by default in the reference
(``--gcn_layer_number 0``, ``--num_layers 0`` — MTVAF_training.py:229-230).

* :func:`digcn_forward` — DiGCNModuleAtt: stacked directional GCN-attention
  layers splitting the attention matrix into upper/diagonal/lower triangles
  with separate linears (reference models/bert_model.py:661-757).
* :func:`dualgcn_forward` — GCNBert/DualGCN: multi-head-attention-derived
  adjacency + dependency adjacency, biaffine cross passes, aspect-masked
  pooling, 3-way classifier, orthogonality + difference penalties
  (reference models/bert_model.py:759-859).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .layers import dense, dense_init, dropout, layer_norm, layer_norm_init


def _sample_layer_norm(params, x, *, eps: float = 1e-6):
    """The DualGCN reference's custom LayerNorm (models/bert_model.py:
    861-873): UNBIASED std (Bessel's n-1) with eps added to the STD —
    both unlike standard LN.  ~0.07% scale difference at hidden 768;
    kept exact for oracle parity."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = xf.shape[-1]
    var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (n - 1)
    y = (xf - mean) / (jnp.sqrt(var) + eps)
    y = y * params["scale"].astype(jnp.float32) \
        + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# DiGCN.


def init_digcn_params(rng, num_layers: int, hidden: int) -> Dict:
    layers = []
    for k in jax.random.split(rng, num_layers):
        ks = jax.random.split(k, 4)
        layers.append({
            "left": dense_init(ks[0], hidden, hidden),
            "self": dense_init(ks[1], hidden, hidden),
            "right": dense_init(ks[2], hidden, hidden),
            "ln": layer_norm_init(hidden),
        })
    return {"layers": layers}


def compress_valid_ids(seq, valid_ids):
    """Stable-compact rows flagged valid_ids==1 to the front, zero-fill the
    rest — static-shape equivalent of the reference's per-example Python loop
    (models/bert_model.py:271-281): ``valid_output[i][:n] = seq[i][valid==1]``.

    seq (B, S, H); valid_ids (B, S) int {0,1} → (B, S, H).
    """
    invalid = (valid_ids == 0)
    order = jnp.argsort(invalid, axis=1, stable=True)          # valid first
    gathered = jnp.take_along_axis(seq, order[..., None], axis=1)
    n_valid = jnp.sum(valid_ids != 0, axis=1, keepdims=True)
    keep = jnp.arange(seq.shape[1])[None, :] < n_valid
    return gathered * keep[..., None].astype(seq.dtype)


def _digcn_att(h, adj, temper):
    """Masked row-normalized attention (reference models/bert_model.py:693-700)."""
    u = jnp.einsum("bsh,bth->bst", h.astype(jnp.float32),
                   h.astype(jnp.float32)) / temper
    att = jax.nn.softmax(u, axis=-1)
    delta = att * adj.astype(jnp.float32)
    denom = delta.sum(axis=2, keepdims=True)
    return delta / (denom + 1e-10)


def digcn_forward(params: Dict, hidden_state, adjacency_matrix):
    """Stacked directional GCN layers; returns the last layer's output."""
    h = hidden_state
    hid = h.shape[-1]
    temper = hid ** 0.5
    s = h.shape[1]
    triu1 = jnp.triu(jnp.ones((s, s), jnp.float32), 1)
    diag = jnp.eye(s, dtype=jnp.float32)
    tril1 = jnp.tril(jnp.ones((s, s), jnp.float32), -1)
    for lp in params["layers"]:
        att = _digcn_att(h, adjacency_matrix, temper)
        left = dense(lp["left"], h)
        self_ = dense(lp["self"], h)
        right = dense(lp["right"], h)
        ctx = (jnp.einsum("bst,bth->bsh", att * triu1, left.astype(jnp.float32))
               + jnp.einsum("bst,bth->bsh", att * diag, self_.astype(jnp.float32))
               + jnp.einsum("bst,bth->bsh", att * tril1, right.astype(jnp.float32)))
        h = jax.nn.relu(layer_norm(lp["ln"], ctx.astype(h.dtype)))
    return h


# ---------------------------------------------------------------------------
# DualGCN (GCNBert).


def init_dualgcn_params(rng, num_layers: int, hidden: int,
                        attention_heads: int = 12) -> Dict:
    mem = hidden // 2
    ks = jax.random.split(rng, 8 + 2 * num_layers)
    params = {
        "layernorm": layer_norm_init(hidden),
        "attn_q": dense_init(ks[0], hidden, hidden),
        "attn_k": dense_init(ks[1], hidden, hidden),
        "affine1": jax.random.normal(ks[2], (mem, mem)) / math.sqrt(mem),
        "affine2": jax.random.normal(ks[3], (mem, mem)) / math.sqrt(mem),
        "classifier": dense_init(ks[4], hidden * 2, 3),
        "W": [], "weight_list": [],
    }
    for layer in range(num_layers):
        in_dim = hidden if layer == 0 else mem
        params["W"].append(dense_init(ks[5 + 2 * layer], in_dim, mem))
        params["weight_list"].append(dense_init(ks[6 + 2 * layer], in_dim, mem))
    return params


def _mha_adjacency(params, x, src_mask, heads: int, rng=None,
                   attn_dropout: float = 0.1):
    """Attention-matrix adjacency, averaged over heads
    (reference models/bert_model.py:890-910, 797-808)."""
    b, s, hid = x.shape
    dk = hid // heads
    q = dense(params["attn_q"], x).reshape(b, s, heads, dk).transpose(0, 2, 1, 3)
    k = dense(params["attn_k"], x).reshape(b, s, heads, dk).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(dk)
    mask = src_mask[:, None, None, :s]
    scores = jnp.where(mask == 0, -1e9, scores)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = dropout(probs, attn_dropout, rng)
    return probs.mean(axis=1)   # (B, S, S)


def dualgcn_forward(params: Dict, cfg, sequence_output, pooled_output, adj,
                    src_mask, aspect_mask, rng=None, heads: int = 12) -> Tuple:
    """Returns (logits (B, 3), penal scalar)."""
    rngs = [None] * 4 if rng is None else list(jax.random.split(rng, 4))
    num_layers = len(params["W"])
    b, s, hid = sequence_output.shape
    mem = hid // 2

    seq = _sample_layer_norm(params["layernorm"], sequence_output)
    gcn_inputs = dropout(seq, cfg.bert_dropout, rngs[0])
    pooled = dropout(pooled_output, cfg.bert_dropout, rngs[1])

    adj = adj.astype(jnp.float32)
    denom_dep = adj.sum(axis=2, keepdims=True) + 1
    adj_ag = _mha_adjacency(params, gcn_inputs, src_mask, heads=heads,
                            rng=rngs[2])
    eye = jnp.eye(s, dtype=jnp.float32)[None]
    adj_ag = adj_ag - adj_ag * eye + eye            # zero diag then add I
    adj_ag = src_mask[:, :s, None].astype(jnp.float32) * adj_ag
    denom_ag = adj_ag.sum(axis=2, keepdims=True) + 1

    outputs_ag = outputs_dep = gcn_inputs.astype(jnp.float32)
    for l in range(num_layers):
        ax_dep = jnp.einsum("bst,bth->bsh", adj, outputs_dep)
        axw_dep = dense(params["W"][l], ax_dep) / denom_dep
        g_dep = jax.nn.relu(axw_dep)

        ax_ag = jnp.einsum("bst,bth->bsh", adj_ag, outputs_ag)
        axw_ag = dense(params["weight_list"][l], ax_ag) / denom_ag
        g_ag = jax.nn.relu(axw_ag)

        a1 = jax.nn.softmax(
            jnp.einsum("bsm,mn,btn->bst", g_dep, params["affine1"], g_ag),
            axis=-1)
        a2 = jax.nn.softmax(
            jnp.einsum("bsm,mn,btn->bst", g_ag, params["affine2"], g_dep),
            axis=-1)
        g_dep2 = jnp.einsum("bst,bth->bsh", a1, g_ag)
        g_ag2 = jnp.einsum("bst,bth->bsh", a2, g_dep)
        if l < num_layers - 1:
            outputs_dep = dropout(g_dep2, cfg.gcn_dropout, rngs[3])
            outputs_ag = dropout(g_ag2, cfg.gcn_dropout, rngs[3])
        else:
            outputs_dep, outputs_ag = g_dep2, g_ag2

    asp_wn = aspect_mask.astype(jnp.float32).sum(axis=1, keepdims=True)
    amask = aspect_mask.astype(jnp.float32)[:, :, None]
    out1 = (outputs_ag * amask).sum(axis=1) / jnp.maximum(asp_wn, 1.0)
    out2 = (outputs_dep * amask).sum(axis=1) / jnp.maximum(asp_wn, 1.0)
    final = jnp.concatenate([out1, out2, pooled.astype(jnp.float32)], axis=-1)
    logits = dense(params["classifier"], final)

    adj_ag_t = jnp.swapaxes(adj_ag, 1, 2)
    identity = jnp.broadcast_to(eye, adj_ag.shape)
    ortho = jnp.einsum("bst,btu->bsu", adj_ag, adj_ag_t)
    ortho = ortho - ortho * identity + identity
    penal1 = jnp.linalg.norm(ortho - identity) / adj_ag.shape[0]
    penal2 = adj_ag.shape[0] / jnp.maximum(
        jnp.linalg.norm(adj_ag - adj), 1e-9)
    penal = cfg.alpha * penal1 + cfg.beta * penal2
    return logits, penal
