"""Linear-chain CRF: forward log-likelihood + Viterbi decoding.

TPU-native replacement for ``torchcrf.CRF`` (reference
models/bert_model.py:464,511,521).  Matching semantics:

* parameters ``start_transitions``, ``end_transitions`` (N,), ``transitions``
  (N, N), initialized U(-0.1, 0.1);
* log-likelihood = score(tags) − logsumexp over all paths, with padding
  handled by a 0/1 mask whose first timestep must be on;
* ``reduction='mean'`` averages the per-sequence log-likelihood over the
  batch (the reference trains with ``-crf(..., reduction='mean')``).

Everything is ``lax.scan``-based with static shapes: decode returns a padded
``(B, S)`` int array (host converts to tag lists), never a Python list.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def init_crf_params(rng, num_tags: int) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.1, 0.1)
    return {
        "start": u(k1, (num_tags,)),
        "end": u(k2, (num_tags,)),
        "transitions": u(k3, (num_tags, num_tags)),
    }


def _time_major(x):
    return jnp.swapaxes(x, 0, 1)


def crf_sequence_score(params, emissions, tags, mask):
    """Unnormalized score of a tag sequence, fully vectorized (no scan).

    emissions (B,S,N) fp32, tags (B,S) int, mask (B,S) in {0,1} with
    mask[:,0]=1 and contiguous (padding only at the tail — true for every
    dataset here; torchcrf has the same mask[:,0] requirement).
    """
    emissions = emissions.astype(jnp.float32)
    b, s, _ = emissions.shape
    maskf = mask.astype(jnp.float32)

    emit = jnp.take_along_axis(emissions, tags[..., None], axis=2)[..., 0]
    emit_score = (emit * maskf).sum(axis=1)

    trans = params["transitions"][tags[:, :-1], tags[:, 1:]]   # (B, S-1)
    trans_score = (trans * maskf[:, 1:]).sum(axis=1)

    lengths = mask.astype(jnp.int32).sum(axis=1)
    last_tags = jnp.take_along_axis(tags, (lengths - 1)[:, None], axis=1)[:, 0]
    return (params["start"][tags[:, 0]] + emit_score + trans_score
            + params["end"][last_tags])


def crf_log_normalizer(params, emissions, mask):
    """log Z via the forward algorithm.

    TPU-first: instead of a sequential S-step scan (latency-bound at tiny N),
    the recursion is a log-semiring matrix product evaluated with
    ``lax.associative_scan`` — log2(S) levels of batched (B, N, N)
    logsumexp-matmuls.  Masked steps contribute the semiring identity so the
    result matches the masked sequential recursion exactly.
    """
    emissions = emissions.astype(jnp.float32)
    b, s, n = emissions.shape
    maskf = mask.astype(jnp.float32)

    alpha0 = params["start"][None, :] + emissions[:, 0]       # (B, N)
    if s == 1:
        return jax.nn.logsumexp(alpha0 + params["end"][None, :], axis=1)

    # Step matrices M_i[prev, next] = trans[prev, next] + e_i[next] for real
    # steps; identity (0 diag / -inf off) for masked steps.
    mats = params["transitions"][None, None] + \
        emissions[:, 1:, None, :]                             # (B, S-1, N, N)
    ident = jnp.where(jnp.eye(n, dtype=bool), 0.0, NEG_INF)
    mats = jnp.where(maskf[:, 1:, None, None] > 0, mats, ident[None, None])

    def combine(a, b_):
        # log-semiring matmul: (B, T, N, N) ⊗ (B, T, N, N)
        return jax.nn.logsumexp(a[..., :, :, None] + b_[..., None, :, :],
                                axis=-2)

    prefix = jax.lax.associative_scan(combine, mats, axis=1)
    final = prefix[:, -1]                                     # (B, N, N)
    alpha = jax.nn.logsumexp(alpha0[:, :, None] + final, axis=1)
    return jax.nn.logsumexp(alpha + params["end"][None, :], axis=1)


def crf_log_likelihood(params, emissions, tags, mask, reduction: str = "mean"):
    """Log-likelihood matching torchcrf reductions."""
    llh = crf_sequence_score(params, emissions, tags, mask) - \
        crf_log_normalizer(params, emissions, mask)
    if reduction == "none":
        return llh
    if reduction == "sum":
        return llh.sum()
    if reduction == "mean":
        return llh.mean()
    if reduction == "token_mean":
        return llh.sum() / jnp.maximum(mask.astype(jnp.float32).sum(), 1.0)
    raise ValueError(f"unknown reduction {reduction!r}")


def crf_loss(params, emissions, tags, mask):
    """Training loss: -1 * llh mean (reference models/bert_model.py:521)."""
    return -crf_log_likelihood(params, emissions, tags, mask, "mean")


def crf_decode(params, emissions, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi decode.

    Returns (best_tags (B, S) int32, lengths (B,) int32).  Positions beyond a
    sequence's length repeat its last real tag (harmless: hosts slice by
    length, matching the reference's list-of-lists decode).
    """
    emissions = emissions.astype(jnp.float32)
    B, S, N = emissions.shape
    e_t = _time_major(emissions)
    mask_t = _time_major(mask).astype(jnp.float32)

    score0 = params["start"][None, :] + e_t[0]

    def fwd(score, xs):
        e_i, m_i = xs
        # broadcast: (B, prev, next)
        cand = score[:, :, None] + params["transitions"][None]
        best_prev = jnp.argmax(cand, axis=1)             # (B, N)
        new_score = jnp.max(cand, axis=1) + e_i
        score = jnp.where(m_i[:, None] > 0, new_score, score)
        # For masked steps the backpointer is identity (tag carried through).
        ident = jnp.broadcast_to(jnp.arange(N)[None, :], (B, N))
        bp = jnp.where(m_i[:, None] > 0, best_prev, ident)
        return score, bp

    final_score, bps = jax.lax.scan(fwd, score0, (e_t[1:], mask_t[1:]))
    final_score = final_score + params["end"][None, :]
    last_tag = jnp.argmax(final_score, axis=1).astype(jnp.int32)   # (B,)

    def bwd(tag, bp):
        prev = jnp.take_along_axis(bp, tag[:, None], axis=1)[:, 0]
        return prev.astype(jnp.int32), tag

    # Reverse scan: ys[i] is the tag at position i+1; the final carry is the
    # tag at position 0.
    first_tag, tags_rev = jax.lax.scan(bwd, last_tag, bps, reverse=True)
    tags = jnp.concatenate([first_tag[None], tags_rev], axis=0)    # (S, B)
    lengths = mask.astype(jnp.int32).sum(axis=1)
    return _time_major(tags), lengths


def crf_decode_brute_force(params, emissions, mask):
    """O(N^S) reference decode for tests (tiny shapes only)."""
    import itertools
    import numpy as np
    emissions = np.asarray(emissions, np.float64)
    mask = np.asarray(mask)
    start = np.asarray(params["start"], np.float64)
    end = np.asarray(params["end"], np.float64)
    trans = np.asarray(params["transitions"], np.float64)
    B, S, N = emissions.shape
    out = []
    for b in range(B):
        L = int(mask[b].sum())
        best, best_score = None, -np.inf
        for path in itertools.product(range(N), repeat=L):
            s = start[path[0]] + emissions[b, 0, path[0]]
            for i in range(1, L):
                s += trans[path[i - 1], path[i]] + emissions[b, i, path[i]]
            s += end[path[-1]]
            if s > best_score:
                best_score, best = s, path
        out.append(list(best))
    return out


def crf_log_normalizer_brute_force(params, emissions, mask):
    import itertools
    import numpy as np
    emissions = np.asarray(emissions, np.float64)
    mask = np.asarray(mask)
    start = np.asarray(params["start"], np.float64)
    end = np.asarray(params["end"], np.float64)
    trans = np.asarray(params["transitions"], np.float64)
    B, S, N = emissions.shape
    out = []
    for b in range(B):
        L = int(mask[b].sum())
        scores = []
        for path in itertools.product(range(N), repeat=L):
            s = start[path[0]] + emissions[b, 0, path[0]]
            for i in range(1, L):
                s += trans[path[i - 1], path[i]] + emissions[b, i, path[i]]
            s += end[path[-1]]
            scores.append(s)
        m = max(scores)
        out.append(m + np.log(sum(np.exp(np.array(scores) - m))))
    return np.array(out)
