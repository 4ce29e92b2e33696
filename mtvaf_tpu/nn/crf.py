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


def _step_matrices(params, emissions, maskf):
    """Log-semiring step matrices M_i[prev, next] = trans[prev, next] +
    e_i[next] for real steps; identity (0 diag / -inf off) for masked steps.
    emissions (B, S, N) fp32 → (B, S-1, N, N)."""
    n = emissions.shape[-1]
    mats = params["transitions"][None, None] + \
        emissions[:, 1:, None, :]                             # (B, S-1, N, N)
    ident = jnp.where(jnp.eye(n, dtype=bool), 0.0, NEG_INF)
    return jnp.where(maskf[:, 1:, None, None] > 0, mats, ident[None, None])


def _tree_reduce_semiring(mats, combine):
    """Reduce (B, T, N, N) step matrices to their ordered product (B, N, N)
    with a binary tree: log2(T) levels, T-1 combines total.

    TPU-first: ``associative_scan`` computes every *prefix* (~2(T-1)
    combines up- and down-sweep plus prefix stores); log Z only needs the
    final product, so a plain reduction tree halves the work and the
    backward's memory traffic.  Odd level sizes carry the trailing matrix
    through unpaired (no identity padding needed).
    """
    while mats.shape[1] > 1:
        t = mats.shape[1]
        even = mats[:, 0:t - (t % 2):2]
        odd = mats[:, 1::2]
        reduced = combine(even, odd)
        if t % 2:
            reduced = jnp.concatenate([reduced, mats[:, -1:]], axis=1)
        mats = reduced
    return mats[:, 0]


def _logsumexp_combine(a, b_):
    # log-semiring matmul: (B, T, N, N) ⊗ (B, T, N, N)
    return jax.nn.logsumexp(a[..., :, :, None] + b_[..., None, :, :],
                            axis=-2)


def crf_log_normalizer(params, emissions, mask):
    """log Z via the forward algorithm.

    TPU-first: instead of a sequential S-step scan (latency-bound at tiny N),
    the recursion is a log-semiring matrix product evaluated as a binary
    reduction tree — log2(S) levels of batched (B, N, N) logsumexp-matmuls.
    Masked steps contribute the semiring identity so the result matches the
    masked sequential recursion exactly.
    """
    emissions = emissions.astype(jnp.float32)
    b, s, n = emissions.shape
    maskf = mask.astype(jnp.float32)

    alpha0 = params["start"][None, :] + emissions[:, 0]       # (B, N)
    if s == 1:
        return jax.nn.logsumexp(alpha0 + params["end"][None, :], axis=1)

    final = _tree_reduce_semiring(_step_matrices(params, emissions, maskf),
                                  _logsumexp_combine)
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


def crf_decode(params, emissions, mask,
               unroll: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi decode.

    Returns (best_tags (B, S) int32, lengths (B,) int32).  Positions beyond a
    sequence's length repeat its last real tag (harmless: hosts slice by
    length, matching the reference's list-of-lists decode).

    ``unroll`` trades while-loop trips for program size with bit-identical
    numerics; measured neutral-to-worse at (B32, S128, N13) — the scan is
    not trip-latency-bound on this hardware (bench_crf_probe.py) — so the
    default stays 1.
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

    final_score, bps = jax.lax.scan(fwd, score0, (e_t[1:], mask_t[1:]),
                                    unroll=unroll)
    final_score = final_score + params["end"][None, :]
    last_tag = jnp.argmax(final_score, axis=1).astype(jnp.int32)   # (B,)

    def bwd(tag, bp):
        prev = jnp.take_along_axis(bp, tag[:, None], axis=1)[:, 0]
        return prev.astype(jnp.int32), tag

    # Reverse scan: ys[i] is the tag at position i+1; the final carry is the
    # tag at position 0.
    first_tag, tags_rev = jax.lax.scan(bwd, last_tag, bps, reverse=True,
                                       unroll=unroll)
    tags = jnp.concatenate([first_tag[None], tags_rev], axis=0)    # (S, B)
    lengths = mask.astype(jnp.int32).sum(axis=1)
    return _time_major(tags), lengths


def crf_decode_parallel(params, emissions, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi decode in O(log S) depth (same semantics as :func:`crf_decode`).

    Three fully parallel stages replace the two sequential S-step scans:

    1. forward maxes: max-plus prefix products of the step matrices via
       ``associative_scan`` (masked steps are the semiring identity, which
       also makes their backpointers the identity map automatically);
    2. backpointers: one batched argmax over the prev axis for ALL
       positions at once (the emission term is constant in prev, so it
       cannot change the argmax);
    3. backtrace: pointer doubling — reverse ``associative_scan`` over
       backpointer-map composition ``(f ∘ g)[t] = f[g[t]]``.

    fp caveat: stage 1 reorders float adds (tree vs sequential), so paths
    whose scores tie within fp32 rounding may break ties differently than
    :func:`crf_decode`/torchcrf.  Use for throughput paths; parity suites
    pin the sequential decode.
    """
    emissions = emissions.astype(jnp.float32)
    B, S, N = emissions.shape
    lengths = mask.astype(jnp.int32).sum(axis=1)
    alpha0 = params["start"][None, :] + emissions[:, 0]            # (B, N)
    if S == 1:
        tag0 = jnp.argmax(alpha0 + params["end"][None, :], axis=1)
        return tag0.astype(jnp.int32)[:, None], lengths

    maskf = mask.astype(jnp.float32)
    mats = _step_matrices(params, emissions, maskf)                # (B,S-1,N,N)

    def maxplus(a, b_):
        return jnp.max(a[..., :, :, None] + b_[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(maxplus, mats, axis=1)       # (B,S-1,N,N)
    alphas = jnp.max(alpha0[:, None, :, None] + prefix, axis=2)    # (B,S-1,N)
    all_alphas = jnp.concatenate([alpha0[:, None], alphas], axis=1)

    # bp[:, i] maps tag at position i+1 -> best tag at position i.  The
    # argmax runs over cand = alpha_i[prev] + trans[prev, next] (+e const).
    bps = jnp.argmax(all_alphas[:, :-1, :, None] + mats, axis=2)   # (B,S-1,N)

    # Suffix composition H_i = bp_{i+1} ∘ bp_{i+2} ∘ ... ∘ bp_{S-1} (higher
    # positions applied first); tag_i = H_i[last_tag].  Under reverse=True
    # the combine fn's FIRST argument is the higher-index block, so the
    # union map is lower∘higher = b[a].
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    suffix = jax.lax.associative_scan(compose, bps, axis=1, reverse=True)
    last_tag = jnp.argmax(all_alphas[:, -1] + params["end"][None, :],
                          axis=1).astype(jnp.int32)                # (B,)
    # tags[0..S-2] = suffix[:, 0..S-2][last_tag]; tags[S-1] = last_tag.
    chains = jnp.take_along_axis(
        suffix, last_tag[:, None, None].astype(suffix.dtype), axis=2)[..., 0]
    tags = jnp.concatenate([chains.astype(jnp.int32),
                            last_tag[:, None]], axis=1)            # (B, S)
    return tags, lengths


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
