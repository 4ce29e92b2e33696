"""CRF tests: forward/Viterbi vs brute-force enumeration (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.nn.crf import (crf_decode, crf_decode_brute_force,
                              crf_log_likelihood, crf_log_normalizer,
                              crf_log_normalizer_brute_force, crf_loss,
                              crf_sequence_score, init_crf_params)


@pytest.fixture
def setup():
    rng = jax.random.PRNGKey(0)
    N, B, S = 4, 3, 5
    params = init_crf_params(rng, N)
    emissions = jax.random.normal(jax.random.PRNGKey(1), (B, S, N))
    mask = jnp.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                     jnp.int32)
    tags = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, N)
    return params, emissions, mask, tags


class TestCRF:
    def test_log_normalizer_vs_brute_force(self, setup):
        params, emissions, mask, _ = setup
        got = np.asarray(crf_log_normalizer(params, emissions, mask))
        want = crf_log_normalizer_brute_force(params, emissions, mask)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_viterbi_vs_brute_force(self, setup):
        params, emissions, mask, _ = setup
        tags, lengths = crf_decode(params, emissions, mask)
        tags, lengths = np.asarray(tags), np.asarray(lengths)
        want = crf_decode_brute_force(params, emissions, mask)
        for b in range(len(want)):
            assert tags[b, :lengths[b]].tolist() == want[b]

    def test_llh_nonpositive_and_decode_maximizes(self, setup):
        params, emissions, mask, tags = setup
        llh = crf_log_likelihood(params, emissions, tags, mask, "none")
        assert np.all(np.asarray(llh) <= 1e-6)
        # score of the viterbi path >= score of any label path
        vtags, _ = crf_decode(params, emissions, mask)
        s_vit = crf_sequence_score(params, emissions, vtags, mask)
        s_any = crf_sequence_score(params, emissions, tags, mask)
        assert np.all(np.asarray(s_vit) >= np.asarray(s_any) - 1e-5)

    def test_reductions(self, setup):
        params, emissions, mask, tags = setup
        none = np.asarray(crf_log_likelihood(params, emissions, tags, mask, "none"))
        assert np.isclose(
            np.asarray(crf_log_likelihood(params, emissions, tags, mask, "mean")),
            none.mean())
        assert np.isclose(
            np.asarray(crf_log_likelihood(params, emissions, tags, mask, "sum")),
            none.sum())
        tok = np.asarray(crf_log_likelihood(params, emissions, tags, mask,
                                            "token_mean"))
        assert np.isclose(tok, none.sum() / np.asarray(mask).sum())

    def test_vs_torchcrf_formula(self, setup):
        """Independent dynamic-programming oracle in numpy (not torchcrf —
        unavailable — but the identical recurrence)."""
        params, emissions, mask, tags = setup
        e = np.asarray(emissions, np.float64)
        m = np.asarray(mask)
        t = np.asarray(tags)
        start = np.asarray(params["start"], np.float64)
        end = np.asarray(params["end"], np.float64)
        trans = np.asarray(params["transitions"], np.float64)
        B, S, N = e.shape
        want = np.zeros(B)
        for b in range(B):
            L = int(m[b].sum())
            s = start[t[b, 0]] + e[b, 0, t[b, 0]]
            for i in range(1, L):
                s += trans[t[b, i - 1], t[b, i]] + e[b, i, t[b, i]]
            s += end[t[b, L - 1]]
            want[b] = s
        got = np.asarray(crf_sequence_score(params, emissions, tags, mask))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_loss_grad_finite(self, setup):
        params, emissions, mask, tags = setup
        g = jax.grad(lambda p: crf_loss(p, emissions, tags, mask))(params)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_jit_static_shapes(self, setup):
        params, emissions, mask, tags = setup
        f = jax.jit(crf_decode)
        tags1, l1 = f(params, emissions, mask)
        assert tags1.shape == emissions.shape[:2]


class TestParallelViterbi:
    """crf_decode_parallel: O(log S)-depth decode (max-plus prefix products
    + pointer-doubling backtrace) must reproduce the sequential decode."""

    def test_vs_sequential_random(self):
        from mtvaf_tpu.nn.crf import crf_decode_parallel
        rng = np.random.default_rng(7)
        key = jax.random.PRNGKey(3)
        for trial in range(6):
            B = int(rng.integers(1, 5))
            S = int(rng.integers(1, 24))
            N = int(rng.integers(2, 8))
            params = init_crf_params(jax.random.fold_in(key, trial), N)
            em = jnp.asarray(rng.standard_normal((B, S, N)), jnp.float32) * 3
            lens = rng.integers(1, S + 1, B)
            mask = jnp.asarray(
                (np.arange(S)[None, :] < lens[:, None]).astype(np.int32))
            t_seq, l_seq = crf_decode(params, em, mask)
            t_par, l_par = crf_decode_parallel(params, em, mask)
            np.testing.assert_array_equal(np.asarray(l_seq), np.asarray(l_par))
            for b in range(B):
                L = int(lens[b])
                np.testing.assert_array_equal(
                    np.asarray(t_seq)[b, :L], np.asarray(t_par)[b, :L],
                    err_msg=f"trial={trial} b={b}")

    def test_vs_brute_force(self, setup):
        from mtvaf_tpu.nn.crf import crf_decode_parallel
        params, emissions, mask, _ = setup
        tags, lengths = crf_decode_parallel(params, emissions, mask)
        tags, lengths = np.asarray(tags), np.asarray(lengths)
        want = crf_decode_brute_force(params, emissions, mask)
        for b in range(len(want)):
            assert tags[b, :lengths[b]].tolist() == want[b]
