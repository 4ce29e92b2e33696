"""Cutoff augmentation unit tests (reference modules/augument.py:92-160)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.train.augment import (dim_cutoff, js_div, make_cutoff_fn,
                                     span_cutoff, token_cutoff)


@pytest.fixture
def inputs():
    rng = jax.random.PRNGKey(0)
    embeds = jax.random.normal(rng, (3, 10, 8))
    mask = jnp.asarray(np.array([[1] * 10, [1] * 6 + [0] * 4,
                                 [1] * 8 + [0] * 2]), jnp.int32)
    return embeds, mask


class TestSpanCutoff:
    def test_contiguous_zeroing(self, inputs):
        embeds, mask = inputs
        out_e, out_m = span_cutoff(embeds, mask, jax.random.PRNGKey(1), 0.3)
        zeroed = np.asarray((out_e == 0).all(axis=-1))
        m = np.asarray(out_m)
        for b in range(3):
            length = int(np.asarray(mask)[b].sum())
            cut = int(length * 0.3)
            idx = np.where(zeroed[b][:length])[0]
            assert len(idx) == cut
            if cut > 1:  # contiguous
                assert (np.diff(idx) == 1).all()
            # mask zeroed at the same places
            assert (m[b][idx] == 0).all()

    def test_zero_ratio_noop(self, inputs):
        embeds, mask = inputs
        out_e, out_m = span_cutoff(embeds, mask, jax.random.PRNGKey(1), 0.0)
        np.testing.assert_array_equal(np.asarray(out_e), np.asarray(embeds))
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(mask))


class TestTokenCutoff:
    def test_zeroes_rows_within_length(self, inputs):
        embeds, mask = inputs
        out_e, out_m = token_cutoff(embeds, mask, jax.random.PRNGKey(2), 0.3)
        zeroed = np.asarray((out_e == 0).all(axis=-1))
        for b in range(3):
            length = int(np.asarray(mask)[b].sum())
            cut = int(length * 0.3)
            # duplicates allowed → at most `cut` rows zeroed, all within len
            idx = np.where(zeroed[b])[0]
            real = [i for i in idx if i < length]
            assert len(real) <= cut
            assert all(i < length for i in idx) or \
                all(not np.asarray(mask)[b][i] or i < length for i in idx)


class TestDimCutoff:
    def test_zeroes_dims_mask_unchanged(self, inputs):
        embeds, mask = inputs
        out_e, out_m = dim_cutoff(embeds, mask, jax.random.PRNGKey(3), 0.25)
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(mask))
        zero_dims = np.asarray((out_e == 0).all(axis=(1,)))  # (B, D)
        # int(8 * 0.25) = 2 draws with replacement → 1..2 dims per example
        for b in range(3):
            assert 1 <= zero_dims[b].sum() <= 2


class TestJsDiv:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.RandomState(0)
        p = rng.dirichlet(np.ones(5), size=4).astype(np.float32)
        q = rng.dirichlet(np.ones(5), size=4).astype(np.float32)
        got = float(js_div(jnp.asarray(p), jnp.asarray(q)))
        pt, qt = torch.tensor(p, dtype=torch.float64), torch.tensor(q, dtype=torch.float64)
        m = (pt + qt) / 2
        want = (F.kl_div(pt.log(), m, reduction="batchmean")
                + F.kl_div(qt.log(), m, reduction="batchmean")) / 2
        assert got == pytest.approx(float(want), rel=1e-4)

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            make_cutoff_fn("bogus", 0.1)
