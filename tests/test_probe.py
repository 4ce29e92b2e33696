"""Probe subsystem tests: pseudo-label construction vs a direct Python port of
the reference algorithm (reference probes/constructLabel.py:11-29)."""

import numpy as np

import jax
import jax.numpy as jnp

from mtvaf_tpu.nn.probe import (combine_loss, construct_pseudo_labels,
                                init_probe_params, probe_depths, probe_loss)


def reference_labels(norms: np.ndarray) -> np.ndarray:
    """Reference algorithm, straight python."""
    batchlen, seqlen = norms.shape
    batchlabel = np.zeros((batchlen, seqlen))
    for i in range(batchlen):
        sort_idx = [[j, float(norms[i][j])] for j in range(seqlen)]
        sort_idx.sort(key=lambda x: x[1])
        if seqlen >= 1:
            sort_idx[0][1] = 1
        if seqlen >= 2:
            sort_idx[1][1] = 2
        for j in range(2, seqlen):
            if abs(sort_idx[j][1] - sort_idx[j - 1][1]) < \
                    abs(sort_idx[j - 1][1] + 1 - sort_idx[j][1]):
                sort_idx[j][1] = sort_idx[j - 1][1]
            else:
                sort_idx[j][1] = sort_idx[j - 1][1] + 1
        sort_idx.sort(key=lambda x: x[0])
        for j in range(seqlen):
            batchlabel[i][j] = sort_idx[j][1]
    return batchlabel


class TestPseudoLabels:
    def test_vs_reference_random(self):
        rng = np.random.RandomState(0)
        norms = (rng.rand(4, 9) * 10).astype(np.float32)
        got = np.asarray(construct_pseudo_labels(jnp.asarray(norms)))
        want = reference_labels(norms)
        np.testing.assert_array_equal(got, want)

    def test_vs_reference_clustered(self):
        norms = np.array([[1.0, 1.1, 1.2, 5.0, 5.1, 9.0],
                          [3.0, 3.0, 3.0, 3.0, 3.0, 3.0]], np.float32)
        got = np.asarray(construct_pseudo_labels(jnp.asarray(norms)))
        want = reference_labels(norms)
        np.testing.assert_array_equal(got, want)

    def test_short_sequences(self):
        for s in (1, 2, 3):
            norms = np.random.RandomState(s).rand(2, s).astype(np.float32)
            got = np.asarray(construct_pseudo_labels(jnp.asarray(norms)))
            want = reference_labels(norms)
            np.testing.assert_array_equal(got, want)


class TestProbe:
    def test_depths_shape_and_loss(self):
        params = init_probe_params(jax.random.PRNGKey(0), 16, 8)
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        depths = probe_depths(params, h)
        assert depths.shape == (2, 5)
        assert np.all(np.asarray(depths) >= 0)  # PSD
        loss = probe_loss(params, h)
        assert np.isfinite(float(loss))

    def test_loss_gradient_flows_to_proj(self):
        params = init_probe_params(jax.random.PRNGKey(0), 16, 8)
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        g = jax.grad(lambda p: probe_loss(p, h))(params)
        assert np.any(np.asarray(g["proj"]) != 0)

    def test_combine_loss_gating(self):
        assert float(combine_loss(1.0, jnp.asarray(0.05), 0.5, 3)) == 1.0
        expected = 1.0 + 2.0 * 0.5 * 2 ** -3
        assert np.isclose(float(combine_loss(1.0, jnp.asarray(2.0), 0.5, 3)),
                          expected)
