import numpy as np
import jax.numpy as jnp

from hgsfusion_tpu.ops.topk import exact_top_k


class TestExactTopK:
    def test_matches_numpy(self, rng):
        scores = rng.randn(10000).astype(np.float32)
        vals, idx = exact_top_k(jnp.asarray(scores), 256)
        vals, idx = np.asarray(vals), np.asarray(idx)
        want = np.sort(scores)[::-1][:256]
        np.testing.assert_allclose(vals, want, atol=0)
        np.testing.assert_allclose(scores[idx], vals)
        assert len(np.unique(idx)) == 256  # distinct indices

    def test_with_ties_and_neg_inf(self):
        scores = np.full(1000, -1e9, np.float32)
        scores[10] = 5.0
        scores[20] = 3.0
        vals, idx = exact_top_k(jnp.asarray(scores), 64)
        vals, idx = np.asarray(vals), np.asarray(idx)
        assert idx[0] == 10 and idx[1] == 20
        assert np.all(vals[2:] == -1e9)
        assert len(np.unique(idx)) == 64

    def test_k_equals_n(self, rng):
        scores = rng.randn(128).astype(np.float32)
        vals, idx = exact_top_k(jnp.asarray(scores), 128)
        np.testing.assert_allclose(np.asarray(vals), np.sort(scores)[::-1], atol=0)

    def test_all_equal(self):
        scores = np.ones(500, np.float32)
        vals, idx = exact_top_k(jnp.asarray(scores), 100)
        assert np.all(np.asarray(vals) == 1.0)
        assert len(np.unique(np.asarray(idx))) == 100
