"""pointnet2 + roiaware pooling ops vs brute-force numpy oracles."""
import numpy as np
import jax.numpy as jnp

from hgsfusion_tpu.ops.pointnet2 import (
    ball_query,
    farthest_point_sample,
    group_points,
    query_and_group,
    three_interpolate,
    three_nn,
)
from hgsfusion_tpu.ops.roiaware_pool import roiaware_pool3d, roipoint_pool3d


class TestFPS:
    def test_matches_reference_algorithm(self, rng):
        n, k = 64, 8
        xyz = rng.randn(n, 3).astype(np.float32)
        valid = np.ones(n, bool)
        got = np.asarray(farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), k))

        # numpy transcription of sampling_gpu.cu
        idx = [0]
        dists = np.full(n, 1e10)
        for _ in range(k - 1):
            d = np.sum((xyz - xyz[idx[-1]]) ** 2, axis=1)
            dists = np.minimum(dists, d)
            idx.append(int(np.argmax(dists)))
        np.testing.assert_array_equal(got, idx)

    def test_invalid_never_selected(self, rng):
        xyz = rng.randn(32, 3).astype(np.float32)
        xyz[16:] += 100  # far away -> would dominate FPS if allowed
        valid = np.zeros(32, bool)
        valid[:16] = True
        got = np.asarray(farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 8))
        assert np.all(got < 16)


class TestBallQuery:
    def test_matches_cuda_semantics(self, rng):
        n, m, ns = 50, 7, 4
        xyz = rng.randn(n, 3).astype(np.float32)
        centers = rng.randn(m, 3).astype(np.float32)
        valid = np.ones(n, bool)
        r = 1.2
        idx, any_nb = ball_query(
            jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid), r, ns
        )
        idx = np.asarray(idx)
        for q in range(m):
            hits = [k for k in range(n)
                    if np.sum((centers[q] - xyz[k]) ** 2) < r * r]
            want = np.zeros(ns, np.int64)
            if hits:
                want[:] = hits[0]
                want[: min(ns, len(hits))] = hits[:ns]
            np.testing.assert_array_equal(idx[q], want, err_msg=f"query {q}")
            assert bool(any_nb[q]) == bool(hits)

    def test_grouping_and_relative_coords(self, rng):
        xyz = rng.randn(30, 3).astype(np.float32)
        feats = rng.randn(30, 5).astype(np.float32)
        centers = xyz[:4] + 0.01
        out, idx, any_nb = query_and_group(
            jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(feats),
            jnp.ones(30, bool), 0.5, 3,
        )
        assert out.shape == (4, 3, 8)
        # first grouped point for center i should be near-zero relative xyz
        rel = np.asarray(out)[:, 0, :3]
        assert np.all(np.linalg.norm(rel, axis=1) < 0.5)
        g = group_points(jnp.asarray(feats), idx)
        np.testing.assert_allclose(np.asarray(out)[..., 3:], np.asarray(g),
                                   atol=1e-6)


class TestInterpolate:
    def test_three_nn_and_interp(self, rng):
        known = rng.randn(20, 3).astype(np.float32)
        unknown = rng.randn(9, 3).astype(np.float32)
        feats = rng.randn(20, 4).astype(np.float32)
        d, i = three_nn(jnp.asarray(unknown), jnp.asarray(known),
                        jnp.ones(20, bool))
        d, i = np.asarray(d), np.asarray(i)
        for q in range(9):
            dd = np.linalg.norm(unknown[q] - known, axis=1)
            want = np.sort(dd)[:3]
            np.testing.assert_allclose(np.sort(d[q]), want, atol=1e-5)
        out = np.asarray(
            three_interpolate(jnp.asarray(feats), jnp.asarray(i), jnp.asarray(d))
        )
        # reference FP weighting: 1/(sqrt_dist + 1e-8)
        # (pointnet2_batch/pointnet2_utils.py:98 + modules.py:153-156)
        w = 1.0 / (d + 1e-8)
        w = w / w.sum(1, keepdims=True)
        want = (feats[i] * w[..., None]).sum(1)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_exact_hit_dominates(self, rng):
        known = rng.randn(10, 3).astype(np.float32)
        feats = rng.randn(10, 2).astype(np.float32)
        d, i = three_nn(jnp.asarray(known[:2]), jnp.asarray(known),
                        jnp.ones(10, bool))
        out = np.asarray(three_interpolate(jnp.asarray(feats), i, d))
        np.testing.assert_allclose(out, feats[:2], atol=1e-3)


class TestRoIAware:
    def test_grid_pool_matches_numpy(self, rng):
        pts = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        feats = rng.randn(200, 4).astype(np.float32)
        rois = np.array([[0, 0, 0, 2.0, 3.0, 1.5, 0.7]], np.float32)
        out = np.asarray(
            roiaware_pool3d(jnp.asarray(rois), jnp.asarray(pts),
                            jnp.asarray(feats), jnp.ones(200, bool),
                            out_size=4, pool_method="max")
        )
        assert out.shape == (1, 4, 4, 4, 4)
        # numpy oracle
        c, s = np.cos(-0.7), np.sin(-0.7)
        rel = pts - rois[0, :3]
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        lz = rel[:, 2]
        half = rois[0, 3:6] / 2
        inside = (np.abs(lx) < half[0]) & (np.abs(ly) < half[1]) & (np.abs(lz) < half[2])
        cell = rois[0, 3:6] / 4
        want = np.zeros((4, 4, 4, 4), np.float32)
        for k in np.nonzero(inside)[0]:
            i = min(int((lx[k] + half[0]) / cell[0]), 3)
            j = min(int((ly[k] + half[1]) / cell[1]), 3)
            l = min(int((lz[k] + half[2]) / cell[2]), 3)
            want[i, j, l] = np.maximum(want[i, j, l], feats[k]) \
                if want[i, j, l].any() else feats[k]
        # compare only occupied cells strictly; empty cells must be 0
        np.testing.assert_allclose(out[0], want, atol=1e-5)

    def test_avg_pool_and_empty_cells(self, rng):
        pts = np.array([[0.1, 0.1, 0.1], [0.12, 0.1, 0.1]], np.float32)
        feats = np.array([[1.0], [3.0]], np.float32)
        rois = np.array([[0, 0, 0, 1.0, 1.0, 1.0, 0.0]], np.float32)
        out = np.asarray(
            roiaware_pool3d(jnp.asarray(rois), jnp.asarray(pts),
                            jnp.asarray(feats), jnp.ones(2, bool),
                            out_size=2, pool_method="avg")
        )
        # both points land in the (+,+,+) cell -> mean 2.0; others 0
        assert out[0, 1, 1, 1, 0] == 2.0
        assert out.sum() == 2.0

    def test_roipoint_pool(self, rng):
        pts = rng.uniform(-2, 2, (100, 3)).astype(np.float32)
        feats = rng.randn(100, 3).astype(np.float32)
        rois = np.array([
            [0, 0, 0, 2.0, 2.0, 2.0, 0.0],
            [50, 50, 50, 1.0, 1.0, 1.0, 0.0],  # empty
        ], np.float32)
        pooled, empty, counts = roipoint_pool3d(
            jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
            jnp.ones(100, bool), num_sampled=8,
        )
        assert pooled.shape == (2, 8, 6)
        assert not bool(empty[0]) and bool(empty[1])
        assert int(counts[1]) == 0 and int(counts[0]) > 0
        inside = np.all(np.abs(pts) < 1.0, axis=1)
        first = np.nonzero(inside)[0][:8]
        np.testing.assert_allclose(
            np.asarray(pooled)[0, : len(first), :3], pts[first], atol=1e-6
        )
        assert np.asarray(pooled)[1].sum() == 0

    def test_roipoint_pool_cyclic_fill(self, rng):
        """0 < cnt < num_sampled RoIs duplicate their in-box points
        cyclically into the unfilled slots (roipoint_pool3d_kernel.cu:
        92-96 `pts_idx[k] = pts_idx[k % cnt]`), NOT zero-pad."""
        pts = np.array([[0.1, 0.0, 0.0], [0.0, 0.2, 0.0],
                        [9.0, 9.0, 9.0]], np.float32)
        feats = np.array([[1.0], [2.0], [3.0]], np.float32)
        rois = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
        pooled, empty, counts = roipoint_pool3d(
            jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
            jnp.ones(3, bool), num_sampled=5,
        )
        assert int(counts[0]) == 2 and not bool(empty[0])
        got = np.asarray(pooled[0, :, 3])
        np.testing.assert_allclose(got, [1.0, 2.0, 1.0, 2.0, 1.0])
