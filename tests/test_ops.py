import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.ops import rotated_iou, nms, grid_sample, voxelize, points_in_boxes
from hgsfusion_tpu.utils.box_utils import boxes_to_corners_bev


def _mc_intersection(box_a, box_b, n=400):
    """Rasterized intersection area of two rotated BEV boxes (ground truth)."""
    lo = np.minimum(box_a[:2] - box_a[3:5].max(), box_b[:2] - box_b[3:5].max()) - 1
    hi = np.maximum(box_a[:2] + box_a[3:5].max(), box_b[:2] + box_b[3:5].max()) + 1
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    xx, yy = np.meshgrid(xs, ys)
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)

    def inside(box):
        rel = pts - box[:2]
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return np.sum(inside(box_a) & inside(box_b)) * cell


def _box7(x, y, dx, dy, heading):
    return np.array([x, y, 0.0, dx, dy, 1.0, heading], dtype=np.float32)


class TestRotatedIoU:
    def test_identical_boxes(self):
        a = _box7(0, 0, 2, 1, 0.3)[None]
        inter = np.asarray(rotated_iou.boxes_overlap_bev(jnp.array(a), jnp.array(a)))
        np.testing.assert_allclose(inter, [[2.0]], atol=1e-4)
        iou = np.asarray(rotated_iou.boxes_iou_bev(jnp.array(a), jnp.array(a)))
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)

    def test_disjoint(self):
        a = _box7(0, 0, 2, 1, 0.0)[None]
        b = _box7(10, 10, 2, 1, 1.0)[None]
        inter = np.asarray(rotated_iou.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(inter, [[0.0]], atol=1e-6)

    def test_axis_aligned_partial(self):
        a = _box7(0, 0, 2, 2, 0.0)[None]
        b = _box7(1, 1, 2, 2, 0.0)[None]
        inter = np.asarray(rotated_iou.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(inter, [[1.0]], atol=1e-4)

    def test_45deg_cross(self):
        # unit square vs same square rotated 45 deg: octagon area 2*(sqrt(2)-1)
        a = _box7(0, 0, 1, 1, 0.0)[None]
        b = _box7(0, 0, 1, 1, np.pi / 4)[None]
        inter = np.asarray(rotated_iou.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(inter, [[2 * (np.sqrt(2) - 1)]], atol=1e-4)

    def test_containment(self):
        a = _box7(0, 0, 4, 4, 0.2)[None]
        b = _box7(0.3, -0.1, 1, 1, 1.1)[None]
        inter = np.asarray(rotated_iou.boxes_overlap_bev(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(inter, [[1.0]], atol=1e-4)

    def test_random_vs_rasterized(self, rng):
        boxes_a = np.stack(
            [
                _box7(
                    rng.uniform(-2, 2), rng.uniform(-2, 2),
                    rng.uniform(0.5, 3), rng.uniform(0.5, 3),
                    rng.uniform(-np.pi, np.pi),
                )
                for _ in range(12)
            ]
        )
        boxes_b = np.stack(
            [
                _box7(
                    rng.uniform(-2, 2), rng.uniform(-2, 2),
                    rng.uniform(0.5, 3), rng.uniform(0.5, 3),
                    rng.uniform(-np.pi, np.pi),
                )
                for _ in range(7)
            ]
        )
        got = np.asarray(
            rotated_iou.boxes_overlap_bev(jnp.array(boxes_a), jnp.array(boxes_b))
        )
        for i in range(len(boxes_a)):
            for j in range(len(boxes_b)):
                want = _mc_intersection(boxes_a[i], boxes_b[j])
                assert abs(got[i, j] - want) < 0.05, (i, j, got[i, j], want)

    def test_blocked_matches_dense(self, rng):
        boxes = np.stack(
            [
                _box7(rng.uniform(-5, 5), rng.uniform(-5, 5), 2, 1, rng.uniform(0, 3))
                for _ in range(40)
            ]
        )
        dense = np.asarray(rotated_iou.boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
        blocked = np.asarray(
            rotated_iou.boxes_iou_bev_blocked(jnp.array(boxes), jnp.array(boxes), row_block=16)
        )
        np.testing.assert_allclose(dense, blocked, atol=1e-5)

    def test_iou3d_height(self):
        a = np.array([[0, 0, 0.0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[0, 0, 1.0, 2, 2, 2, 0.0]], dtype=np.float32)
        iou = np.asarray(rotated_iou.boxes_iou3d(jnp.array(a), jnp.array(b)))
        # overlap volume 2*2*1=4; union 8+8-4=12
        np.testing.assert_allclose(iou, [[4.0 / 12.0]], atol=1e-4)


class TestNMS:
    def test_greedy_basic(self):
        boxes = np.array(
            [
                [0, 0, 0, 2, 2, 1, 0.0],
                [0.1, 0, 0, 2, 2, 1, 0.0],   # overlaps box 0
                [10, 10, 0, 2, 2, 1, 0.0],   # disjoint
            ],
            dtype=np.float32,
        )
        scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
        keep = np.asarray(nms.rotated_nms(jnp.array(boxes), jnp.array(scores), 0.1))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_class_agnostic_fixed_shapes(self):
        boxes = np.array(
            [
                [0, 0, 0, 2, 2, 1, 0.0],
                [0.1, 0, 0, 2, 2, 1, 0.0],
                [10, 10, 0, 2, 2, 1, 0.0],
                [20, 20, 0, 2, 2, 1, 0.0],
            ],
            dtype=np.float32,
        )
        scores = np.array([0.9, 0.8, 0.7, 0.05], dtype=np.float32)
        idx, valid = nms.class_agnostic_nms(
            jnp.array(scores), jnp.array(boxes),
            score_thresh=0.1, nms_thresh=0.1, pre_max_size=4, post_max_size=3,
        )
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert valid.tolist() == [True, True, False]  # box 3 below score thresh
        assert idx[0] == 0 and idx[1] == 2

    def test_nms_greedy_matches_numpy_reference(self, rng):
        n = 64
        boxes = np.concatenate(
            [
                rng.uniform(-10, 10, (n, 2)),
                np.zeros((n, 1)),
                rng.uniform(1, 4, (n, 2)),
                np.ones((n, 1)),
                rng.uniform(-np.pi, np.pi, (n, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        scores = rng.uniform(0, 1, (n,)).astype(np.float32)
        iou = np.asarray(rotated_iou.boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
        # numpy greedy reference
        order = np.argsort(-scores)
        suppressed = np.zeros(n, bool)
        keep_ref = np.zeros(n, bool)
        for i in order:
            if suppressed[i]:
                continue
            keep_ref[i] = True
            for j in order:
                if scores[j] < scores[i] and iou[i, j] > 0.2:
                    suppressed[j] = True
        keep = np.asarray(nms.rotated_nms(jnp.array(boxes), jnp.array(scores), 0.2))
        np.testing.assert_array_equal(keep, keep_ref)

    def test_lazy_greedy_matches_matrix_greedy(self, rng):
        """greedy_nms_lazy == (full IoU matrix -> greedy_suppress) truncated
        to its first max_keep kept entries, across validity patterns."""
        n = 128
        for trial in range(4):
            boxes = np.concatenate(
                [
                    rng.uniform(-12, 12, (n, 2)),
                    np.zeros((n, 1)),
                    rng.uniform(1, 4, (n, 2)),
                    np.ones((n, 1)),
                    rng.uniform(-np.pi, np.pi, (n, 1)),
                ],
                axis=1,
            ).astype(np.float32)
            # score-sorted candidates (as produced by exact_top_k)
            valid = np.ones(n, bool)
            if trial == 1:
                valid[60:] = False  # tail invalid (padded slots)
            if trial == 2:
                valid[:] = False  # nothing valid
            max_keep = 10 if trial == 3 else n

            iou = np.asarray(
                rotated_iou.boxes_iou_bev(jnp.array(boxes), jnp.array(boxes))
            )
            ref_full = np.asarray(
                nms.greedy_suppress(jnp.array(iou > 0.2), jnp.array(valid))
            )
            # first max_keep kept entries of the reference
            kept_idx = np.nonzero(ref_full)[0][:max_keep]
            ref = np.zeros(n, bool)
            ref[kept_idx] = True

            got = np.asarray(
                nms.greedy_nms_lazy(
                    jnp.array(boxes), jnp.array(valid), 0.2, max_keep
                )
            )
            np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")


class TestGridSample:
    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        b, h, w, c = 2, 9, 13, 5
        feats = rng.randn(b, h, w, c).astype(np.float32)
        coords = rng.uniform(-1.4, 1.4, (b, 17, 2)).astype(np.float32)

        got = np.asarray(grid_sample.grid_sample_2d(jnp.array(feats), jnp.array(coords)))

        t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
        t_grid = torch.from_numpy(coords).reshape(b, 17, 1, 2)
        want = F.grid_sample(
            t_feats, t_grid, mode="bilinear", padding_mode="zeros", align_corners=True
        )  # (B, C, 17, 1)
        want = want.squeeze(-1).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_depth_plane_collapse_matches_torch_3d(self, rng):
        """The reference samples (B,C,1,H,W) with a 3-D grid; our 2-D sample of
        (u, v) must match torch's 5-D grid_sample with D=1 for any depth coord."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        b, h, w, c = 1, 8, 12, 3
        feats = rng.randn(b, h, w, c).astype(np.float32)
        uv = rng.uniform(-1.3, 1.3, (b, 25, 2)).astype(np.float32)
        depth = rng.uniform(-3, 3, (b, 25, 1)).astype(np.float32)  # arbitrary

        got = np.asarray(grid_sample.grid_sample_2d(jnp.array(feats), jnp.array(uv)))

        t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2).unsqueeze(2)  # (B,C,1,H,W)
        grid3d = torch.from_numpy(np.concatenate([uv, depth], axis=-1)).reshape(
            b, 25, 1, 1, 3
        )
        want = F.grid_sample(
            t_feats, grid3d, mode="bilinear", padding_mode="zeros", align_corners=True
        )  # (B, C, 25, 1, 1)
        want = want.squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestVoxelize:
    def test_pillar_ids_and_scatter(self):
        pillar = 1.0
        nx, ny = 4, 3
        xyz = np.array(
            [[[0.5, 0.5, 0.0], [0.6, 0.4, 0.0], [3.5, 2.5, 0.0], [9.0, 0.5, 0.0],
              [-0.5, 0.2, 0.0], [0.2, -0.9, 0.0], [-1.5, 0.5, 0.0]]],
            dtype=np.float32,
        )
        valid = np.array([[True] * 7])
        ids, in_grid = voxelize.points_to_pillar_ids(
            jnp.array(xyz), jnp.array(valid), pillar, nx, ny
        )
        ids = np.asarray(ids)
        assert ids[0, 0] == 0 and ids[0, 1] == 0
        assert ids[0, 2] == 2 * 4 + 3
        assert ids[0, 3] == nx * ny  # out of grid -> dump
        # reference quirk (pillar_ops_gpu.cu:33-36 `int(cx)` truncation):
        # relatives in (-1, 0) truncate to 0 and are KEPT in row/col 0
        assert ids[0, 4] == 0 and ids[0, 5] == 0
        assert ids[0, 6] == nx * ny  # a full pillar below min still dumps
        feats = np.array(
            [[[1.0, -2.0], [3.0, 5.0], [2.0, 2.0], [9.0, 9.0],
              [-1.0, -1.0], [-1.0, -1.0], [9.0, 9.0]]], dtype=np.float32)
        out = np.asarray(voxelize.scatter_max_dense(jnp.array(feats), ids, nx * ny))
        np.testing.assert_allclose(out[0, 0], [3.0, 5.0])
        np.testing.assert_allclose(out[0, 11], [2.0, 2.0])
        np.testing.assert_allclose(out[0, 1], [0.0, 0.0])  # empty cell -> 0
        occ = np.asarray(voxelize.scatter_any_dense(ids, nx * ny))
        assert occ[0, 0] and occ[0, 11] and not occ[0, 1]

    def test_scatter_max_grad_flows_to_argmax(self):
        ids = jnp.array([[0, 0, 1]])
        feats = jnp.array([[[1.0], [3.0], [2.0]]])

        def f(x):
            return jnp.sum(voxelize.scatter_max_dense(x, ids, 2))

        g = np.asarray(jax.grad(f)(feats))
        np.testing.assert_allclose(g[0, :, 0], [0.0, 1.0, 1.0])


class TestPointsInBoxes:
    def test_basic(self):
        boxes = np.array([[0, 0, 0, 2, 2, 2, np.pi / 4]], dtype=np.float32)
        pts = np.array(
            [[0, 0, 0], [1.2, 0, 0], [0.9, 0.9, 0], [0, 0, 1.5]], dtype=np.float32
        )
        mask = np.asarray(points_in_boxes.points_in_boxes(jnp.array(pts), jnp.array(boxes)))
        # rotated 45deg: (1.2, 0) is inside (corner reach sqrt(2) along axes);
        # (0.9, 0.9) is outside (local |x| = 0.9*sqrt(2) > 1); z=1.5 outside
        assert mask[0].tolist() == [True, True, False, False]


class TestGridSamplePaired:
    def test_matches_unpaired(self, rng):
        from hgsfusion_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_paired

        b, h, w, c = 2, 9, 13, 5
        feats = rng.randn(b, h, w, c).astype(np.float32)
        coords = rng.uniform(-1.4, 1.4, (b, 17, 2)).astype(np.float32)
        a = np.asarray(grid_sample_2d(jnp.array(feats), jnp.array(coords)))
        p = np.asarray(grid_sample_2d_paired(jnp.array(feats), jnp.array(coords)))
        np.testing.assert_allclose(a, p, atol=1e-5)

    def test_exact_edge_coords(self, rng):
        from hgsfusion_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_paired

        feats = rng.randn(1, 4, 6, 3).astype(np.float32)
        # corners, exact grid points, just-outside values
        coords = np.array(
            [[[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 0],
              [-1.0001, 0], [1.0001, 0], [0, 1.0001], [-2, -2]]],
            np.float32,
        )
        a = np.asarray(grid_sample_2d(jnp.array(feats), jnp.array(coords)))
        p = np.asarray(grid_sample_2d_paired(jnp.array(feats), jnp.array(coords)))
        np.testing.assert_allclose(a, p, atol=1e-6)

    def test_quad_matches_unpaired(self, rng):
        from hgsfusion_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_quad

        b, h, w, c = 2, 9, 13, 5
        feats = rng.randn(b, h, w, c).astype(np.float32)
        coords = np.concatenate(
            [
                rng.uniform(-1.4, 1.4, (b, 17, 2)),
                np.array([[[-1, -1], [1, 1], [-1.0001, 0], [1.0001, 0],
                           [0, 0], [-2, 2]]] * b),
            ],
            axis=1,
        ).astype(np.float32)
        a = np.asarray(grid_sample_2d(jnp.array(feats), jnp.array(coords)))
        q = np.asarray(grid_sample_2d_quad(jnp.array(feats), jnp.array(coords)))
        np.testing.assert_allclose(a, q, atol=1e-5)


class TestNestedGatherMerge:
    def test_refine_preserves_bilinear_surface(self, rng):
        from hgsfusion_tpu.models.frustum import _nested_refine_2x

        x = jnp.asarray(rng.randn(2, 5, 7, 16).astype(np.float32))
        uv = jnp.asarray(rng.uniform(-1.0, 1.0, (2, 400, 2)).astype(np.float32))
        a = np.asarray(grid_sample.grid_sample_2d(x, uv))
        b = np.asarray(
            grid_sample.grid_sample_2d(_nested_refine_2x(x), uv)
        )
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_canvas_merge_exact_incl_out_of_range(self, rng):
        """The merged canvas reproduces BOTH maps' zeros-padding fade — the
        one-coarse-pixel boundary band included."""
        from hgsfusion_tpu.models.frustum import merge_nested_groups

        f_fine = jnp.asarray(rng.randn(2, 9, 13, 6).astype(np.float32))
        f_coarse = jnp.asarray(rng.randn(2, 5, 7, 4).astype(np.float32))
        uv = jnp.asarray(
            rng.uniform(-1.5, 1.5, (2, 800, 2)).astype(np.float32)
        )
        canvas, remap = merge_nested_groups(f_fine, f_coarse)
        got = np.asarray(grid_sample.grid_sample_2d_quad(canvas, remap(uv)))
        np.testing.assert_allclose(
            got[..., :6], np.asarray(grid_sample.grid_sample_2d(f_fine, uv)),
            atol=5e-6,
        )
        np.testing.assert_allclose(
            got[..., 6:], np.asarray(grid_sample.grid_sample_2d(f_coarse, uv)),
            atol=5e-6,
        )

    def test_f2v_merged_equals_two_gather_path(self, rng):
        """Full module: output at a NESTING image size equals the same
        params evaluated through the explicit per-group sampling."""
        import flax.linen as nn_

        from hgsfusion_tpu.models.frustum import FrustumToVoxelMultiScale

        # /4 = (17, 25), /8 = (9, 13): 16 = 2*8, 24 = 2*12 -> nests
        f4 = jnp.asarray(rng.randn(1, 17, 25, 8).astype(np.float32))
        f8 = jnp.asarray(rng.randn(1, 9, 13, 12).astype(np.float32))
        grid = jnp.asarray(
            rng.uniform(-1.3, 1.3, (1, 6, 5, 4, 3)).astype(np.float32)
        )
        mod = FrustumToVoxelMultiScale(out_channels=16, merge_nested_gather=True)
        v = mod.init(jax.random.PRNGKey(0), [f4, f8], grid, False)
        merged = np.asarray(mod.apply(v, [f4, f8], grid, False))

        # reference: per-group sampling with the same params
        k = np.asarray(v["params"]["reduce_kernel"])
        bias = np.asarray(v["params"]["reduce_bias"])
        uv = grid[..., :2]
        s4 = np.asarray(grid_sample.grid_sample_2d(f4, uv))
        s8 = np.asarray(grid_sample.grid_sample_2d(f8, uv))
        pre = bias + s4 @ k[:8] + s8 @ k[8:]
        # apply the module's BN (eval mode: running stats are init values)
        mean = np.asarray(v["batch_stats"]["bn"]["mean"])
        var = np.asarray(v["batch_stats"]["bn"]["var"])
        scale = np.asarray(v["params"]["bn"]["scale"])
        bbias = np.asarray(v["params"]["bn"]["bias"])
        want = np.maximum(
            (pre - mean) / np.sqrt(var + 1e-5) * scale + bbias, 0.0
        )
        np.testing.assert_allclose(merged, want, atol=1e-4)


class TestIngroupInds:
    def test_order_of_appearance(self):
        from hgsfusion_tpu.ops.ingroup_inds import ingroup_inds

        ids = jnp.asarray([3, 1, 3, 3, 1, 7])
        out = np.asarray(ingroup_inds(ids))
        np.testing.assert_array_equal(out, [0, 0, 1, 2, 1, 0])

    def test_random_vs_numpy_oracle(self, rng):
        from hgsfusion_tpu.ops.ingroup_inds import ingroup_inds

        ids = rng.randint(0, 50, 1000)
        out = np.asarray(ingroup_inds(jnp.asarray(ids)))
        counters = {}
        for i, g in enumerate(ids):
            expect = counters.get(g, 0)
            counters[g] = expect + 1
            assert out[i] == expect
        # each group receives a permutation of 0..k-1 (reference contract)
        for g in np.unique(ids):
            got = np.sort(out[ids == g])
            np.testing.assert_array_equal(got, np.arange(len(got)))

    def test_jit_static_shape(self):
        import jax

        from hgsfusion_tpu.ops.ingroup_inds import ingroup_inds

        out = jax.jit(ingroup_inds)(jnp.asarray([0, 0, 0, 0]))
        np.testing.assert_array_equal(np.asarray(out), [0, 1, 2, 3])


class TestGridSampleQuantized:
    def _coords(self, rng, b, n=17):
        return np.concatenate(
            [
                rng.uniform(-1.4, 1.4, (b, n, 2)),
                np.array([[[-1, -1], [1, 1], [-1.0001, 0], [1.0001, 0],
                           [0, 0], [-2, 2]]] * b),
            ],
            axis=1,
        ).astype(np.float32)

    def test_q8_matches_exact_within_quant_step(self, rng):
        """Dequantized q8 sample == exact sample up to the per-channel
        int8 rounding (|err| <= scale: 4 taps, weights sum <= 1)."""
        from hgsfusion_tpu.ops.grid_sample import (
            grid_sample_2d, grid_sample_2d_quad_q8,
        )

        b, h, w, c = 2, 9, 13, 5
        feats = (rng.randn(b, h, w, c) * rng.uniform(0.1, 10, c)).astype(
            np.float32)
        coords = self._coords(rng, b)
        exact = np.asarray(grid_sample_2d(jnp.array(feats), jnp.array(coords)))
        out, scale = grid_sample_2d_quad_q8(
            jnp.array(feats), jnp.array(coords), jnp.float32)
        got = np.asarray(out) * np.asarray(scale)
        err = np.abs(got - exact)
        assert np.all(err <= np.asarray(scale) * (0.5 + 1e-5) + 1e-6), (
            err.max(), np.asarray(scale))

    def test_q8_out_of_range_is_zero(self, rng):
        from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad_q8

        feats = rng.randn(1, 5, 7, 3).astype(np.float32)
        coords = np.array([[[-2.0, 0.0], [0.0, 3.0], [5.0, 5.0]]],
                          np.float32)
        out, _ = grid_sample_2d_quad_q8(
            jnp.array(feats), jnp.array(coords), jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_q8_gradient_is_exact_sampler_gradient(self, rng):
        """Straight-through backward: grad of (q8 sample * scale) w.r.t. the
        features == grad of the exact sampler (scale treated constant)."""
        from hgsfusion_tpu.ops.grid_sample import (
            grid_sample_2d_quad, grid_sample_2d_quad_q8,
        )

        b, h, w, c = 1, 6, 8, 4
        feats = rng.randn(b, h, w, c).astype(np.float32)
        coords = self._coords(rng, b, n=9)
        ct = rng.randn(b, coords.shape[1], c).astype(np.float32)

        def loss_q8(f):
            out, scale = grid_sample_2d_quad_q8(
                f, jnp.array(coords), jnp.float32)
            return jnp.sum(out * jax.lax.stop_gradient(scale) * ct)

        def loss_exact(f):
            return jnp.sum(grid_sample_2d_quad(f, jnp.array(coords)) * ct)

        g_q8 = np.asarray(jax.grad(loss_q8)(jnp.array(feats)))
        g_ex = np.asarray(jax.grad(loss_exact)(jnp.array(feats)))
        np.testing.assert_allclose(g_q8, g_ex, atol=1e-5)

    def test_frustum_module_int8_close_to_exact(self, rng):
        """FrustumToVoxelMultiScale(quant=int8) output stays close to the
        exact path at realistic activation scales (same params)."""
        import jax

        from hgsfusion_tpu.models.frustum import FrustumToVoxelMultiScale

        feats = [
            jnp.asarray(np.abs(rng.randn(1, 17, 25, 8)).astype(np.float32)),
            jnp.asarray(np.abs(rng.randn(1, 9, 13, 12)).astype(np.float32)),
        ]
        grid = jnp.asarray(
            rng.uniform(-1.2, 1.2, (1, 10, 10, 4, 3)).astype(np.float32))
        exact_m = FrustumToVoxelMultiScale(out_channels=16)
        q8_m = FrustumToVoxelMultiScale(out_channels=16, quant="int8")
        variables = exact_m.init(jax.random.PRNGKey(0), feats, grid, False)
        a = np.asarray(exact_m.apply(variables, feats, grid, False))
        b = np.asarray(q8_m.apply(variables, feats, grid, False))
        # int8 rounding on the inputs of a 20-channel reduce: small relative
        # error on the BN+ReLU output
        denom = np.maximum(np.abs(a).max(), 1e-6)
        assert np.max(np.abs(a - b)) / denom < 0.02, (
            np.max(np.abs(a - b)) / denom)
