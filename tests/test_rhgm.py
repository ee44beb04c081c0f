import numpy as np

from hgsfusion_tpu.rhgm.generator import (
    back_project,
    generate_hybrid_points,
    masks_from_gt_boxes2d,
    project_points_to_image,
)

L2C = np.array(
    [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3], [0, 0, 0, 1]], np.float32
)
C2I = np.array([[200.0, 0, 128, 0], [0, 200, 64, 0], [0, 0, 1, 0]], np.float32)


class TestProjection:
    def test_roundtrip(self, rng):
        pts = np.stack(
            [rng.uniform(5, 30, 20), rng.uniform(-5, 5, 20), rng.uniform(-2, 1, 20)],
            axis=1,
        ).astype(np.float32)
        uvd, valid = project_points_to_image(pts, L2C, C2I)
        assert valid.all()
        back = back_project(uvd[:, :2], uvd[:, 2], L2C, C2I)
        np.testing.assert_allclose(back, pts, atol=1e-3)


class TestRHGM:
    def _setup(self, rng):
        h, w = 128, 256
        # radar points clustered around one object in front of the camera
        n = 40
        pts = np.zeros((n, 7), np.float32)
        pts[:, 0] = rng.uniform(9, 11, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        pts[:, 2] = rng.uniform(-1.0, 0.0, n)
        pts[:, 3:] = rng.randn(n, 4)
        # a mask covering the projected cluster
        uvd, _ = project_points_to_image(pts[:, :3], L2C, C2I)
        x1, x2 = int(uvd[:, 0].min()) - 10, int(uvd[:, 0].max()) + 10
        y1, y2 = int(uvd[:, 1].min()) - 10, int(uvd[:, 1].max()) + 10
        masks, labels = masks_from_gt_boxes2d(
            [[x1, y1, x2, y2]], [0], (h, w)
        )
        return masks, labels, pts

    def test_generates_virtual_points(self, rng):
        masks, labels, pts = self._setup(rng)
        out = generate_hybrid_points(
            masks, labels, pts, L2C, C2I, num_virtual=40,
            rng=np.random.RandomState(1),
        )
        v = out["virtual_points"]
        r = out["real_points"]
        assert v.shape[1] == 3 + 4 + 8
        # gauss branch 20 x k=1 + uniform branch 20 x k=4 = 100 rows
        assert 60 <= len(v) <= 100
        assert len(r) == 40  # all radar points are foreground here
        # virtual points lie near the real cluster in 3D
        assert np.all(v[:, 0] > 5) and np.all(v[:, 0] < 15)
        # one-hot label set for class 0
        np.testing.assert_allclose(v[:, 7], 1.0)
        # real points carry raw features + labels
        np.testing.assert_allclose(r[:, :7], pts, atol=1e-5)

    def test_no_masks(self, rng):
        _, _, pts = self._setup(rng)
        out = generate_hybrid_points(
            np.zeros((0, 128, 256), bool), np.zeros((0,), np.int64), pts, L2C, C2I
        )
        assert out["virtual_points"].shape == (0, 15)

    def test_mask_without_radar_hits(self, rng):
        masks, labels, pts = self._setup(rng)
        # a second mask in an empty image corner
        empty_mask, _ = masks_from_gt_boxes2d([[0, 0, 20, 20]], [1], (128, 256))
        masks = np.concatenate([masks, empty_mask])
        labels = np.array([0, 1])
        out = generate_hybrid_points(
            masks, labels, pts, L2C, C2I, num_virtual=40,
            rng=np.random.RandomState(1),
        )
        # the empty mask contributes nothing (no kNN source); class-0 rows only
        assert np.all(out["virtual_points"][:, 7] == 1.0)
        assert np.all(out["virtual_points"][:, 8] == 0.0)

    def test_loader_roundtrip(self, rng, tmp_path):
        """RHGM output feeds the dataset loader's hybrid merge path."""
        masks, labels, pts = self._setup(rng)
        out = generate_hybrid_points(
            masks, labels, pts, L2C, C2I, num_virtual=40,
            rng=np.random.RandomState(1),
        )
        np.save(tmp_path / "00000.pkl", out, allow_pickle=True)
        loaded = np.load(tmp_path / "00000.pkl.npy", allow_pickle=True).item()
        assert loaded["virtual_points"].shape == out["virtual_points"].shape

    def test_overlapping_masks_do_not_share_depth_sources(self, rng):
        """A real point is argmax-ATTRIBUTED to its first containing mask
        (hybrid_radar_pts_vod.py:162/230); a second, fully-overlapping
        mask has no attributed points and must emit nothing (the
        reference's instance-id isolation pushes its kNN distances past
        dist_thresh)."""
        masks, labels, pts = self._setup(rng)
        masks2 = np.concatenate([masks, masks])  # identical duplicate mask
        labels2 = np.array([0, 3])
        out = generate_hybrid_points(
            masks2, labels2, pts, L2C, C2I, num_virtual=40,
            rng=np.random.RandomState(1),
        )
        v = out["virtual_points"]
        assert len(v) > 0
        # every virtual point carries mask 0's label; mask 1 emitted none
        np.testing.assert_allclose(v[:, 3 + 4 + 0], 1.0)
        assert np.all(v[:, 3 + 4 + 3] == 0.0)

    def test_small_mask_still_emits_full_quota(self, rng):
        """Selections shorter than num_virtual are padded by repeating the
        first pick (hybrid_radar_pts_vod.py:214-216), so a tiny mask still
        yields the full gauss/uniform quota of virtual rows."""
        masks, labels, pts = self._setup(rng)
        # shrink the mask to a few pixels around one projected point
        uvd, _ = project_points_to_image(pts[:1, :3], L2C, C2I)
        x0, y0 = int(uvd[0, 0]), int(uvd[0, 1])
        tiny = np.zeros_like(masks)
        tiny[0, y0 - 1 : y0 + 2, x0 - 1 : x0 + 2] = True  # 9 px
        out = generate_hybrid_points(
            tiny, labels, pts, L2C, C2I, num_virtual=40,
            rng=np.random.RandomState(1),
        )
        v = out["virtual_points"]
        # hits >= 1 -> k taps = min(k, hits); with >=4 hits in the tiny
        # window this is 20*1 + 20*4 = 100, and never less than
        # num_virtual when at least one hit exists
        assert len(v) >= 40, len(v)
