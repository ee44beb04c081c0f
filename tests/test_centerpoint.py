"""CenterPoint family: target assignment, losses, decode, full model.

Parity oracles are independent numpy/torch transcriptions of the reference
algorithms (center_head.py assign_target_of_single_head, loss_utils
neg_loss_cornernet/_reg_loss) run per-box the way the reference does.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.center_head import (
    CenterHead,
    center_head_loss,
    center_reg_loss,
    center_targets,
    centernet_focal_loss,
    decode_center_boxes,
    gaussian_radius,
)


def _radius_np(h, w, o):
    b1 = h + w
    c1 = w * h * (1 - o) / (1 + o)
    r1 = (b1 + np.sqrt(b1 * b1 - 4 * c1)) / 2
    b2 = 2 * (h + w)
    c2 = (1 - o) * w * h
    r2 = (b2 + np.sqrt(b2 * b2 - 16 * c2)) / 2
    a3 = 4 * o
    b3 = -2 * o * (h + w)
    c3 = (o - 1) * w * h
    r3 = (b3 + np.sqrt(b3 * b3 - 4 * a3 * c3)) / 2
    return np.minimum(np.minimum(r1, r2), r3)


def _targets_np(gt, num_class, hw, stride, pc_range, voxel, overlap, min_r):
    """Reference-style per-box loop (assign_target_of_single_head:108-161)."""
    H, W = hw
    heat = np.zeros((num_class, H, W), np.float32)
    M = gt.shape[0]
    boxes = np.zeros((M, 8), np.float32)
    inds = np.zeros(M, np.int64)
    mask = np.zeros(M, np.int64)
    for k in range(M):
        cls = int(gt[k, -1])
        dx = gt[k, 3] / voxel[0] / stride
        dy = gt[k, 4] / voxel[1] / stride
        if cls <= 0 or dx <= 0 or dy <= 0:
            continue
        cx = np.clip((gt[k, 0] - pc_range[0]) / voxel[0] / stride, 0, W - 0.5)
        cy = np.clip((gt[k, 1] - pc_range[1]) / voxel[1] / stride, 0, H - 0.5)
        xi, yi = int(cx), int(cy)
        r = max(int(_radius_np(dx, dy, overlap)), min_r)
        sigma = (2 * r + 1) / 6.0
        for v in range(max(yi - r, 0), min(yi + r + 1, H)):
            for u in range(max(xi - r, 0), min(xi + r + 1, W)):
                g = np.exp(-((u - xi) ** 2 + (v - yi) ** 2) / (2 * sigma**2))
                heat[cls - 1, v, u] = max(heat[cls - 1, v, u], g)
        inds[k] = yi * W + xi
        mask[k] = 1
        boxes[k, 0:2] = [cx - xi, cy - yi]
        boxes[k, 2] = gt[k, 2]
        boxes[k, 3:6] = np.log(gt[k, 3:6])
        boxes[k, 6] = np.cos(gt[k, 6])
        boxes[k, 7] = np.sin(gt[k, 6])
    return heat, boxes, inds, mask


class TestTargets:
    def test_gaussian_radius_matches_reference_formula(self, rng):
        h = rng.uniform(0.5, 40, 64).astype(np.float32)
        w = rng.uniform(0.5, 40, 64).astype(np.float32)
        got = np.asarray(gaussian_radius(jnp.asarray(h), jnp.asarray(w), 0.1))
        np.testing.assert_allclose(got, _radius_np(h, w, 0.1), rtol=1e-5)

    def test_center_targets_match_per_box_loop(self, rng):
        pc_range = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
        voxel = (0.5, 0.5, 0.5)
        stride, hw = 1, (32, 32)
        gt = np.zeros((10, 8), np.float32)
        n = 6
        gt[:n, 0] = rng.uniform(0.5, 15.5, n)
        gt[:n, 1] = rng.uniform(-7.5, 7.5, n)
        gt[:n, 2] = rng.uniform(-2, 1, n)
        gt[:n, 3:6] = rng.uniform(0.8, 6.0, (n, 3))
        gt[:n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[:n, 7] = rng.randint(1, 4, n)
        # overwrite: class lives in the LAST column for our layout
        gt[:, -1] = 0
        gt[:n, -1] = rng.randint(1, 4, n)

        t = center_targets(
            jnp.asarray(gt[None]), 3, hw, stride, pc_range, voxel,
            gaussian_overlap=0.1, min_radius=2,
        )
        heat_np, boxes_np, inds_np, mask_np = _targets_np(
            gt, 3, hw, stride, pc_range, voxel, 0.1, 2
        )
        np.testing.assert_allclose(
            np.asarray(t["heatmap"][0]).transpose(2, 0, 1), heat_np, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(t["mask"][0]), mask_np.astype(bool))
        m = mask_np.astype(bool)
        np.testing.assert_array_equal(np.asarray(t["inds"][0])[m], inds_np[m])
        np.testing.assert_allclose(
            np.asarray(t["boxes"][0])[m], boxes_np[m], atol=1e-5
        )

    def test_padded_rows_contribute_nothing(self):
        gt = np.zeros((1, 5, 8), np.float32)
        t = center_targets(
            jnp.asarray(gt), 3, (16, 16), 1,
            (0, -4, -3, 8, 4, 2), (0.5, 0.5, 0.5),
        )
        assert float(jnp.sum(t["heatmap"])) == 0.0
        assert not bool(jnp.any(t["mask"]))


class TestLosses:
    def test_focal_matches_torch_formula(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        gt = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        gt[0, 2, 3, 1] = 1.0
        gt[1, 5, 5, 0] = 1.0
        got = float(centernet_focal_loss(jnp.asarray(logits), jnp.asarray(gt)))

        p = torch.sigmoid(torch.from_numpy(logits)).clamp(1e-4, 1 - 1e-4)
        g = torch.from_numpy(gt)
        pos = g.eq(1).float()
        neg = g.lt(1).float()
        posl = (torch.log(p) * (1 - p) ** 2 * pos).sum()
        negl = (torch.log(1 - p) * p**2 * (1 - g) ** 4 * neg).sum()
        want = -(posl + negl) / pos.sum()
        assert abs(got - float(want)) < 1e-4

    def test_focal_no_positives_branch(self, rng):
        logits = rng.randn(1, 4, 4, 2).astype(np.float32)
        gt = np.full((1, 4, 4, 2), 0.3, np.float32)
        got = float(centernet_focal_loss(jnp.asarray(logits), jnp.asarray(gt)))
        assert np.isfinite(got) and got > 0

    def test_reg_loss_matches_torch_formula(self, rng):
        torch = pytest.importorskip("torch")
        maps = rng.randn(2, 8, 8, 5).astype(np.float32)
        inds = rng.randint(0, 64, (2, 7))
        mask = rng.rand(2, 7) > 0.4
        tgt = rng.randn(2, 7, 5).astype(np.float32)
        got = np.asarray(
            center_reg_loss(
                jnp.asarray(maps), jnp.asarray(inds), jnp.asarray(mask),
                jnp.asarray(tgt),
            )
        )
        flat = torch.from_numpy(maps).reshape(2, 64, 5)
        pred = flat.gather(
            1, torch.from_numpy(inds)[..., None].expand(-1, -1, 5)
        )
        m = torch.from_numpy(mask.astype(np.float32))[..., None].expand_as(pred)
        num = torch.from_numpy(mask.astype(np.float32)).sum().clamp_min(1.0)
        t = torch.from_numpy(tgt)
        want = (pred * m - t * m).abs().sum(dim=(0, 1)) / num
        np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


class TestDecode:
    def test_roundtrip_from_targets(self, rng):
        """Plant the target encodings into prediction maps -> decode must
        return the original boxes."""
        pc_range = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
        voxel = (0.5, 0.5, 0.5)
        hw = (32, 32)
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, :2] = [
            [4.2, -2.3, -0.5, 3.9, 1.6, 1.56, 0.3, 1],
            [10.1, 3.7, -0.2, 0.8, 0.6, 1.73, -1.2, 2],
        ]
        t = center_targets(jnp.asarray(gt), 3, hw, 1, pc_range, voxel)
        inds = np.asarray(t["inds"][0])
        tb = np.asarray(t["boxes"][0])

        hm = np.full((1, 32, 32, 3), -10.0, np.float32)
        center = np.zeros((1, 32, 32, 2), np.float32)
        cz = np.zeros((1, 32, 32, 1), np.float32)
        dim = np.zeros((1, 32, 32, 3), np.float32)
        rot = np.zeros((1, 32, 32, 2), np.float32)
        for k in range(2):
            y, x = divmod(int(inds[k]), 32)
            hm[0, y, x, int(gt[0, k, -1]) - 1] = 10.0  # sigmoid ~ 1
            center[0, y, x] = tb[k, 0:2]
            cz[0, y, x] = tb[k, 2]
            dim[0, y, x] = tb[k, 3:6]
            rot[0, y, x] = tb[k, 6:8]
        out = decode_center_boxes(
            {"hm": jnp.asarray(hm), "center": jnp.asarray(center),
             "center_z": jnp.asarray(cz), "dim": jnp.asarray(dim),
             "rot": jnp.asarray(rot)},
            k=10, feature_map_stride=1, pc_range=pc_range, voxel_size=voxel,
            post_center_limit_range=(-75, -75, -10, 75, 75, 10),
            score_thresh=0.5,
        )
        valid = np.asarray(out["valid"][0])
        assert valid.sum() == 2
        boxes = np.asarray(out["boxes"][0])[valid]
        labels = np.asarray(out["labels"][0])[valid]
        order = np.argsort(boxes[:, 0])
        np.testing.assert_allclose(boxes[order], gt[0, :2, :7], atol=1e-3)
        np.testing.assert_array_equal(labels[order], [1, 2])

    def test_score_thresh_and_range_mask(self):
        hm = np.full((1, 8, 8, 1), -10.0, np.float32)
        hm[0, 4, 4, 0] = 10.0
        zeros = lambda c: jnp.zeros((1, 8, 8, c), jnp.float32)
        out = decode_center_boxes(
            {"hm": jnp.asarray(hm), "center": zeros(2), "center_z": zeros(1),
             "dim": zeros(3), "rot": zeros(2)},
            k=5, feature_map_stride=1, pc_range=(0, -2, -3, 4, 2, 1),
            voxel_size=(0.5, 0.5, 0.5),
            post_center_limit_range=(0, -2, -10, 1.0, 2, 10),  # x<=1 excludes
            score_thresh=0.1,
        )
        assert int(np.asarray(out["valid"]).sum()) == 0


class TestCenterPointModel:
    def _batch(self, rng):
        pts = np.zeros((1, 128, 5), np.float32)
        pts[0, :, 0] = rng.uniform(0.5, 15, 128)
        pts[0, :, 1] = rng.uniform(-7, 7, 128)
        pts[0, :, 2] = rng.uniform(-2, 1, 128)
        pts[0, :, 3:] = rng.randn(128, 2)
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        return {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((1, 128), bool),
            "gt_boxes": jnp.asarray(gt),
        }

    def test_forward_train_eval(self, rng):
        import dataclasses
        import optax

        from hgsfusion_tpu.models.detector import CenterPointModel, HGSFusionConfig
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_center_eval_step,
            make_center_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.5),
            center_max_k=16,
        )
        model = CenterPointModel(cfg=cfg)
        batch = self._batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        assert preds["hm"].shape == (1, 16, 16, 3)
        assert preds["rot"].shape == (1, 16, 16, 2)

        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_center_train_step(model, tx, {"loc_weight": 2.0}, cfg))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0
        # params actually moved
        leaf0 = jax.tree_util.tree_leaves(state.params)[0]
        leaf1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))

        ev = jax.jit(make_center_eval_step(model, cfg, {"SCORE_THRESH": 0.0}))
        out = ev(state2.params, state2.batch_stats, batch)
        assert out["boxes"].shape == (1, 16, 7)
        assert np.all(np.isfinite(np.asarray(out["boxes"])))


class TestVelocityHead:
    def test_targets_decode_loss_with_velocity(self):
        """nuScenes-style vel branch: targets carry (vx, vy) extras at
        code_size 10, decode returns 'vels', and the loss consumes the
        10-wide regression stack."""
        gt = np.zeros((1, 3, 10), np.float32)
        gt[0, 0] = [10.0, 5.0, 0.5, 4.6, 1.9, 1.6, 0.3, 3.0, -1.0, 1]
        gt[0, 1] = [-8.0, 2.0, 0.2, 0.8, 0.8, 1.8, 0.0, 0.0, 0.5, 2]
        hw = (32, 32)
        pc_range = (-25.6, -25.6, -5, 25.6, 25.6, 3)
        voxel = (0.8, 0.8, 8.0)
        tgt = center_targets(
            jnp.asarray(gt), 2, hw, 2, pc_range, voxel, code_size=10)
        assert tgt["boxes"].shape == (1, 3, 10)
        np.testing.assert_allclose(
            np.asarray(tgt["boxes"])[0, 0, 8:10], [3.0, -1.0], atol=1e-6)

        rng = np.random.RandomState(0)
        preds = {
            "hm": jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32)),
            "center": jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32)),
            "center_z": jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)),
            "dim": jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)),
            "rot": jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32)),
            "vel": jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32)),
        }
        total, tb = center_head_loss(
            preds, tgt, ("center", "center_z", "dim", "rot", "vel"),
            [1.0] * 8 + [0.2, 0.2])
        assert np.isfinite(float(total))

        out = decode_center_boxes(
            preds, 16, 2, pc_range, voxel,
            (-60, -60, -10, 60, 60, 10), score_thresh=0.0)
        assert out["vels"].shape == (1, 16, 2)
        # vels gathered at the same peak pixels as the boxes
        flat_vel = np.asarray(preds["vel"]).reshape(32 * 32, 2)
        hm = np.asarray(jax.nn.sigmoid(preds["hm"]))
        # find the argmax peak: its velocity must appear in out["vels"]
        peak = np.unravel_index(hm[0].transpose(2, 0, 1).reshape(-1).argmax(),
                                (2, 32, 32))
        spatial = peak[1] * 32 + peak[2]
        np.testing.assert_allclose(
            np.asarray(out["vels"][0, 0]), flat_vel[spatial], atol=1e-6)


class TestCenterEvalNMS:
    def test_near_duplicate_peaks_are_suppressed(self):
        """A trained heatmap has gaussian responses: the cell next to a
        peak also clears SCORE_THRESH, so without the reference's final
        class_agnostic_nms (center_head.py:336-348) every object yields
        near-duplicate boxes that score as FPs in eval."""
        import dataclasses

        from hgsfusion_tpu.models.detector import HGSFusionConfig
        from hgsfusion_tpu.train.trainer import make_center_eval_step

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.5),
            center_max_k=16,
        )
        h = w = 16
        logit = np.full((1, h, w, 3), -10.0, np.float32)
        logit[0, 5, 5, 0] = 6.0   # peak
        logit[0, 5, 6, 0] = 5.0   # gaussian shoulder, same object
        logit[0, 10, 12, 1] = 6.0  # second object, other class
        preds = {
            "hm": jnp.asarray(logit),
            "center": jnp.zeros((1, h, w, 2)),
            "center_z": jnp.zeros((1, h, w, 1)),
            "dim": jnp.log(jnp.ones((1, h, w, 3)) * 2.0),
            "rot": jnp.concatenate(
                [jnp.ones((1, h, w, 1)), jnp.zeros((1, h, w, 1))], -1),
        }

        class _Stub:
            def apply(self, variables, inputs, train):
                return preds

        post = {"SCORE_THRESH": 0.1,
                "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.2,
                               "NMS_PRE_MAXSIZE": 16,
                               "NMS_POST_MAXSIZE": 8}}
        ev = make_center_eval_step(_Stub(), cfg, post)
        out = ev({}, {}, {"points": jnp.zeros((1, 4, 5)),
                          "points_valid": jnp.ones((1, 4), bool)})
        assert out["boxes"].shape == (1, 8, 7)  # NMS_POST_MAXSIZE
        # the shoulder peak (1 cell away, identical 2x2 m box) must be
        # suppressed: exactly 2 valid detections remain
        assert int(np.sum(np.asarray(out["valid"]))) == 2
        kept = np.asarray(out["boxes"][0])[np.asarray(out["valid"][0])]
        assert not np.allclose(kept[0][:2], kept[1][:2])
        # no-NMS post_cfg keeps the raw decode (3 cells over threshold)
        ev_raw = make_center_eval_step(_Stub(), cfg, {"SCORE_THRESH": 0.1})
        out_raw = ev_raw({}, {}, {"points": jnp.zeros((1, 4, 5)),
                                  "points_valid": jnp.ones((1, 4), bool)})
        assert int(np.sum(np.asarray(out_raw["valid"]))) == 3
