"""PV-RCNN family: proposals, canonical targets, grid points, full model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.pvrcnn import (
    canonical_reg_targets,
    decode_canonical,
    generate_proposals,
    interpolate_bev,
    roi_grid_points,
    roi_targets,
)
from hgsfusion_tpu.utils.box_coder import ResidualCoder

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
VOXEL = (0.5, 0.5, 0.125)


class TestCanonical:
    def test_encode_decode_roundtrip(self, rng):
        coder = ResidualCoder()
        n = 12
        rois = np.zeros((n, 7), np.float32)
        rois[:, :2] = rng.uniform(2, 14, (n, 2))
        rois[:, 2] = rng.uniform(-2, 1, n)
        rois[:, 3:6] = rng.uniform(1, 4, (n, 3))
        rois[:, 6] = rng.uniform(-np.pi, np.pi, n)
        gts = rois.copy()
        gts[:, :3] += rng.randn(n, 3) * 0.3
        gts[:, 3:6] *= rng.uniform(0.8, 1.2, (n, 3))
        gts[:, 6] += rng.randn(n) * 0.2

        enc = canonical_reg_targets(jnp.asarray(rois), jnp.asarray(gts), coder)
        dec = np.asarray(decode_canonical(enc, jnp.asarray(rois), coder))
        np.testing.assert_allclose(dec[:, :6], gts[:, :6], atol=1e-4)
        d = np.abs(dec[:, 6] - gts[:, 6]) % (2 * np.pi)
        assert np.all(np.minimum(d, 2 * np.pi - d) < 1e-4)


    def test_opposite_heading_canonicalized(self):
        """roi_head_template.py:124-131: a gt facing the opposite way
        (heading residual ~pi) is flipped by pi into [-pi/2, pi/2] before
        encoding — the raw residual would train the head to rotate the
        refined box 180 degrees."""
        coder = ResidualCoder()
        rois = np.array([[5, 5, 0, 4, 2, 1.5, 0.0]], np.float32)
        gts = rois.copy()
        gts[:, 6] = np.pi + 0.1
        enc = canonical_reg_targets(jnp.asarray(rois), jnp.asarray(gts),
                                    coder)
        assert abs(float(enc[0, 6]) - 0.1) < 1e-5
        # and a large positive residual wraps/clamps into the canonical arc
        gts[:, 6] = 2 * np.pi - 0.05
        enc = canonical_reg_targets(jnp.asarray(rois), jnp.asarray(gts),
                                    coder)
        assert abs(float(enc[0, 6]) + 0.05) < 1e-5

    def test_grid_points_match_reference_layout(self):
        """get_dense_grid_points: (idx + 0.5)/g * size - size/2, rotated."""
        roi = np.array([[2.0, -1.0, 0.5, 4.0, 2.0, 1.0, 0.0]], np.float32)
        pts = np.asarray(roi_grid_points(jnp.asarray(roi), 2))
        assert pts.shape == (1, 8, 3)
        # axis-aligned roi: corners at center +- size/4
        want_x = sorted([2.0 - 1.0, 2.0 + 1.0])
        got_x = sorted(set(np.round(pts[0, :, 0], 4)))
        np.testing.assert_allclose(got_x, want_x, atol=1e-5)
        # all grid points inside the roi
        assert np.all(np.abs(pts[0, :, 2] - 0.5) <= 0.5)


class TestProposals:
    def test_nms_and_fixed_shapes(self, rng):
        n = 200
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, :2] = rng.uniform(0, 16, (n, 2))
        boxes[:, 3:6] = 2.0
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.randint(1, 4, n)
        rois, s, l, v = generate_proposals(
            jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(boxes),
            num_rois=16, nms_thresh=0.1,
        )
        assert rois.shape == (16, 7) and v.dtype == bool
        s = np.asarray(s)[np.asarray(v)]
        assert np.all(np.diff(s) <= 1e-6)  # score-ordered survivors

    def test_roi_targets_alignment(self, rng):
        gts = np.zeros((4, 8), np.float32)
        gts[0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.0, 1]
        rois = np.zeros((6, 7), np.float32)
        rois[0] = [4.1, -2, -0.5, 3.9, 1.6, 1.56, 0.0]   # high IoU -> fg
        rois[1] = [12, 5, 0, 2, 2, 2, 0.0]               # no overlap -> bg
        valid = np.array([True, True, False, False, False, False])
        t = roi_targets(jnp.asarray(rois), jnp.asarray(valid), jnp.asarray(gts))
        assert bool(t["reg_valid"][0]) and not bool(t["reg_valid"][1])
        assert float(t["cls_labels"][0]) == 1.0
        assert float(t["cls_labels"][1]) == 0.0
        np.testing.assert_allclose(np.asarray(t["gt_of_roi"][0, :7]), gts[0, :7])


class TestBEVInterp:
    def test_matches_manual_bilinear(self, rng):
        bev = rng.randn(1, 8, 8, 3).astype(np.float32)
        # reference convention (bilinear_interpolate_torch): NO half-texel
        # shift — a query at a cell's metric CENTER maps to coord k+0.5
        # and blends cells k and k+1 at 50/50
        xy = np.array([[[ (2 + 0.5) * VOXEL[0] * 8 + PC_RANGE[0],
                          (3 + 0.5) * VOXEL[1] * 8 + PC_RANGE[1] ]]], np.float32)
        out = np.asarray(interpolate_bev(jnp.asarray(bev), jnp.asarray(xy),
                                         PC_RANGE, VOXEL, 8))
        want = 0.25 * (bev[0, 3, 2] + bev[0, 3, 3]
                       + bev[0, 4, 2] + bev[0, 4, 3])
        np.testing.assert_allclose(out[0, 0], want, atol=1e-5)
        # a query at an exact grid coordinate returns that cell exactly
        xy2 = np.array([[[ 2 * VOXEL[0] * 8 + PC_RANGE[0],
                           3 * VOXEL[1] * 8 + PC_RANGE[1] ]]], np.float32)
        out2 = np.asarray(interpolate_bev(jnp.asarray(bev), jnp.asarray(xy2),
                                          PC_RANGE, VOXEL, 8))
        np.testing.assert_allclose(out2[0, 0], bev[0, 3, 2], atol=1e-5)


class TestPVRCNNModel:
    def test_forward_train_eval(self, rng):
        import optax

        from hgsfusion_tpu.models.anchors import TargetAssigner
        from hgsfusion_tpu.models.detector import HGSFusionConfig, PVRCNNModel
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_pvrcnn_eval_step,
            make_pvrcnn_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=PC_RANGE, voxel_size=VOXEL,
            num_anchors_per_location=6, pv_num_keypoints=64, pv_num_rois=8,
        )
        anchor_cfgs = [
            dict(class_name=c, anchor_sizes=[[3.9, 1.6, 1.56]],
                 anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
                 matched_threshold=0.5, unmatched_threshold=0.35,
                 feature_map_stride=8)
            for c in cfg.class_names
        ]
        assigner = TargetAssigner(
            anchor_cfgs, cfg.grid_size, cfg.pc_range, class_names=cfg.class_names
        )
        model = PVRCNNModel(cfg=cfg)
        pts = np.zeros((1, 128, 4), np.float32)
        pts[0, :, 0] = rng.uniform(0.5, 15, 128)
        pts[0, :, 1] = rng.uniform(-7, 7, 128)
        pts[0, :, 2] = rng.uniform(-2, 1, 128)
        pts[0, :, 3] = rng.randn(128)
        gt = np.zeros((1, 3, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        batch = {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((1, 128), bool),
            "gt_boxes": jnp.asarray(gt),
        }
        inputs = {**batch, "anchors": assigner.flat_anchors}
        variables = model.init(jax.random.PRNGKey(0), inputs, False)
        preds = model.apply(variables, inputs, False)
        assert preds["rois"].shape == (1, 8, 7)
        assert preds["rcnn_cls"].shape == (1, 8)
        assert preds["rcnn_reg"].shape == (1, 8, 7)
        assert preds["keypoints"].shape == (1, 64, 3)

        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_pvrcnn_train_step(
            model, assigner, tx,
            {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
             "code_weights": [1.0] * 7}, cfg,
        ))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0
        for k in ("rcnn_cls", "rcnn_reg", "point_fg"):
            assert np.isfinite(float(tb[k])), k

        ev = jax.jit(make_pvrcnn_eval_step(
            model, assigner, cfg,
            {"SCORE_THRESH": 0.0,
             "NMS_CONFIG": {"NMS_THRESH": 0.1, "NMS_POST_MAXSIZE": 8}},
        ))
        out = ev(state2.params, state2.batch_stats, batch)
        assert out["boxes"].shape == (1, 8, 7)
        assert np.all(np.isfinite(np.asarray(out["boxes"])))
