"""SECOND family: mean VFE, masked 3D sparse-conv equivalence, detector."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.voxel_backbone import (
    VoxelBackBone8x,
    _SparseDown3D,
    _SubMConvBN3D,
    height_compression,
    mean_vfe,
    points_to_voxel_ids,
)


PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
VOXEL = (0.5, 0.5, 0.5)
GRID = (32, 32, 10)  # nx, ny, nz


class TestMeanVFE:
    def test_mean_matches_numpy(self, rng):
        n = 200
        pts = np.zeros((1, n, 4), np.float32)
        pts[0, :, 0] = rng.uniform(-1, 17, n)  # includes out-of-range
        pts[0, :, 1] = rng.uniform(-9, 9, n)
        pts[0, :, 2] = rng.uniform(-4, 3, n)
        pts[0, :, 3] = rng.randn(n)
        valid = np.ones((1, n), bool)
        valid[0, -20:] = False

        dense, mask = mean_vfe(
            jnp.asarray(pts), jnp.asarray(valid), PC_RANGE, VOXEL, GRID
        )
        assert dense.shape == (1, 11, 32, 32, 4)  # nz+1 top pad
        assert mask.shape == (1, 11, 32, 32, 1)

        # numpy oracle
        acc = {}
        for k in range(n):
            if not valid[0, k]:
                continue
            ix = int(np.floor((pts[0, k, 0] - PC_RANGE[0]) / VOXEL[0]))
            iy = int(np.floor((pts[0, k, 1] - PC_RANGE[1]) / VOXEL[1]))
            iz = int(np.floor((pts[0, k, 2] - PC_RANGE[2]) / VOXEL[2]))
            if not (0 <= ix < 32 and 0 <= iy < 32 and 0 <= iz < 10):
                continue
            acc.setdefault((iz, iy, ix), []).append(pts[0, k])
        d = np.asarray(dense[0])
        m = np.asarray(mask[0, ..., 0])
        assert m.sum() == len(acc)
        for (iz, iy, ix), plist in acc.items():
            assert m[iz, iy, ix]
            np.testing.assert_allclose(
                d[iz, iy, ix], np.mean(plist, axis=0), atol=1e-5
            )
        assert not m[10].any()  # padded top plane stays empty

    def test_ids_dump_slot(self):
        pts = np.array([[[100.0, 0.0, 0.0, 1.0]]], np.float32)
        ids, ing = points_to_voxel_ids(
            jnp.asarray(pts), jnp.ones((1, 1), bool), PC_RANGE, VOXEL, GRID
        )
        assert int(ids[0, 0]) == 32 * 32 * 10 and not bool(ing[0, 0])


class TestMasked3DConv:
    def test_subm_ignores_inactive_input_values(self, rng):
        """Garbage stored at inactive sites must not leak (sparse semantics)."""
        x = rng.randn(1, 6, 8, 8, 4).astype(np.float32)
        mask = rng.rand(1, 6, 8, 8, 1) > 0.6
        mod = _SubMConvBN3D(8)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), False)
        y1 = mod.apply(v, jnp.asarray(x), jnp.asarray(mask), False)
        x2 = x + 100.0 * (~mask) * rng.randn(1, 6, 8, 8, 4)
        y2 = mod.apply(v, jnp.asarray(x2), jnp.asarray(mask), False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
        # inactive outputs are exactly zero (submanifold never grows)
        assert np.abs(np.asarray(y1)[~np.broadcast_to(mask, y1.shape)]).max() == 0

    def test_down_mask_is_receptive_field_dilation(self, rng):
        mask = np.zeros((1, 6, 8, 8, 1), bool)
        mask[0, 2, 3, 5, 0] = True
        mod = _SparseDown3D(4)
        v = mod.init(
            jax.random.PRNGKey(0), jnp.ones((1, 6, 8, 8, 2)), jnp.asarray(mask),
            False,
        )
        _, new_mask = mod.apply(
            v, jnp.ones((1, 6, 8, 8, 2)), jnp.asarray(mask), False
        )
        nm = np.asarray(new_mask[0, ..., 0])
        # stride-2 pad-1 kernel-3: output (d,h,w) active iff input window
        # [2d-1, 2d+1] x ... contains the active site (2, 3, 5)
        want = np.zeros((3, 4, 4), bool)
        for dd in range(3):
            for hh in range(4):
                for ww in range(4):
                    want[dd, hh, ww] = (
                        abs(2 * dd - 2) <= 1 and abs(2 * hh - 3) <= 1
                        and abs(2 * ww - 5) <= 1
                    )
        np.testing.assert_array_equal(nm, want)

    def test_backbone_shapes(self, rng):
        x = jnp.asarray(rng.randn(1, 41, 32, 32, 4).astype(np.float32))
        mask = jnp.asarray(rng.rand(1, 41, 32, 32, 1) > 0.9)
        mod = VoxelBackBone8x()
        v = mod.init(jax.random.PRNGKey(0), x, mask, False)
        y, m, stages = mod.apply(v, x, mask, False)
        # z: 41 -> 21 -> 11 -> (pad0) 5 -> (k3 s2 p0) 2; xy stride 8
        assert y.shape == (1, 2, 4, 4, 128)
        assert m.shape[:-1] == y.shape[:-1]
        assert set(stages) == {"x_conv1", "x_conv2", "x_conv3", "x_conv4"}
        assert stages["x_conv3"][2] == 4

    def test_backbone_rejects_shallow_z(self):
        mod = VoxelBackBone8x()
        with pytest.raises(ValueError, match="z-planes"):
            mod.init(
                jax.random.PRNGKey(0), jnp.ones((1, 11, 8, 8, 4)),
                jnp.ones((1, 11, 8, 8, 1), bool), False,
            )

    def test_height_compression_matches_torch_view(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 3, 4, 5, 6).astype(np.float32)  # (B, D, H, W, C)
        got = np.asarray(height_compression(jnp.asarray(x)))
        t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # (B, C, D, H, W)
        want = t.reshape(2, 6 * 3, 4, 5).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(got, want)


class TestSECONDModel:
    def test_forward_and_train(self, rng):
        import optax

        from hgsfusion_tpu.models.anchors import TargetAssigner
        from hgsfusion_tpu.models.detector import HGSFusionConfig, SECONDModel
        from hgsfusion_tpu.train.trainer import (
            TrainState, make_train_step,
        )

        # z voxel 0.125 -> 40 z-planes (+1 pad = 41, the KITTI depth chain)
        cfg = HGSFusionConfig(
            pc_range=PC_RANGE, voxel_size=(0.5, 0.5, 0.125),
            num_anchors_per_location=6,
        )
        model = SECONDModel(cfg=cfg)
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
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        # stride-8 over a 32x32 grid -> 4x4 head maps
        assert preds["cls_preds"].shape == (1, 4, 4, 6 * 3)

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
        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_train_step(
            model, assigner, tx,
            {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
             "code_weights": [1.0] * 7},
            cfg, use_occ_loss=False,
        ))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0


class TestSECONDFocalModel:
    """SECOND with the VoxelBackBone8xFocal 3D backbone (focal sparse conv
    family, spconv_backbone_focal.py; module parity is tested directly in
    test_reference_parity.py — this exercises the detector integration)."""

    def _batch(self, rng):
        pts = np.zeros((1, 128, 4), np.float32)
        pts[0, :, 0] = rng.uniform(0.5, 15, 128)
        pts[0, :, 1] = rng.uniform(-7, 7, 128)
        pts[0, :, 2] = rng.uniform(-2, 1, 128)
        pts[0, :, 3] = rng.randn(128)
        gt = np.zeros((1, 3, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        return {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((1, 128), bool),
            "gt_boxes": jnp.asarray(gt),
        }

    def test_train_step_supervises_importance_head(self, rng):
        import optax

        from hgsfusion_tpu.models.anchors import TargetAssigner
        from hgsfusion_tpu.models.detector import HGSFusionConfig, SECONDModel
        from hgsfusion_tpu.train.trainer import TrainState, make_train_step

        cfg = HGSFusionConfig(
            pc_range=PC_RANGE, voxel_size=(0.5, 0.5, 0.125),
            num_anchors_per_location=6, backbone_3d_arch="voxel8x_focal",
        )
        model = SECONDModel(cfg=cfg)
        batch = self._batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        # the focal importance heads exist on all three stages
        bb = variables["params"]["backbone_3d"]
        for stage in ("focal1", "focal2", "focal3"):
            assert "conv_imp" in bb[stage], sorted(bb[stage])
        preds = model.apply(variables, batch, False)
        assert "focal_aux" not in preds  # eval output carries no aux
        assert preds["cls_preds"].shape == (1, 4, 4, 6 * 3)

        anchor_cfgs = [
            dict(class_name=c, anchor_sizes=[[3.9, 1.6, 1.56]],
                 anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
                 matched_threshold=0.5, unmatched_threshold=0.35,
                 feature_map_stride=8)
            for c in cfg.class_names
        ]
        assigner = TargetAssigner(
            anchor_cfgs, cfg.grid_size, cfg.pc_range,
            class_names=cfg.class_names,
        )
        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_train_step(
            model, assigner, tx,
            {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
             "code_weights": [1.0] * 7},
            cfg, use_occ_loss=False,
        ))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0
        assert np.isfinite(float(tb["loss_box_of_pts"]))
        assert float(tb["loss_box_of_pts"]) > 0
        # the aux loss actually reaches the importance head (it has no
        # other gradient path when masks barely dilate)
        delta = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a - b)).max()),
            state.params["backbone_3d"]["focal1"]["conv_imp"],
            state2.params["backbone_3d"]["focal1"]["conv_imp"],
        )
        assert max(jax.tree_util.tree_leaves(delta)) > 0

    def test_focal_config_builds_focal_arch(self):
        from hgsfusion_tpu.config import load_config, model_config_from_yaml

        cfg = load_config("/root/repo/configs/second_focal_vod.yaml")
        mc = model_config_from_yaml(cfg)
        assert mc.backbone_3d_arch == "voxel8x_focal"
        assert mc.focal_topk is True and mc.focal_threshold == 0.5
        base = load_config("/root/repo/configs/second_vod.yaml")
        # the base config is otherwise inherited verbatim
        assert cfg.MODEL.DENSE_HEAD.NAME == base.MODEL.DENSE_HEAD.NAME
        assert model_config_from_yaml(base).backbone_3d_arch == "voxel8x"
