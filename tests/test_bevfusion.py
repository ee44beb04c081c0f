"""BEVFusion family: camera-LSS + voxel-lidar fusion model."""
import numpy as np
import jax
import jax.numpy as jnp


def _batch(rng):
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0.5, 15, 128)
    pts[0, :, 1] = rng.uniform(-7, 7, 128)
    pts[0, :, 2] = rng.uniform(-2, 1, 128)
    pts[0, :, 3] = rng.randn(128)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((1, 128), bool),
        "images": jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32)),
        "trans_lidar_to_cam": jnp.asarray(
            np.array([[[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3],
                       [0, 0, 0, 1]]], np.float32)
        ),
        "trans_cam_to_img": jnp.asarray(
            np.array([[[40.0, 0, 48, 2.0], [0, 40, 32, -0.1],
                       [0, 0, 1, 0.002]]], np.float32)
        ),
        "lidar_aug_matrix": jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        "gt_boxes": jnp.asarray(gt),
    }


class TestBEVFusionModel:
    def test_forward_train_eval(self, rng):
        import dataclasses
        import optax

        from hgsfusion_tpu.models.detector import BEVFusionModel, HGSFusionConfig
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_transfusion_eval_step,
            make_transfusion_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.125),
            image_size=(64, 96), disc_num_bins=16, disc_depth_max=16.0,
            center_max_k=16, center_feature_map_stride=8,
        )
        model = BEVFusionModel(cfg=cfg)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        # 32x32 grid at stride 8 -> 4x4 BEV; 16 proposals
        assert preds["heatmap"].shape == (1, 16, 3)
        assert preds["dense_heatmap"].shape == (1, 4, 4, 3)

        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_transfusion_train_step(model, tx, {}, cfg))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0

        ev = jax.jit(make_transfusion_eval_step(model, cfg, {"SCORE_THRESH": 0.0}))
        out = ev(state2.params, state2.batch_stats, batch)
        assert out["boxes"].shape == (1, 16, 7)
        assert np.all(np.isfinite(np.asarray(out["boxes"])))

    def test_camera_branch_contributes(self, rng):
        """Zeroing the image must change the head outputs (the camera BEV is
        live, not a dead branch)."""
        from hgsfusion_tpu.models.detector import BEVFusionModel, HGSFusionConfig

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.125),
            image_size=(64, 96), disc_num_bins=16, disc_depth_max=16.0,
            center_max_k=16, center_feature_map_stride=8,
        )
        model = BEVFusionModel(cfg=cfg)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        p1 = model.apply(variables, batch, False)
        batch2 = dict(batch)
        batch2["images"] = jnp.zeros_like(batch["images"])
        p2 = model.apply(variables, batch2, False)
        assert not np.allclose(
            np.asarray(p1["dense_heatmap"]), np.asarray(p2["dense_heatmap"])
        )


class TestBEVFusionSwinVariant:
    def test_swin_image_branch_forward(self, rng):
        """Architecture-faithful variant: SwinTransformer +
        GeneralizedLSSFPN image branch (MODEL.IMAGE_BACKBONE switch)."""
        from hgsfusion_tpu.models.detector import (
            BEVFusionModel, HGSFusionConfig,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.125),
            image_size=(64, 96), disc_num_bins=16, disc_depth_max=16.0,
            center_max_k=16, center_feature_map_stride=8,
            image_backbone_arch="swin", swin_embed_dims=16,
            swin_depths=(2, 2), swin_num_heads=(2, 4), swin_window_size=4,
            swin_mlp_ratio=2, swin_out_indices=(0, 1), fpn_out_channels=24,
            remat=False,
        )
        model = BEVFusionModel(cfg=cfg)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        # swin params present, ddn absent
        assert "image_backbone" in variables["params"]
        assert "neck" in variables["params"]
        assert "ddn_backbone" not in variables["params"]
        preds = model.apply(variables, batch, False)
        for k, v in preds.items():
            assert np.all(np.isfinite(np.asarray(v))), k

    def test_config_builds_both_variants(self):
        from hgsfusion_tpu.config import load_config, model_config_from_yaml

        cfg = load_config("configs/bevfusion_vod.yaml")
        mc = model_config_from_yaml(cfg)
        assert mc.image_backbone_arch == "swin"
        assert mc.swin_depths == (2, 2, 6, 2)
        assert mc.fpn_out_channels == 256
        # removing the IMAGE_BACKBONE block falls back to the DDN variant
        del cfg.MODEL["IMAGE_BACKBONE"]
        mc2 = model_config_from_yaml(cfg)
        assert mc2.image_backbone_arch == "ddn"
