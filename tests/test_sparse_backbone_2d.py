"""Detector integration for the sparse 2D pillar backbone family
(spconv_backbone_2d.py / spconv_backbone_voxelnext2d.py; module parity vs
the reference is tested directly in test_reference_parity.py — this
exercises the CenterPoint/VoxelNeXt wiring, train/eval steps, configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _batch(rng):
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


def _train_eval_roundtrip(model, cfg, batch):
    import optax

    from hgsfusion_tpu.train.trainer import (
        TrainState,
        make_center_eval_step,
        make_center_train_step,
    )

    variables = model.init(jax.random.PRNGKey(0), batch, False)
    tx = optax.adam(1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_center_train_step(model, tx, {"loc_weight": 2.0},
                                          cfg))
    state2, tb = step(state, batch)
    assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0
    ev = jax.jit(make_center_eval_step(model, cfg, {"SCORE_THRESH": 0.0}))
    out = ev(state2.params, state2.batch_stats, batch)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    return variables


class TestCenterPointPillarRes2D:
    @pytest.mark.parametrize("arch", ["pillar_res2d_8x", "pillar_8x"])
    def test_train_eval(self, rng, arch):
        from hgsfusion_tpu.models.detector import (
            CenterPointModel,
            HGSFusionConfig,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.25, 0.25, 0.5),
            center_max_k=16, center_feature_map_stride=8,
            backbone_3d_arch=arch,
        )
        model = CenterPointModel(cfg=cfg)
        batch = _batch(rng)
        variables = _train_eval_roundtrip(model, cfg, batch)
        bb = variables["params"]["backbone_3d"]
        # four sparse stages + the dense stride-16 stage exist
        for k in ("conv1_block0", "conv2_down", "conv4_block1",
                  "conv5_down", "conv5_block0"):
            assert k in bb, sorted(bb)
        assert "backbone_2d" in variables["params"]
        # head at stride 8: 64-voxel grid -> 8x8 maps
        preds = model.apply(variables, batch, False)
        assert preds["hm"].shape == (1, 8, 8, 3)

    def test_pillar8x_uses_post_act_blocks(self, rng):
        """PillarBackBone8x: non-residual post-act subm blocks (convbn
        sub-module instead of the res block's conv1/conv2)."""
        from hgsfusion_tpu.models.detector import (
            CenterPointModel,
            HGSFusionConfig,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.25, 0.25, 0.5),
            center_max_k=16, center_feature_map_stride=8,
            backbone_3d_arch="pillar_8x",
        )
        model = CenterPointModel(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), _batch(rng), False)
        blk = variables["params"]["backbone_3d"]["conv1_block0"]
        assert "convbn" in blk and "conv1" not in blk


class TestVoxelNeXt2DModel:
    def test_train_eval(self, rng):
        from hgsfusion_tpu.models.detector import (
            HGSFusionConfig,
            VoxelNeXtModel,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.25, 0.25, 0.5),
            center_max_k=16, center_feature_map_stride=8,
            backbone_3d_arch="voxelnext2d",
        )
        model = VoxelNeXtModel(cfg=cfg)
        batch = _batch(rng)
        variables = _train_eval_roundtrip(model, cfg, batch)
        bb = variables["params"]["backbone_3d"]
        for k in ("conv1_block2", "conv3_block5", "conv6_block2",
                  "conv_out", "shared_conv"):
            assert k in bb, sorted(bb)
        preds = model.apply(variables, batch, False)
        assert preds["hm"].shape == (1, 8, 8, 3)


class TestConfigs:
    def test_res2d_config_selects_arch(self):
        from hgsfusion_tpu.config import load_config, model_config_from_yaml

        cfg = load_config("/root/repo/configs/centerpoint_pillarres2d_vod.yaml")
        mc = model_config_from_yaml(cfg)
        assert mc.backbone_3d_arch == "pillar_res2d_8x"
        assert mc.center_feature_map_stride == 8
        assert mc.bev_v1_num_filters == (256, 256)
        base = load_config("/root/repo/configs/centerpoint_vod.yaml")
        assert model_config_from_yaml(base).backbone_3d_arch == "voxel8x"

    def test_voxelnext2d_config_selects_arch(self):
        from hgsfusion_tpu.config import load_config, model_config_from_yaml

        cfg = load_config("/root/repo/configs/voxelnext2d_vod.yaml")
        mc = model_config_from_yaml(cfg)
        assert mc.backbone_3d_arch == "voxelnext2d"
