"""VoxelNeXt family: multi-scale placement, z-sum collapse, full model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.voxel_backbone import (
    VoxelResBackBone8xVoxelNeXt,
    _place_strided,
    _SparseBasicBlock3D,
)


class TestPlacement:
    def test_strided_placement_matches_index_scaling(self, rng):
        """Dense equivalent of `indices *= 2`: feature (i,j,k) lands at
        (2i,2j,2k), zeros elsewhere."""
        src = rng.randn(1, 3, 4, 4, 2).astype(np.float32)
        m = rng.rand(1, 3, 4, 4, 1) > 0.5
        out, om = _place_strided(jnp.asarray(src), jnp.asarray(m), (6, 8, 8), 2)
        o = np.asarray(out)
        for i in range(3):
            for j in range(4):
                for k in range(4):
                    np.testing.assert_array_equal(o[0, 2 * i, 2 * j, 2 * k],
                                                  src[0, i, j, k])
        # odd coordinates are all zero / inactive
        assert np.abs(o[0, 1::2]).max() == 0
        assert not np.asarray(om)[0, 1::2].any()

    def test_placement_clips_overflow(self, rng):
        """A coarse grid one too large for the fine grid is clipped, not
        wrapped or errored."""
        src = np.ones((1, 4, 4, 4, 1), np.float32)
        m = np.ones((1, 4, 4, 4, 1), bool)
        out, om = _place_strided(jnp.asarray(src), jnp.asarray(m), (6, 6, 6), 2)
        assert out.shape == (1, 6, 6, 6, 1)
        assert int(np.asarray(om).sum()) == 27  # 3^3 sites fit


class TestResidualBlock:
    def test_sparse_semantics_and_residual(self, rng):
        x = rng.randn(1, 4, 6, 6, 8).astype(np.float32)
        mask = rng.rand(1, 4, 6, 6, 1) > 0.5
        x = x * mask
        mod = _SparseBasicBlock3D(8)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), False)
        y = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(mask), False))
        assert np.abs(y[~np.broadcast_to(mask, y.shape)]).max() == 0
        # garbage at inactive sites cannot leak
        x2 = x + 50.0 * (~mask) * rng.randn(*x.shape)
        y2 = np.asarray(mod.apply(v, jnp.asarray(x2), jnp.asarray(mask), False))
        np.testing.assert_allclose(y, y2, atol=1e-4)


class TestVoxelNeXtModel:
    def test_backbone_shapes_and_bev_mask(self, rng):
        # one occupied corner: the dilated BEV active set must stay local
        # (64x64 grid -> 8x8 BEV so five dilations can't flood everything)
        x = np.zeros((1, 41, 64, 64, 4), np.float32)
        mask = np.zeros((1, 41, 64, 64, 1), bool)
        mask[0, 3:6, 2:5, 2:5] = True
        x[0, 3:6, 2:5, 2:5] = rng.randn(3, 3, 3, 4)
        mod = VoxelResBackBone8xVoxelNeXt()
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), False)
        bev, bm = mod.apply(v, jnp.asarray(x), jnp.asarray(mask), False)
        assert bev.shape == (1, 8, 8, 128)  # stride 8 over 64x64
        assert bm.shape == (1, 8, 8, 1)
        bm_np = np.asarray(bm)
        assert bm_np.any() and not bm_np.all()  # local active set
        assert np.abs(np.asarray(bev)[~np.broadcast_to(bm_np, bev.shape)]).max() == 0

    def test_forward_train_eval(self, rng):
        import optax

        from hgsfusion_tpu.models.detector import HGSFusionConfig, VoxelNeXtModel
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_center_eval_step,
            make_center_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.125),
            center_feature_map_stride=8, center_max_k=16,
        )
        model = VoxelNeXtModel(cfg=cfg)
        pts = np.zeros((1, 128, 4), np.float32)
        pts[0, :, 0] = rng.uniform(0.5, 15, 128)
        pts[0, :, 1] = rng.uniform(-7, 7, 128)
        pts[0, :, 2] = rng.uniform(-2, 1, 128)
        pts[0, :, 3] = rng.randn(128)
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        batch = {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((1, 128), bool),
            "gt_boxes": jnp.asarray(gt),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        assert preds["hm"].shape == (1, 4, 4, 3)

        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_center_train_step(model, tx, {}, cfg))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0

        ev = jax.jit(make_center_eval_step(model, cfg, {"SCORE_THRESH": 0.0}))
        out = ev(state2.params, state2.batch_stats, batch)
        assert out["boxes"].shape == (1, 16, 7)
