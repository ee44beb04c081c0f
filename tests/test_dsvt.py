"""DSVT family: window partition/masking semantics + full model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.dsvt import (
    DSVTBackbone,
    _partition,
    _unpartition,
)


class TestWindows:
    def test_partition_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))
        for shift in (0, 4):
            t = _partition(x, 8, shift)
            assert t.shape == (2 * 4, 64, 5)
            back = _unpartition(t, 2, 16, 16, 8, shift)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_masked_attention_isolates_windows_and_inactive(self, rng):
        """Inactive cells stay zero, and a change OUTSIDE a window cannot
        affect unshifted-layer outputs INSIDE it (window locality)."""
        bev = rng.randn(1, 16, 16, 6).astype(np.float32)
        mask = rng.rand(1, 16, 16, 1) > 0.5
        bev = bev * mask
        mod = DSVTBackbone(num_blocks=1, features=32, num_heads=4, ffn=32,
                           window_size=8)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(bev), jnp.asarray(mask),
                     False)
        y = np.asarray(mod.apply(v, jnp.asarray(bev), jnp.asarray(mask), False))
        assert np.abs(y[~np.broadcast_to(mask, y.shape)]).max() == 0
        # garbage at inactive sites cannot leak through the attention mask
        bev2 = bev + 100.0 * (~mask) * rng.randn(*bev.shape)
        y2 = np.asarray(mod.apply(v, jnp.asarray(bev2), jnp.asarray(mask), False))
        np.testing.assert_allclose(y, y2, atol=1e-3)

    def test_rejects_nonmultiple_grid(self, rng):
        mod = DSVTBackbone(window_size=8)
        with pytest.raises(ValueError, match="multiple of window"):
            mod.init(jax.random.PRNGKey(0), jnp.ones((1, 12, 12, 4)),
                     jnp.ones((1, 12, 12, 1), bool), False)

    def test_empty_scene_is_finite(self):
        mod = DSVTBackbone(num_blocks=1, features=16, num_heads=2, ffn=16,
                           window_size=8)
        bev = jnp.zeros((1, 8, 8, 4))
        mask = jnp.zeros((1, 8, 8, 1), bool)
        v = mod.init(jax.random.PRNGKey(0), bev, mask, False)
        y = mod.apply(v, bev, mask, False)
        assert np.all(np.isfinite(np.asarray(y))) and float(jnp.abs(y).sum()) == 0


class TestDSVTModel:
    def test_forward_train_eval(self, rng):
        import optax

        from hgsfusion_tpu.models.detector import DSVTModel, HGSFusionConfig
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_center_eval_step,
            make_center_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
            voxel_size=(0.5, 0.5, 0.5), center_max_k=16,
            center_feature_map_stride=2,
        )
        model = DSVTModel(cfg=cfg)
        pts = np.zeros((1, 128, 5), np.float32)
        pts[0, :, 0] = rng.uniform(0.5, 15, 128)
        pts[0, :, 1] = rng.uniform(-7, 7, 128)
        pts[0, :, 2] = rng.uniform(-2, 1, 128)
        pts[0, :, 3:] = rng.randn(128, 2)
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        batch = {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((1, 128), bool),
            "gt_boxes": jnp.asarray(gt),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        assert preds["hm"].shape == (1, 16, 16, 3)

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
