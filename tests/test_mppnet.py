"""MPPNet family: trajectory generation, geometry features, full head."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from hgsfusion_tpu.models.detector import HGSFusionConfig, MPPNetModel
from hgsfusion_tpu.models.mppnet import (
    box_corners_and_center,
    generate_trajectory,
    proposal_aware_features,
)
from hgsfusion_tpu.train.trainer import (
    TrainState,
    make_pvrcnn_eval_step,
    make_twostage_train_step,
)


class TestTrajectory:
    def test_velocity_propagation_and_matching(self):
        # one current roi moving +x at 10 m/s; frame_dt 0.1 -> -1 m per frame
        cur = np.zeros((1, 9), np.float32)
        cur[0, :7] = [10, 0, 0, 4, 2, 1.5, 0.0]
        cur[0, 7] = 10.0  # vx
        props = np.zeros((3, 4, 9), np.float32)
        props[0, 0, :7] = cur[0, :7]
        # frame 1: proposal near the propagated center (9, 0)
        props[1, 0, :7] = [9.1, 0.2, 0, 4, 2, 1.5, 0.1]
        # frame 2: nothing near (8, 0) -> falls back to propagated box
        traj, matched = generate_trajectory(
            jnp.asarray(cur), jnp.asarray(props)
        )
        assert traj.shape == (3, 1, 7)
        np.testing.assert_allclose(np.asarray(traj[0, 0, :2]), [10, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj[1, 0, :2]), [9.1, 0.2], atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj[2, 0, :2]), [8.0, 0.0], atol=1e-5)
        assert bool(matched[1, 0]) and not bool(matched[2, 0])

    def test_corners(self):
        box = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]])
        pts = np.asarray(box_corners_and_center(box))[0]
        assert pts.shape == (9, 3)
        np.testing.assert_allclose(pts[-1], [0, 0, 0], atol=1e-6)
        assert np.all(np.abs(pts[:8, 0]) == 1.0)
        assert np.all(np.abs(pts[:8, 1]) == 2.0)
        assert np.all(np.abs(pts[:8, 2]) == 3.0)

    def test_geometry_features_shape(self, rng):
        pts = jnp.asarray(rng.randn(2, 8, 3).astype(np.float32))
        boxes = jnp.asarray(
            np.tile([0, 0, 0, 2, 2, 2, 0.3], (2, 1)).astype(np.float32)
        )
        f = proposal_aware_features(pts, boxes)
        assert f.shape == (2, 8, 30)
        assert np.all(np.isfinite(np.asarray(f)))


class TestMPPNetModel:
    def test_train_eval(self, rng):
        cfg = HGSFusionConfig(pv_num_rois=4)
        model = MPPNetModel(cfg=cfg)
        b, t, n, p = 1, 4, 64, 6
        pts = np.zeros((b, t, n, 4), np.float32)
        pts[..., 0] = rng.uniform(0, 16, (b, t, n))
        pts[..., 1] = rng.uniform(-8, 8, (b, t, n))
        pts[..., 2] = rng.uniform(-2, 1, (b, t, n))
        props = np.zeros((b, t, p, 9), np.float32)
        props[..., 3:6] = [3.9, 1.6, 1.56]
        props[..., 0] = rng.uniform(2, 14, (b, t, p))
        gt = np.zeros((b, 2, 8), np.float32)
        gt[0, 0] = [*props[0, 0, 0, :7], 1]
        batch = {
            "points_multi": jnp.asarray(pts),
            "points_multi_valid": jnp.ones((b, t, n), bool),
            "roi_boxes": jnp.asarray(props),
            "roi_scores": jnp.asarray(rng.uniform(0, 1, (b, t, p)).astype(np.float32)),
            "roi_labels": jnp.ones((b, t, p), jnp.int32),
            "gt_boxes": jnp.asarray(gt),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        assert preds["rois"].shape == (b, 4, 7)
        assert preds["trajectory"].shape == (b, t, 4, 7)
        assert preds["rcnn_cls"].shape == (b, 4)
        assert preds["rcnn_reg"].shape == (b, 4, 7)

        tx = optax.adam(1e-3)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_twostage_train_step(
            model, None, tx, {}, cfg, family="mppnet"
        ))
        state2, tb = step(state, batch)
        assert np.isfinite(float(tb["loss"]))
        for k in ("rcnn_cls", "rcnn_reg"):
            assert np.isfinite(float(tb[k])), k

        ev = jax.jit(make_pvrcnn_eval_step(
            model, None, cfg,
            {"SCORE_THRESH": 0.0,
             "NMS_CONFIG": {"NMS_THRESH": 0.1, "NMS_POST_MAXSIZE": 4}},
        ))
        out = ev(state2.params, state2.batch_stats, batch)
        assert out["boxes"].shape == (b, 4, 7)
        assert np.all(np.isfinite(np.asarray(out["boxes"])))


class TestMPPNetStreaming:
    def test_stream_equals_fixed_window(self, rng):
        """After T pushes, a streaming step must produce exactly the
        fixed-window forward on the same (newest-first) window — the
        reference e2e mode's amortization changes bookkeeping, not math."""
        from hgsfusion_tpu.models.mppnet import (
            mppnet_stream_init, mppnet_stream_step,
        )

        cfg = HGSFusionConfig(pv_num_rois=4)
        model = MPPNetModel(cfg=cfg)
        t, n, p = 4, 64, 6
        # 2*t frames of a synthetic sequence
        frames = []
        for _ in range(2 * t):
            pts = np.zeros((n, 4), np.float32)
            pts[:, 0] = rng.uniform(0, 16, n)
            pts[:, 1] = rng.uniform(-8, 8, n)
            pts[:, 2] = rng.uniform(-2, 1, n)
            props = np.zeros((p, 9), np.float32)
            props[:, 3:6] = [3.9, 1.6, 1.56]
            props[:, 0] = rng.uniform(2, 14, p)
            frames.append((jnp.asarray(pts), jnp.asarray(props)))

        init_batch = {
            "points_multi": jnp.zeros((1, t, n, 4), jnp.float32),
            "points_multi_valid": jnp.ones((1, t, n), bool),
            "roi_boxes": jnp.asarray(
                np.tile(np.asarray(frames[0][1])[None, None], (1, t, 1, 1))),
            "roi_scores": jnp.zeros((1, t, p), jnp.float32),
            "roi_labels": jnp.ones((1, t, p), jnp.int32),
        }
        variables = model.init(jax.random.PRNGKey(0), init_batch, False)

        state = mppnet_stream_init(t, p, n, 4)
        scores = jnp.full((p,), 0.5, jnp.float32)
        labels = jnp.ones((p,), jnp.int32)
        for pts, props in frames:
            state, out = mppnet_stream_step(
                model, variables, state, props, scores, labels,
                pts, jnp.ones((n,), bool))

        # bank slot 0 = newest frame; fixed window = frames reversed
        window = frames[-t:][::-1]
        batch = {
            "points_multi": jnp.stack([f[0] for f in window])[None],
            "points_multi_valid": jnp.ones((1, t, n), bool),
            "roi_boxes": jnp.stack([f[1] for f in window])[None],
            "roi_scores": jnp.tile(scores[None], (t, 1))[None],
            "roi_labels": jnp.tile(labels[None], (t, 1))[None],
        }
        want = model.apply(variables, batch, False)
        np.testing.assert_allclose(
            np.asarray(out["rcnn_cls"]), np.asarray(want["rcnn_cls"]),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["rcnn_reg"]), np.asarray(want["rcnn_reg"]),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["trajectory"]), np.asarray(want["trajectory"]),
            atol=1e-6)

    def test_warmup_masks_unseen_frames(self, rng):
        """One push into a fresh bank: unseen slots' points are masked so
        the first step equals a window where only frame 0 has points."""
        from hgsfusion_tpu.models.mppnet import (
            mppnet_stream_init, mppnet_stream_step,
        )

        cfg = HGSFusionConfig(pv_num_rois=4)
        model = MPPNetModel(cfg=cfg)
        t, n, p = 4, 64, 6
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 16, n)
        pts[:, 1] = rng.uniform(-8, 8, n)
        props = np.zeros((p, 9), np.float32)
        props[:, 3:6] = [3.9, 1.6, 1.56]
        props[:, 0] = rng.uniform(2, 14, p)
        init_batch = {
            "points_multi": jnp.zeros((1, t, n, 4), jnp.float32),
            "points_multi_valid": jnp.ones((1, t, n), bool),
            "roi_boxes": jnp.tile(jnp.asarray(props)[None, None],
                                  (1, t, 1, 1)),
            "roi_scores": jnp.zeros((1, t, p), jnp.float32),
            "roi_labels": jnp.ones((1, t, p), jnp.int32),
        }
        variables = model.init(jax.random.PRNGKey(0), init_batch, False)
        state = mppnet_stream_init(t, p, n, 4)
        state, out = mppnet_stream_step(
            model, variables, state, jnp.asarray(props),
            jnp.full((p,), 0.5), jnp.ones((p,), jnp.int32),
            jnp.asarray(pts), jnp.ones((n,), bool))
        assert int(state.frames_seen) == 1
        assert np.all(np.isfinite(np.asarray(out["rcnn_cls"])))


class TestEvalDispatch:
    def test_make_eval_step_for_cfg_routes_mppnet(self):
        """tools/test.py's factory must serve MPPNet (no DENSE_HEAD in its
        config) instead of raising on the DENSE_HEAD lookup."""
        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.train.trainer import make_eval_step_for_cfg

        cfg = HGSFusionConfig(pv_num_rois=4)
        model = MPPNetModel(cfg=cfg)
        yaml_cfg = ConfigDict({
            "MODEL": {
                "NAME": "MPPNet",
                "POST_PROCESSING": {
                    "SCORE_THRESH": 0.0,
                    "NMS_CONFIG": {"NMS_THRESH": 0.1, "NMS_POST_MAXSIZE": 4},
                },
            },
        })
        ev = make_eval_step_for_cfg(yaml_cfg, cfg, model)

        rng = np.random.RandomState(0)
        b, t, n, p = 1, 4, 64, 6
        pts = np.zeros((b, t, n, 4), np.float32)
        pts[..., 0] = rng.uniform(0, 16, (b, t, n))
        pts[..., 1] = rng.uniform(-8, 8, (b, t, n))
        props = np.zeros((b, t, p, 9), np.float32)
        props[..., 3:6] = [3.9, 1.6, 1.56]
        props[..., 0] = rng.uniform(2, 14, (b, t, p))
        batch = {
            "points_multi": jnp.asarray(pts),
            "points_multi_valid": jnp.ones((b, t, n), bool),
            "roi_boxes": jnp.asarray(props),
            "roi_scores": jnp.asarray(
                rng.uniform(0, 1, (b, t, p)).astype(np.float32)),
            "roi_labels": jnp.ones((b, t, p), jnp.int32),
        }
        variables = MPPNetModel(cfg=cfg).init(
            jax.random.PRNGKey(0), batch, False)
        out = ev(variables["params"], variables.get("batch_stats", {}), batch)
        assert out["boxes"].shape == (b, 4, 7)
        assert np.all(np.isfinite(np.asarray(out["boxes"])))

    def test_make_eval_step_for_cfg_unknown_model_raises(self):
        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.train.trainer import make_eval_step_for_cfg
        import pytest

        yaml_cfg = ConfigDict(
            {"MODEL": {"NAME": "Mystery", "POST_PROCESSING": {}}})
        with pytest.raises(NotImplementedError, match="Mystery"):
            make_eval_step_for_cfg(yaml_cfg, None, None)
