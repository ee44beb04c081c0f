"""AnchorHeadMulti family: grouped multihead detector, train/eval steps.

Numerical parity against the reference anchor_head_multi.py lives in
test_reference_parity.py::TestAnchorHeadMultiParity; this file covers the
framework plumbing (config -> registry -> model -> trainer/eval)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.config import load_config, model_config_from_yaml
from hgsfusion_tpu.models.registry import build_network


@pytest.fixture(scope="module")
def small_cfg():
    cfg = load_config("configs/pp_multihead_nuscenes.yaml")
    # shrink the grid for CPU (512x512 -> 80x80 pillars, 40x40 head map)
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
    return cfg, model_config_from_yaml(cfg)


def _batch(rng, b=2, n=256):
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., 0] = rng.uniform(-7, 7, (b, n))
    pts[..., 1] = rng.uniform(-7, 7, (b, n))
    pts[..., 2] = rng.uniform(-4, 2, (b, n))
    pts[..., 3:] = rng.randn(b, n, 2)
    gt = np.zeros((b, 4, 10), np.float32)
    gt[:, 0] = [2.0, 1.0, -0.9, 4.6, 2.0, 1.7, 0.3, 0.5, 0.1, 1]   # car
    gt[:, 1] = [-2.0, 3.0, -0.9, 0.7, 0.7, 1.8, 0.0, 0.0, 0.0, 9]  # ped
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }


class TestMultiHeadFamily:
    def test_build_and_forward_shapes(self, small_cfg, rng):
        cfg, mc = small_cfg
        assert mc.rpn_head_cfgs is not None and len(mc.rpn_head_cfgs) == 6
        model = build_network(cfg, mc)
        assert type(model).__name__ == "PointPillarMultiHeadModel"
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        # 40x40 head map (grid 80 / stride 2); per-head anchor counts
        # = 1600 * 2 anchors * classes-in-head
        assert len(preds["cls_preds"]) == 6
        for hi, ncls in enumerate([1, 2, 2, 1, 2, 2]):
            assert preds["cls_preds"][hi].shape == (2, 3200 * ncls, ncls)
            assert preds["box_preds"][hi].shape == (2, 3200 * ncls, 10)

    def test_train_step_runs_and_improves(self, small_cfg, rng):
        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.train.optim import build_optimizer
        from hgsfusion_tpu.train.trainer import (
            TrainState, make_anchor_assigner, make_multihead_train_step,
        )

        cfg, mc = small_cfg
        model = build_network(cfg, mc)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        assigner = make_anchor_assigner(cfg, mc)
        assert assigner.use_multihead
        assert assigner.box_coder.code_size == 10  # 9 + sincos
        assert assigner.flat_anchors.shape == (40 * 40 * 2 * 10, 10)

        import optax

        # plain SGD isolates the gradient-direction check from the
        # adam_onecycle LR ramp (which raises the loss over the first steps)
        tx = optax.sgd(1e-3)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        lw = dict(cfg.MODEL.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
        step = jax.jit(
            make_multihead_train_step(model, assigner, tx, lw, mc))
        losses = []
        for _ in range(8):
            state, tb = step(state, batch)
            losses.append(float(tb["loss"]))
        assert all(np.isfinite(losses)), losses
        # train-mode BN makes per-step loss noisy; descend on average
        assert np.mean(losses[-4:]) < np.mean(losses[:2]), losses
        assert int(state.step) == 8
        # the onecycle optimizer path also runs and stays finite
        optim_cfg = ConfigDict(dict(cfg.OPTIMIZATION))
        tx2, _ = build_optimizer(
            optim_cfg, total_steps=10, params=variables["params"])
        state2 = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx2.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        step2 = jax.jit(
            make_multihead_train_step(model, assigner, tx2, lw, mc))
        state2, tb2 = step2(state2, batch)
        assert np.isfinite(float(tb2["loss"]))

    def test_eval_step_fixed_shapes(self, small_cfg, rng):
        from hgsfusion_tpu.train.trainer import make_eval_step_for_cfg

        cfg, mc = small_cfg
        model = build_network(cfg, mc)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        eval_step = jax.jit(make_eval_step_for_cfg(cfg, mc, model))
        out = eval_step(variables["params"], variables["batch_stats"], batch)
        post_max = cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE
        # one post_max block per (head, class) pair = 10 classes total
        assert out["boxes"].shape == (2, 10 * post_max, 7)
        assert out["vels"].shape == (2, 10 * post_max, 2)
        assert out["labels"].shape == out["scores"].shape == out[
            "valid"].shape == (2, 10 * post_max)
        # labels cover the global 1..10 id space in block order
        labels = np.asarray(out["labels"]).reshape(2, 10, post_max)
        np.testing.assert_array_equal(
            labels[0, :, 0], np.arange(1, 11))

    def test_no_sin_difference_without_dir_head(self, small_cfg, rng,
                                                monkeypatch):
        """The reference applies add_sin_difference only when a dir head
        exists (anchor_head_multi.py:341-346). The shipped nuScenes config
        has no USE_DIRECTION_CLASSIFIER, and its sincos box coder makes
        column 6 a cos-angle residual — sin/cos-transforming it would
        silently optimize a wrong objective."""
        import optax

        import hgsfusion_tpu.models.anchor_head as AH
        from hgsfusion_tpu.train.trainer import (
            TrainState, make_anchor_assigner, make_multihead_train_step,
        )

        cfg, mc = small_cfg
        assert mc.mh_use_dir is False  # absent key -> no dir path
        assert mc.box_coder_sincos

        def boom(*a, **k):
            raise AssertionError("sin-difference applied without dir head")

        monkeypatch.setattr(AH, "add_sin_difference", boom)
        model = build_network(cfg, mc)
        batch = _batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        assigner = make_anchor_assigner(cfg, mc)
        tx = optax.sgd(1e-3)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        lw = dict(cfg.MODEL.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
        step = jax.jit(
            make_multihead_train_step(model, assigner, tx, lw, mc))
        _, tb = step(state, batch)  # traces the loss: boom must NOT fire
        assert np.isfinite(float(tb["loss"]))

    def test_use_dir_gates_on_value_not_presence(self, small_cfg):
        """USE_DIRECTION_CLASSIFIER: False must disable dir-pred emission
        (the reference gates emission on the VALUE, anchor_head_multi.py:
        214, even though the conv exists on key presence, :86)."""
        import copy

        from hgsfusion_tpu.config import model_config_from_yaml

        cfg, mc = small_cfg
        cfg2 = copy.deepcopy(cfg)
        cfg2.MODEL.DENSE_HEAD.USE_DIRECTION_CLASSIFIER = False
        assert model_config_from_yaml(cfg2).mh_use_dir is False
        cfg2.MODEL.DENSE_HEAD.USE_DIRECTION_CLASSIFIER = True
        assert model_config_from_yaml(cfg2).mh_use_dir is True
