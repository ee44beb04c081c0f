import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.models.detector import HGSFusionModel
from hgsfusion_tpu.train.optim import (
    build_optimizer,
    onecycle_lr_schedule,
    onecycle_mom_schedule,
)
from hgsfusion_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    detections_to_pred_dicts,
)
from test_model import ANCHOR_CFG, TINY, make_tiny_batch

OPTIM_CFG = ConfigDict(
    {
        "OPTIMIZER": "adam_onecycle",
        "LR": 0.003,
        "WEIGHT_DECAY": 0.01,
        "MOMS": [0.95, 0.85],
        "PCT_START": 0.4,
        "DIV_FACTOR": 10,
        "GRAD_NORM_CLIP": 10,
    }
)

LOSS_WEIGHTS = {
    "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
    "code_weights": [1.0] * 7,
}


class TestSchedules:
    def test_onecycle_lr_endpoints(self):
        sched = onecycle_lr_schedule(1000, lr_max=1e-3, div_factor=10, pct_start=0.4)
        np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(400)), 1e-3, rtol=1e-3)
        np.testing.assert_allclose(float(sched(1000)), 1e-4 / 1e4, rtol=1e-2)
        # monotone up then down
        assert float(sched(200)) > float(sched(0))
        assert float(sched(700)) < float(sched(400))

    def test_onecycle_mom_endpoints(self):
        sched = onecycle_mom_schedule(1000, [0.95, 0.85], 0.4)
        np.testing.assert_allclose(float(sched(0)), 0.95, rtol=1e-5)
        np.testing.assert_allclose(float(sched(400)), 0.85, rtol=1e-4)
        np.testing.assert_allclose(float(sched(1000)), 0.95, rtol=1e-4)


class TestTrainLoop:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.RandomState(0)
        batch = make_tiny_batch(rng)
        model = HGSFusionModel(cfg=TINY)
        assigner = TargetAssigner(
            ANCHOR_CFG, TINY.grid_size, TINY.pc_range, class_names=TINY.class_names
        )
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), {
            k: batch[k] for k in batch}, False))()
        tx, _ = build_optimizer(OPTIM_CFG, total_steps=20, params=variables["params"])
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
        )
        step_fn = jax.jit(make_train_step(model, assigner, tx, LOSS_WEIGHTS, TINY))
        return model, assigner, state, step_fn, batch

    def test_loss_decreases_and_backbone_frozen(self, setup):
        model, assigner, state, step_fn, batch = setup
        frozen_before = jax.tree_util.tree_leaves(
            state.params["ddn_backbone"]
        )[0].copy()
        losses = []
        for _ in range(5):
            state, tb = step_fn(state, batch)
            losses.append(float(tb["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # overfits the fixed batch
        frozen_after = jax.tree_util.tree_leaves(state.params["ddn_backbone"])[0]
        np.testing.assert_array_equal(np.asarray(frozen_before),
                                      np.asarray(frozen_after))
        # trainable params did move
        head_before = None
        assert int(state.step) == 5

    def test_eval_step(self, setup):
        model, assigner, state, _, batch = setup
        post_cfg = {
            "SCORE_THRESH": 0.0,
            "NMS_CONFIG": {
                "NMS_THRESH": 0.3, "NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 16,
            },
        }
        eval_step = jax.jit(make_eval_step(model, assigner, TINY, post_cfg))
        out = eval_step(state.params, state.batch_stats, batch)
        pred_dicts = detections_to_pred_dicts(out, batch)
        assert len(pred_dicts) == 1
        assert pred_dicts[0]["pred_boxes"].shape[1] == 7


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from hgsfusion_tpu.train.checkpoint import CheckpointManager

        state = {
            "params": {"w": jnp.arange(4.0)},
            "step": jnp.asarray(7),
        }
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(7, state, wait=True)
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored, step = CheckpointManager(tmp_path / "ckpt").restore(template)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(4.0))

    def test_restore_empty_dir(self, tmp_path):
        from hgsfusion_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path / "none")
        restored, step = mgr.restore({"a": jnp.zeros(2)})
        assert restored is None and step is None


def test_checkpoint_save_same_step_twice(tmp_path):
    """The end-of-training flush routinely lands on the step the
    epoch-boundary save just wrote; orbax raises StepAlreadyExistsError
    unless the manager makes the save idempotent."""
    import numpy as np

    from hgsfusion_tpu.train.checkpoint import CheckpointManager

    m = CheckpointManager(tmp_path / "ck")
    state = {"a": np.zeros(3), "b": np.ones((2, 2))}
    m.save(5, state, wait=True)
    m.save(5, state, wait=True)  # must be a no-op, not a crash
    assert m.latest_step() == 5
    restored, step = m.restore(state)
    assert step == 5
    np.testing.assert_array_equal(restored["b"], state["b"])
