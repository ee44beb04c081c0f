"""TransFusion family: Hungarian matching, encode/decode, losses, model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.transfusion_head import (
    TransFusionHead,
    decode_transfusion_boxes,
    encode_transfusion_boxes,
    gaussian_focal_loss,
    hungarian_match,
    transfusion_get_boxes,
    transfusion_loss,
)

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
VOXEL = (0.5, 0.5, 0.5)


def _boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(1, 15, n)
    b[:, 1] = rng.uniform(-7, 7, n)
    b[:, 2] = rng.uniform(-2, 1, n)
    b[:, 3:6] = rng.uniform(0.5, 4, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestHungarian:
    def test_matches_scipy_on_valid_columns(self, rng):
        from scipy.optimize import linear_sum_assignment

        P, M = 24, 6
        pred = _boxes(rng, P)
        gts = _boxes(rng, M)
        logits = rng.randn(P, 3).astype(np.float32)
        labels = rng.randint(0, 3, M)
        valid = np.array([True] * 4 + [False] * 2)

        matched, pos, ious = hungarian_match(
            jnp.asarray(pred), jnp.asarray(logits), jnp.asarray(gts),
            jnp.asarray(labels), jnp.asarray(valid), PC_RANGE,
        )
        matched = np.asarray(matched)

        # scipy oracle on the same cost (recompute it the same way)
        from hgsfusion_tpu.ops.rotated_iou import boxes_iou3d

        p = 1 / (1 + np.exp(-logits))
        eps = 1e-12
        neg = -np.log(1 - p + eps) * 0.75 * p**2
        posc = -np.log(p + eps) * 0.25 * (1 - p) ** 2
        cls_cost = (posc[:, labels] - neg[:, labels]) * 0.15
        span = np.array(PC_RANGE[3:5]) - np.array(PC_RANGE[0:2])
        nb = (pred[:, :2] - np.array(PC_RANGE[0:2])) / span
        ng = (gts[:, :2] - np.array(PC_RANGE[0:2])) / span
        reg = np.abs(nb[:, None] - ng[None]).sum(-1) * 0.25
        iou = np.asarray(boxes_iou3d(jnp.asarray(pred), jnp.asarray(gts)))
        cost = cls_cost + reg - iou * 0.25
        rows, cols = linear_sum_assignment(cost[:, :4])  # valid gts only
        want = {r: c for r, c in zip(rows, cols)}

        got = {i: m for i, m in enumerate(matched) if m >= 0}
        assert got == want
        assert int(np.asarray(pos).sum()) == 4

    def test_no_valid_gts(self, rng):
        matched, pos, ious = hungarian_match(
            jnp.asarray(_boxes(rng, 8)), jnp.asarray(rng.randn(8, 3)),
            jnp.asarray(_boxes(rng, 3)), jnp.zeros(3, jnp.int32),
            jnp.zeros(3, bool), PC_RANGE,
        )
        assert not bool(jnp.any(pos))


class TestEncodeDecode:
    def test_roundtrip(self, rng):
        boxes = jnp.asarray(_boxes(rng, 10)[None])
        enc = encode_transfusion_boxes(boxes, PC_RANGE, VOXEL, 2)
        preds = {
            "center": enc[..., 0:2], "height": enc[..., 2:3],
            "dim": enc[..., 3:6],
            "rot": jnp.concatenate([enc[..., 6:7], enc[..., 7:8]], -1),
        }
        dec = decode_transfusion_boxes(preds, PC_RANGE, VOXEL, 2)
        got, want = np.asarray(dec[0]), np.asarray(boxes[0])
        np.testing.assert_allclose(got[:, :6], want[:, :6], atol=1e-4)
        d = np.abs(got[:, 6] - want[:, 6]) % (2 * np.pi)
        assert np.all(np.minimum(d, 2 * np.pi - d) < 1e-4)


class TestLosses:
    def test_gaussian_focal_matches_torch_formula(self, rng):
        torch = pytest.importorskip("torch")
        p = np.clip(rng.rand(2, 8, 8, 3), 1e-3, 1 - 1e-3).astype(np.float32)
        gt = rng.rand(2, 8, 8, 3).astype(np.float32)
        gt[0, 2, 2, 1] = 1.0
        got = float(gaussian_focal_loss(jnp.asarray(p), jnp.asarray(gt)))
        tp, tg = torch.from_numpy(p), torch.from_numpy(gt)
        eps = 1e-12
        posl = -(tp + eps).log() * (1 - tp) ** 2 * tg.eq(1)
        negl = -(1 - tp + eps).log() * tp**2 * (1 - tg) ** 4
        assert abs(got - float((posl + negl).sum())) < 1e-3

    def test_total_loss_finite_and_grad(self, rng):
        P = 16
        preds = {
            "dense_heatmap": jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32)),
            "heatmap": jnp.asarray(rng.randn(1, P, 3).astype(np.float32)),
            "center": jnp.asarray(rng.uniform(0, 16, (1, P, 2)).astype(np.float32)),
            "height": jnp.asarray(rng.randn(1, P, 1).astype(np.float32)),
            "dim": jnp.asarray(rng.randn(1, P, 3).astype(np.float32) * 0.1),
            "rot": jnp.asarray(rng.randn(1, P, 2).astype(np.float32)),
        }
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        gt[0, 1] = [10, 3, -0.2, 0.8, 0.6, 1.73, -1.0, 2]

        def f(hm):
            total, _ = transfusion_loss(
                {**preds, "heatmap": hm}, jnp.asarray(gt), 3, PC_RANGE, VOXEL,
                2, (16, 16),
            )
            return total

        total, tb = transfusion_loss(
            preds, jnp.asarray(gt), 3, PC_RANGE, VOXEL, 2, (16, 16)
        )
        assert np.isfinite(float(total)) and float(total) > 0
        g = jax.grad(f)(preds["heatmap"])
        assert np.all(np.isfinite(np.asarray(g))) and float(jnp.sum(jnp.abs(g))) > 0


class TestModel:
    def test_forward_train_eval(self, rng):
        import optax

        from hgsfusion_tpu.models.detector import HGSFusionConfig, TransFusionModel
        from hgsfusion_tpu.train.trainer import (
            TrainState,
            make_transfusion_eval_step,
            make_transfusion_train_step,
        )

        cfg = HGSFusionConfig(
            pc_range=PC_RANGE, voxel_size=VOXEL, center_max_k=16,
            center_feature_map_stride=2,
        )
        model = TransFusionModel(cfg=cfg)
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
        assert preds["heatmap"].shape == (1, 16, 3)  # 16 proposals
        assert preds["center"].shape == (1, 16, 2)

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
