"""New two-stage zoo families: VoxelRCNN, SECOND-IoU, PointRCNN, PartA2,
PV-RCNN++ — forward contract, train step finiteness, eval step shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.models.detector import (
    HGSFusionConfig,
    PartA2Model,
    PointRCNNModel,
    PVRCNNPlusPlusModel,
    SECONDIoUModel,
    VoxelRCNNModel,
)
from hgsfusion_tpu.train.trainer import (
    TrainState,
    make_pvrcnn_eval_step,
    make_secondiou_eval_step,
    make_twostage_train_step,
)

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 2.0)
VOXEL = (0.5, 0.5, 0.125)


def _cfg(**kw):
    return HGSFusionConfig(
        pc_range=PC_RANGE, voxel_size=VOXEL, num_anchors_per_location=6,
        pv_num_rois=8, point_npoints=(32, 16, 8, 4), roi_point_sample=32,
        parta2_pool_size=4, **kw,
    )


def _assigner(cfg):
    anchor_cfgs = [
        dict(class_name=c, anchor_sizes=[[3.9, 1.6, 1.56]],
             anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
             matched_threshold=0.5, unmatched_threshold=0.35,
             feature_map_stride=8)
        for c in cfg.class_names
    ]
    return TargetAssigner(
        anchor_cfgs, cfg.grid_size, cfg.pc_range, class_names=cfg.class_names
    )


def _batch(rng, n=128):
    pts = np.zeros((1, n, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0.5, 15, n)
    pts[0, :, 1] = rng.uniform(-7, 7, n)
    pts[0, :, 2] = rng.uniform(-2, 1, n)
    pts[0, :, 3] = rng.randn(n)
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0] = [4, -2, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [10, 3, -0.8, 0.8, 0.6, 1.73, -0.5, 2]
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((1, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }


LW = {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
      "code_weights": [1.0] * 7}


def _run_family(rng, model_cls, family, extra_tb_keys, with_anchors=True,
                extra_cfg=None):
    cfg = _cfg(**(extra_cfg or {}))
    assigner = _assigner(cfg) if with_anchors else None
    model = model_cls(cfg=cfg)
    batch = _batch(rng)
    inputs = dict(batch)
    if with_anchors:
        inputs["anchors"] = assigner.flat_anchors
    variables = model.init(jax.random.PRNGKey(0), inputs, False)
    preds = model.apply(variables, inputs, False)
    assert preds["rois"].shape == (1, 8, 7)

    tx = optax.adam(1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_twostage_train_step(
        model, assigner, tx, LW, cfg, family=family
    ))
    state2, tb = step(state, batch)
    assert np.isfinite(float(tb["loss"])) and float(tb["loss"]) > 0
    for k in extra_tb_keys:
        assert np.isfinite(float(tb[k])), k

    post = {"SCORE_THRESH": 0.0,
            "NMS_CONFIG": {"NMS_THRESH": 0.1, "NMS_POST_MAXSIZE": 8}}
    maker = (
        make_secondiou_eval_step if family == "secondiou"
        else make_pvrcnn_eval_step
    )
    ev = jax.jit(maker(model, assigner, cfg, post))
    out = ev(state2.params, state2.batch_stats, batch)
    assert out["boxes"].shape == (1, 8, 7)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    assert out["scores"].shape == (1, 8)
    return preds, tb


class TestVoxelRCNN:
    def test_end_to_end(self, rng):
        preds, tb = _run_family(
            rng, VoxelRCNNModel, "voxelrcnn", ("rcnn_cls", "rcnn_reg")
        )
        assert preds["rcnn_cls"].shape == (1, 8)
        assert preds["rcnn_reg"].shape == (1, 8, 7)


class TestSECONDIoU:
    def test_end_to_end(self, rng):
        preds, tb = _run_family(
            rng, SECONDIoUModel, "secondiou", ("rcnn_iou",)
        )
        assert preds["iou_preds"].shape == (1, 8)

    def test_rectified_scores(self):
        from hgsfusion_tpu.models.roi_heads import rectified_scores

        cls = jnp.asarray([0.9, 0.1])
        iou = jnp.asarray([0.2, 0.8])
        np.testing.assert_allclose(
            np.asarray(rectified_scores(cls, iou, "iou")), [0.2, 0.8]
        )
        w = rectified_scores(cls, iou, "weighted_iou_cls", iou_weight=0.5)
        np.testing.assert_allclose(np.asarray(w), [0.55, 0.45])

    def test_rotated_grid_pool_axis_aligned(self, rng):
        """Axis-aligned box: grid corners land on the box edge pixels
        (align_corners endpoints; second_head.py affine semantics)."""
        from hgsfusion_tpu.models.roi_heads import rotated_bev_grid_pool

        h = w = 16
        feat = np.zeros((1, h, w, 1), np.float32)
        feat[0, :, :, 0] = np.arange(w)[None, :]  # feature = x pixel index
        # box centered at metric x=4 -> pixel 8 (cell 0.5m, ds=1), width 4m
        # -> 8 px, half 4 -> edges at px 4 and 12
        rois = np.array([[[4.0, 0.0, 0.0, 4.0, 4.0, 1.0, 0.0]]], np.float32)
        out = rotated_bev_grid_pool(
            jnp.asarray(feat), jnp.asarray(rois),
            (0.0, -4.0, -1.0, 8.0, 4.0, 1.0), (0.5, 0.5, 0.25),
            down_ratio=1, grid_size=3,
        )
        vals = np.asarray(out)[0, 0, :, 0].reshape(3, 3)
        np.testing.assert_allclose(vals[:, 0], 4.0, atol=1e-5)
        np.testing.assert_allclose(vals[:, 1], 8.0, atol=1e-5)
        np.testing.assert_allclose(vals[:, 2], 12.0, atol=1e-5)


class TestPointRCNN:
    def test_end_to_end(self, rng):
        preds, tb = _run_family(
            rng, PointRCNNModel, "pointrcnn",
            ("point_cls", "point_box", "rcnn_cls", "rcnn_reg"),
            with_anchors=False,
        )
        assert preds["point_cls_logits"].shape == (1, 128, 3)
        assert preds["point_box_encodings"].shape == (1, 128, 8)

    def test_point_coder_roundtrip(self, rng):
        from hgsfusion_tpu.utils.box_coder import PointResidualCoder

        coder = PointResidualCoder(
            mean_size=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73))
        )
        n = 16
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, :3] = pts + rng.randn(n, 3)
        boxes[:, 3:6] = rng.uniform(0.5, 4, (n, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        cls = rng.randint(1, 3, n)
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(cls))
        dec = np.asarray(coder.decode(enc, jnp.asarray(pts), jnp.asarray(cls)))
        np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
        d = np.abs(dec[:, 6] - boxes[:, 6]) % (2 * np.pi)
        assert np.all(np.minimum(d, 2 * np.pi - d) < 1e-4)

    def test_point_targets_fg_and_ignore(self):
        from hgsfusion_tpu.models.point_rcnn import point_targets

        pts = jnp.asarray(
            [[[0.0, 0.0, 0.0],     # inside box -> fg cls 2
              [2.05, 0.0, 0.0],    # just outside, within extra width -> -1
              [9.0, 9.0, 9.0]]]    # far -> bg
        )
        gts = jnp.asarray([[[0, 0, 0, 4.0, 4.0, 4.0, 0.0, 2]]], jnp.float32)
        t = point_targets(pts, jnp.ones((1, 3), bool), gts,
                          extra_width=(0.2, 0.2, 0.2))
        assert int(t["cls"][0, 0]) == 2
        assert int(t["cls"][0, 1]) == -1
        assert int(t["cls"][0, 2]) == 0


class TestPartA2:
    def test_end_to_end(self, rng):
        preds, tb = _run_family(
            rng, PartA2Model, "parta2",
            ("part_cls", "part_reg", "rcnn_cls", "rcnn_reg"),
        )
        assert preds["seg_logits"].shape == (1, 128, 3)
        assert preds["part_pred"].shape == (1, 128, 3)

    def test_part_targets_canonical(self):
        from hgsfusion_tpu.models.parta2 import part_targets

        # point at the box's +x face center -> part (1, 0.5, 0.5)
        pts = jnp.asarray([[[1.99, 0.0, 0.0]]])
        gts = jnp.asarray([[[0, 0, 0, 4.0, 2.0, 2.0, 0.0, 1]]], jnp.float32)
        t = part_targets(pts, jnp.ones((1, 1), bool), gts)
        np.testing.assert_allclose(
            np.asarray(t["part"][0, 0]), [0.9975, 0.5, 0.5], atol=1e-4
        )
        assert bool(t["fg"][0, 0])


class TestPVRCNNPlusPlus:
    def test_end_to_end(self, rng):
        preds, tb = _run_family(
            rng, PVRCNNPlusPlusModel, "pvrcnnpp",
            ("point_fg", "rcnn_cls", "rcnn_reg"),
            extra_cfg={"pv_num_keypoints": 32},
        )
        assert preds["keypoints"].shape == (1, 32, 3)

    def test_proposal_centric_sampling(self, rng):
        from hgsfusion_tpu.models.pvrcnn import (
            sample_keypoints_proposal_centric,
        )

        xyz = np.zeros((64, 3), np.float32)
        xyz[:32, 0] = rng.uniform(0, 2, 32)      # near the roi at origin
        xyz[32:, 0] = rng.uniform(50, 60, 32)    # far away
        rois = np.zeros((2, 7), np.float32)
        rois[0, 3:6] = [4, 2, 1.5]
        kp = np.asarray(sample_keypoints_proposal_centric(
            jnp.asarray(xyz), jnp.ones(64, bool), jnp.asarray(rois),
            jnp.asarray([True, False]), 16,
        ))
        assert kp.shape == (16, 3)
        assert np.all(kp[:, 0] < 10)  # only proposal-near points sampled

    def test_vectorpool_empty_center_zeroed(self, rng):
        from hgsfusion_tpu.models.pvrcnn import VectorPoolLocal

        mod = VectorPoolLocal(radius=1.0, nsample=8, grid_n=2,
                              out_channels=8)
        xyz = jnp.asarray(rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))
        new_xyz = jnp.asarray([[[0.0, 0.0, 0.0], [50.0, 50.0, 50.0]]])
        v = mod.init(jax.random.PRNGKey(0), new_xyz, xyz, feats,
                     jnp.ones((1, 32), bool), True)
        out = mod.apply(v, new_xyz, xyz, feats, jnp.ones((1, 32), bool),
                        False, mutable=False)
        assert out.shape == (1, 2, 8)
        assert np.all(np.isfinite(np.asarray(out)))


def test_add_init_anchors_covers_all_twostage_families():
    """tools/{test,export,demo,dump_activations}.py crash at model.init
    with KeyError 'anchors' for any anchor-RPN two-stage family unless the
    shared helper injects the flat anchor grid (round-2 review: only
    PVRCNN was special-cased in test.py, none elsewhere)."""
    from hgsfusion_tpu.config import load_config, model_config_from_yaml
    from hgsfusion_tpu.train.trainer import (
        ANCHOR_INPUT_MODELS, add_init_anchors,
    )

    for cfg_name, expect in [
        ("configs/voxelrcnn_vod.yaml", True),
        ("configs/second_iou_vod.yaml", True),
        ("configs/pvrcnn_vod.yaml", True),
        ("configs/parta2_vod.yaml", True),
        ("configs/hgsfusion_vod.yaml", False),
        ("configs/pointrcnn_vod.yaml", False),
    ]:
        cfg = load_config(cfg_name)
        mc = model_config_from_yaml(cfg)
        out = add_init_anchors({}, cfg, mc)
        assert ("anchors" in out) == expect, cfg_name
        if expect:
            assert cfg.MODEL.NAME in ANCHOR_INPUT_MODELS
            assert out["anchors"].ndim == 2
