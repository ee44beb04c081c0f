import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.detector import (
    HGSFusionConfig,
    HGSFusionModel,
    RadarOnlyModel,
    post_process,
)
from hgsfusion_tpu.models.anchors import TargetAssigner, generate_anchors, flatten_anchors
from hgsfusion_tpu.models.anchor_head import anchor_head_loss
from hgsfusion_tpu.models.occupancy import occupancy_loss, rasterize_gt_boxes_bev
from hgsfusion_tpu.utils.box_coder import ResidualCoder

TINY = HGSFusionConfig(
    pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 2.0),
    voxel_size=(0.5, 0.5, 0.5),
    image_size=(64, 96),
    disc_num_bins=16,
    disc_depth_max=16.0,
    image_backbone="ResNet50",
)

ANCHOR_CFG = [
    dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
         align_center=False, feature_map_stride=1,
         matched_threshold=0.6, unmatched_threshold=0.45),
    dict(class_name="Pedestrian", anchor_sizes=[[0.8, 0.6, 1.73]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
         align_center=False, feature_map_stride=1,
         matched_threshold=0.5, unmatched_threshold=0.35),
    dict(class_name="Cyclist", anchor_sizes=[[1.76, 0.6, 1.73]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
         align_center=False, feature_map_stride=1,
         matched_threshold=0.5, unmatched_threshold=0.35),
]


def make_tiny_batch(rng, b=1, n=128):
    pts = np.zeros((b, n, 17), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 1.5, (b, n))
    pts[..., 3:15] = rng.randn(b, n, 12).astype(np.float32)
    pts[..., 15] = (rng.rand(b, n) > 0.5).astype(np.float32)
    pts[..., 16] = 1.0
    images = rng.rand(b, 64, 96, 3).astype(np.float32)
    l2c = np.tile(
        np.array(
            [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3], [0, 0, 0, 1]],
            np.float32,
        ),
        (b, 1, 1),
    )
    c2i = np.tile(
        np.array([[80.0, 0, 48, 0], [0, 80, 32, 0], [0, 0, 1, 0]], np.float32),
        (b, 1, 1),
    )
    gt = np.zeros((b, 8, 8), np.float32)
    gt[:, 0] = [6.0, 1.0, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [10.0, -2.0, -0.5, 0.8, 0.6, 1.73, -0.5, 2]
    return {
        "points": jnp.array(pts),
        "points_valid": jnp.ones((b, n), bool),
        "images": jnp.array(images),
        "trans_lidar_to_cam": jnp.array(l2c),
        "trans_cam_to_img": jnp.array(c2i),
        "lidar_aug_matrix": jnp.tile(jnp.eye(4), (b, 1, 1)),
        "gt_boxes": jnp.array(gt),
    }


@pytest.fixture(scope="module")
def tiny_model_and_vars(rng=np.random.RandomState(0)):
    batch = make_tiny_batch(rng)
    model = HGSFusionModel(cfg=TINY)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, False)
    )()
    return model, variables, batch


class TestFullModel:
    def test_forward_shapes(self, tiny_model_and_vars):
        model, variables, batch = tiny_model_and_vars
        preds, _ = jax.jit(
            lambda v, b: model.apply(v, b, False, mutable=["batch_stats"])
        )(variables, batch)
        nx, ny, nz = TINY.grid_size
        assert nx == 32 and ny == 32 and nz == 10
        assert preds["cls_preds"].shape == (1, ny, nx, 6 * 3)
        assert preds["box_preds"].shape == (1, ny, nx, 6 * 7)
        assert preds["dir_cls_preds"].shape == (1, ny, nx, 6 * 2)
        assert preds["occupancy"].shape == (1, ny, nx, 1)
        for v in preds.values():
            assert np.all(np.isfinite(np.asarray(v)))

    def test_train_losses_and_grads(self, tiny_model_and_vars):
        model, variables, batch = tiny_model_and_vars
        assigner = TargetAssigner(
            ANCHOR_CFG, TINY.grid_size, TINY.pc_range,
            class_names=TINY.class_names,
        )
        loss_weights = {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7,
        }

        def loss_fn(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, True, mutable=["batch_stats"],
            )
            targets = assigner(batch["gt_boxes"])
            rpn, tb = anchor_head_loss(
                preds, targets, assigner.flat_anchors, TINY.num_class, loss_weights
            )
            occ = occupancy_loss(
                preds["occupancy"], batch["gt_boxes"], TINY.grid_size,
                TINY.pc_range, TINY.voxel_size,
            )
            return rpn + occ, tb

        (loss, tb), grads = jax.jit(
            lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
        )(variables["params"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # the head must receive gradient
        g_head = grads["dense_head"]["conv_cls"]["kernel"]
        assert float(jnp.abs(g_head).max()) > 0

    def test_post_process_fixed_shapes(self, tiny_model_and_vars):
        model, variables, batch = tiny_model_and_vars
        preds, _ = model.apply(variables, batch, False, mutable=["batch_stats"])
        assigner = TargetAssigner(
            ANCHOR_CFG, TINY.grid_size, TINY.pc_range, class_names=TINY.class_names
        )
        out = jax.jit(
            lambda p: post_process(
                p, assigner.flat_anchors, ResidualCoder(), TINY,
                score_thresh=0.0, nms_thresh=0.3, pre_max_size=256,
                post_max_size=32,
            )
        )(preds)
        assert out["boxes"].shape == (1, 32, 7)
        assert out["scores"].shape == (1, 32)
        assert out["labels"].shape == (1, 32)
        assert out["valid"].shape == (1, 32)


class TestRadarOnly:
    def test_forward(self, rng):
        batch = make_tiny_batch(rng)
        model = RadarOnlyModel(cfg=TINY)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds, _ = model.apply(variables, batch, False, mutable=["batch_stats"])
        assert preds["cls_preds"].shape == (1, 32, 32, 18)


class TestTargetAssigner:
    def test_exact_anchor_match(self):
        """A gt equal to an anchor must label that anchor fg with zero
        residuals; distant anchors are background."""
        assigner = TargetAssigner(
            ANCHOR_CFG, TINY.grid_size, TINY.pc_range, class_names=TINY.class_names
        )
        anchors = np.asarray(assigner.flat_anchors)
        # pick the Car rot-0 anchor at some location
        idx = np.flatnonzero(
            (np.abs(anchors[:, 3] - 3.9) < 1e-4) & (np.abs(anchors[:, 6]) < 1e-4)
        )[200]
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0, :7] = anchors[idx]
        gt[0, 0, 7] = 1  # Car
        targets = jax.jit(assigner)(jnp.array(gt))
        labels = np.asarray(targets["box_cls_labels"])[0]
        assert labels[idx] == 1
        np.testing.assert_allclose(
            np.asarray(targets["box_reg_targets"])[0, idx], 0.0, atol=1e-5
        )
        assert (labels == 1).sum() >= 1
        assert (labels == 0).sum() > labels.size * 0.9  # mostly background

    def test_no_gt_all_background(self):
        assigner = TargetAssigner(
            ANCHOR_CFG, TINY.grid_size, TINY.pc_range, class_names=TINY.class_names
        )
        gt = np.zeros((1, 4, 8), np.float32)
        targets = assigner(jnp.array(gt))
        labels = np.asarray(targets["box_cls_labels"])[0]
        assert np.all(labels == 0)

    def test_anchor_count_matches_reference_formula(self):
        all_anchors, num_per_loc = generate_anchors(
            ANCHOR_CFG, (320, 320, 31), (0, -25.6, -3, 51.2, 25.6, 2)
        )
        flat = flatten_anchors(all_anchors)
        assert flat.shape == (320 * 320 * 6, 7)  # 614,400 (SURVEY.md App. A)
        assert sum(num_per_loc) == 6
        # anchor x coverage spans the full range inclusive
        assert np.isclose(flat[:, 0].min(), 0.0) and np.isclose(flat[:, 0].max(), 51.2)


class TestOccupancyRaster:
    def test_box_rasterized(self):
        gt = np.zeros((1, 2, 8), np.float32)
        gt[0, 0] = [8.0, 0.0, -0.5, 4.0, 2.0, 1.5, 0.0, 1]
        target = np.asarray(
            rasterize_gt_boxes_bev(
                jnp.array(gt), TINY.grid_size, TINY.pc_range, TINY.voxel_size
            )
        )
        assert target.shape == (1, 32, 32)
        # center voxel: ix = 8/0.5 = 16, iy = (0+8)/0.5 = 16
        assert target[0, 16, 16] == 1.0
        # approximately dims/voxel cells set
        assert 10 < target[0].sum() < 80
        # far corner empty
        assert target[0, 0, 0] == 0.0

    def test_focal_loss_decreases_with_match(self):
        gt = np.zeros((1, 1, 8), np.float32)
        gt[0, 0] = [8.0, 0.0, -0.5, 4.0, 2.0, 1.5, 0.0, 1]
        tgt = rasterize_gt_boxes_bev(
            jnp.array(gt), TINY.grid_size, TINY.pc_range, TINY.voxel_size
        )
        good = tgt[..., None] * 0.98 + 0.01
        bad = (1 - tgt[..., None]) * 0.98 + 0.01
        l_good = occupancy_loss(good, jnp.array(gt), TINY.grid_size, TINY.pc_range,
                                TINY.voxel_size)
        l_bad = occupancy_loss(bad, jnp.array(gt), TINY.grid_size, TINY.pc_range,
                               TINY.voxel_size)
        assert float(l_good) < float(l_bad)


class TestPointPillarFamily:
    def test_forward(self, rng):
        from hgsfusion_tpu.models.detector import PointPillarModel

        batch = make_tiny_batch(rng)
        model = PointPillarModel(cfg=TINY)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds, _ = model.apply(variables, batch, False, mutable=["batch_stats"])
        # backbone downsamples 2x then upsamples (1,2,4): output stride 2
        assert preds["cls_preds"].shape == (1, 16, 16, 18)
        assert np.all(np.isfinite(np.asarray(preds["cls_preds"])))


class TestTJ4DConfigModel:
    def test_four_class_head_forward(self, rng):
        """TJ4D-style config: 4 classes, 8 anchors/location, 31-wide reader."""
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            class_names=("Car", "Pedestrian", "Cyclist", "Truck"),
            reader_num_input=31,
            num_anchors_per_location=8,
            aspp_dilation=3,
            bev_aug=False,
        )
        batch = make_tiny_batch(rng)
        # TJ4D points are 18-wide (8 radar feats)
        pts = np.zeros((1, 128, 18), np.float32)
        pts[..., :3] = np.asarray(batch["points"])[..., :3]
        pts[..., 3:16] = rng.randn(1, 128, 13)
        pts[..., 16] = 1.0
        pts[..., 17] = 1.0
        batch = dict(batch)
        batch["points"] = jnp.asarray(pts)
        model = HGSFusionModel(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds, _ = model.apply(variables, batch, False, mutable=["batch_stats"])
        assert preds["cls_preds"].shape == (1, 32, 32, 8 * 4)
        assert preds["box_preds"].shape == (1, 32, 32, 8 * 7)
        assert np.all(np.isfinite(np.asarray(preds["cls_preds"])))


class TestOccupancyGateVariants:
    def test_use_mask_radial_blend(self):
        """USE_MASK gate: image * (occ*ratio + (1-ratio)) with the radial
        Gaussian ratio (radar_occupancy_2d_v2.py:273-310). Far cells
        (ratio ~ 0) pass the image BEV through unchanged."""
        import jax

        from hgsfusion_tpu.models.occupancy import RadarOccupancy2D

        rng = np.random.RandomState(0)
        ny = nx = 32
        image = jnp.asarray(rng.randn(1, ny, nx, 8).astype(np.float32))
        radar = jnp.asarray(rng.randn(1, ny, nx, 8).astype(np.float32))
        mod = RadarOccupancy2D(
            radar_input_channels=8, use_aspp=False, use_mask=True,
            mask_sigma=4.0,
        )
        variables = mod.init(jax.random.PRNGKey(0), image, radar, False)
        gated, occ = mod.apply(variables, image, radar, False)
        assert gated.shape == image.shape and occ.shape == (1, ny, nx, 1)

        # explicit ratio oracle
        ys = (np.arange(ny) - ny // 2)[:, None]
        xs = np.arange(nx)[None, :]
        ratio = np.exp(-(xs * xs + ys * ys) / (2 * 4.0 ** 2))
        expect = np.asarray(image) * (
            np.asarray(occ) * ratio[None, :, :, None]
            + (1 - ratio)[None, :, :, None]
        )
        np.testing.assert_allclose(np.asarray(gated), expect, atol=1e-5)
        # far corner: ratio ~ 0 -> image passes through
        np.testing.assert_allclose(
            np.asarray(gated)[0, -1, -1], np.asarray(image)[0, -1, -1],
            atol=1e-5)


class TestDeformConvAndParallelASPP:
    def test_zero_offset_equals_halfweight_dilated_conv(self):
        """At init the offset conv is zero, so DCNv2 output == 0.5 * a
        standard dilated conv with the same kernel (sigmoid(0) masks)."""
        import jax

        from hgsfusion_tpu.ops.deform_conv import ModulatedDeformConv2d

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 12, 14, 6).astype(np.float32))
        mod = ModulatedDeformConv2d(8, kernel_size=3, dilation=2)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        assert out.shape == (1, 12, 14, 8)

        # oracle: dilated 3x3 conv with the SAME kernel (flax HWIO layout)
        k = np.asarray(variables["params"]["kernel"])  # (9, C, O)
        kernel_hwio = k.reshape(3, 3, 6, 8)
        import jax.numpy as jnp2
        ref = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 3, 1, 2)),
            jnp.transpose(jnp.asarray(kernel_hwio), (3, 2, 0, 1)),
            window_strides=(1, 1), padding=((2, 2), (2, 2)),
            rhs_dilation=(2, 2),
        )
        ref = jnp.transpose(ref, (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(out), 0.5 * np.asarray(ref), atol=1e-4)

    def test_learned_offset_shifts_sampling(self):
        """A constant +1-pixel x offset on a 1x1 'kernel' shifts the input
        by one column (bilinear at integer coords is exact)."""
        import jax

        from hgsfusion_tpu.ops.deform_conv import ModulatedDeformConv2d

        x = jnp.asarray(
            np.arange(1 * 4 * 5 * 1, dtype=np.float32).reshape(1, 4, 5, 1))
        mod = ModulatedDeformConv2d(1, kernel_size=1, dilation=1)
        variables = mod.init(jax.random.PRNGKey(0), x)
        p = jax.tree_util.tree_map(lambda a: a, variables["params"])
        # identity kernel, offset bias: off_y=0, off_x=+1, mask logit big
        p["kernel"] = jnp.ones((1, 1, 1))
        bias = np.zeros(3, np.float32)
        bias[1] = 1.0      # off_x
        bias[2] = 20.0     # mask -> sigmoid ~ 1
        p["conv_offset"]["bias"] = jnp.asarray(bias)
        out = mod.apply({"params": p}, x)
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :-1, 0], np.asarray(x)[0, :, 1:, 0],
            atol=1e-4)
        # right edge samples out of bounds -> zeros padding
        np.testing.assert_allclose(np.asarray(out)[0, :, -1, 0], 0.0,
                                   atol=1e-4)

    def test_parallel_aspp_with_dcn_branch(self):
        import jax

        from hgsfusion_tpu.models.occupancy import RadarOccupancy2D

        rng = np.random.RandomState(0)
        image = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
        radar = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
        mod = RadarOccupancy2D(
            radar_input_channels=8, use_aspp=True,
            aspp_dilations=(1, 2, 4), use_dcn=(False, True, False),
        )
        variables = mod.init(jax.random.PRNGKey(0), image, radar, False)
        gated, occ = mod.apply(variables, image, radar, False)
        assert gated.shape == image.shape
        assert occ.shape == (1, 16, 16, 1)
        assert "aspp_dcn1" in variables["params"]
        assert "aspp_branch0" in variables["params"]


class TestFlagshipDegenerateInputs:
    def test_empty_point_cloud_forward_finite(self, tiny_model_and_vars):
        """All points invalid: the radar branch sees an empty BEV; the
        forward (and its gradients) must stay finite."""
        model, variables, batch = tiny_model_and_vars
        b2 = dict(batch)
        b2["points_valid"] = jnp.zeros_like(batch["points_valid"])
        preds, _ = jax.jit(
            lambda v, b: model.apply(v, b, False, mutable=["batch_stats"])
        )(variables, b2)
        for k, v in preds.items():
            assert np.all(np.isfinite(np.asarray(v))), k

    def test_empty_scene_train_grads_finite(self, tiny_model_and_vars):
        """Empty points + zero gt through the full training loss: grads
        must be finite (the all-background assignment path)."""
        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.models.anchors import TargetAssigner
        from hgsfusion_tpu.train.optim import build_optimizer
        from hgsfusion_tpu.train.trainer import TrainState, make_train_step

        model, variables, batch = tiny_model_and_vars
        b2 = {k: v for k, v in batch.items()}
        b2["points_valid"] = jnp.zeros_like(batch["points_valid"])
        b2["gt_boxes"] = jnp.zeros_like(batch["gt_boxes"])

        anchor_cfg = [
            dict(class_name=n, anchor_sizes=[s], anchor_rotations=[0, 1.57],
                 anchor_bottom_heights=[h], align_center=False,
                 feature_map_stride=1, matched_threshold=m,
                 unmatched_threshold=u)
            for n, s, h, m, u in [
                ("Car", [3.9, 1.6, 1.56], -1.78, 0.6, 0.45),
                ("Pedestrian", [0.8, 0.6, 1.73], -0.6, 0.5, 0.35),
                ("Cyclist", [1.76, 0.6, 1.73], -0.6, 0.5, 0.35),
            ]
        ]
        assigner = TargetAssigner(anchor_cfg, TINY.grid_size, TINY.pc_range,
                                  class_names=TINY.class_names)
        optim_cfg = ConfigDict(
            {"OPTIMIZER": "adam_onecycle", "LR": 1e-3, "WEIGHT_DECAY": 0.01,
             "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
             "GRAD_NORM_CLIP": 10})
        tx, _ = build_optimizer(optim_cfg, total_steps=4,
                                params=variables["params"])
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))
        loss_weights = {"cls_weight": 1.0, "loc_weight": 2.0,
                        "dir_weight": 0.2, "code_weights": [1.0] * 7}
        step = jax.jit(make_train_step(model, assigner, tx, loss_weights,
                                       TINY))
        new_state, tb = step(state, b2)
        assert np.isfinite(float(tb["loss"]))
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_post_process_decode_after_topk_equals_full_decode():
    """post_process (round 4) decodes only the top-k selected anchors; the
    per-anchor decode commutes with score selection, so outputs on VALID
    slots must equal the original decode-everything formulation."""
    import jax

    from hgsfusion_tpu.models.anchor_head import generate_predicted_boxes
    from hgsfusion_tpu.models.anchors import TargetAssigner
    from hgsfusion_tpu.ops.nms import class_agnostic_nms

    cfg = TINY
    assigner = TargetAssigner(ANCHOR_CFG, cfg.grid_size, cfg.pc_range,
                              class_names=cfg.class_names)
    anchors = assigner.flat_anchors
    ny, nx = cfg.grid_size[1], cfg.grid_size[0]
    rng = np.random.RandomState(20)
    preds = {
        "cls_preds": jnp.asarray(
            rng.randn(2, ny, nx, 6 * 3) * 2.0, jnp.float32),
        "box_preds": jnp.asarray(
            rng.randn(2, ny, nx, 6 * 7) * 0.2, jnp.float32),
        "dir_cls_preds": jnp.asarray(
            rng.randn(2, ny, nx, 6 * 2), jnp.float32),
    }
    out = post_process(preds, anchors, assigner.box_coder, cfg,
                       score_thresh=0.3, nms_thresh=0.1,
                       pre_max_size=512, post_max_size=64)

    # original formulation: full decode -> nms indices -> gather
    batch_cls, batch_box = generate_predicted_boxes(
        preds["cls_preds"], preds["box_preds"], preds["dir_cls_preds"],
        anchors, assigner.box_coder, cfg.num_class,
        dir_offset=cfg.dir_offset, dir_limit_offset=cfg.dir_limit_offset,
        num_dir_bins=cfg.num_dir_bins)
    scores = jax.nn.sigmoid(batch_cls)
    cls_scores = jnp.max(scores, axis=-1)
    labels = jnp.argmax(scores, axis=-1) + 1
    idx, valid = jax.vmap(
        lambda s, b: class_agnostic_nms(
            s, b, score_thresh=0.3, nms_thresh=0.1, pre_max_size=512,
            post_max_size=64)
    )(cls_scores, batch_box)
    take = jax.vmap(lambda arr, i: arr[i])
    want = {"boxes": take(batch_box, idx), "scores": take(cls_scores, idx),
            "labels": take(labels, idx), "valid": valid}

    v = np.asarray(out["valid"])
    assert v.any(), "degenerate test: no valid detections"
    np.testing.assert_array_equal(v, np.asarray(want["valid"]))
    for key, tol in (("boxes", 1e-5), ("scores", 1e-6), ("labels", 0)):
        a = np.asarray(out[key])[v]
        b = np.asarray(want[key])[v]
        np.testing.assert_allclose(a, b, atol=tol, err_msg=key)
