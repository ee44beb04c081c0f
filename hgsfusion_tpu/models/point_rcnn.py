"""PointRCNN detector family: point-wise backbone, point box head, RoI head.

Behavior references (not copied):
  pcdet/models/backbones_3d/pointnet2_backbone.py (PointNet2MSG: 4 multi-
    radius SA levels with FPS sampling + 4 FP upsampling levels),
  pcdet/models/dense_heads/point_head_box.py + point_head_template.py
    (per-point fg classification + PointResidualCoder box regression;
    ignore band from GT_EXTRA_WIDTH-enlarged boxes),
  pcdet/models/roi_heads/pointrcnn_head.py (roipoint pooling, canonical
    transform, [score, depth] prefix channels, xyz-up + merge-down MLPs,
    3-level SA encoder, cls/reg FCs),
  pcdet/models/detectors/point_rcnn.py (module order).

TPU-first: all point sets are fixed-size and padded; FPS is the masked
k-step fori_loop of ops/pointnet2.py; the RoI stage runs the same SA
machinery over the fixed 512-point in-box sample with per-slot validity
masks (the reference zeroes empty RoIs — kept).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointnet2 import three_interpolate, three_nn
from ..ops.points_in_boxes import points_in_boxes
from ..ops.roiaware_pool import roipoint_pool3d
from ..utils.box_coder import PointResidualCoder
from .pvrcnn import SALayer, _GroupMLP


class _FCStack(nn.Module):
    """Dense + BN + ReLU stack (make_fc_layers minus the final head)."""

    channels: Tuple[int, ...]
    dtype: object = None

    @nn.compact
    def __call__(self, h, train: bool):
        for i, c in enumerate(self.channels):
            h = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(h)
            h = nn.relu(h)
        return h


class PointNet2MSG(nn.Module):
    """Multi-scale-grouping PointNet++ encoder/decoder over raw points.

    Default level spec = the OpenPCDet pointrcnn.yaml KITTI recipe
    (NPOINTS 4096/1024/256/64, two radii per level, FP_MLPS ending at 128
    per-point channels). `npoint_scale` shrinks every level for tests.
    """

    npoints: Tuple[int, ...] = (4096, 1024, 256, 64)
    radii: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)
    )
    nsamples: Tuple[Tuple[int, ...], ...] = (
        (16, 32), (16, 32), (16, 32), (16, 32)
    )
    sa_mlps: Tuple = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)),
    )
    fp_mlps: Tuple[Tuple[int, ...], ...] = (
        (128, 128), (256, 256), (512, 512), (512, 512)
    )
    dtype: object = None

    @nn.compact
    def __call__(self, points, valid, train: bool):
        """points (B, N, 3+C) -> per-point features (B, N, fp_mlps[0][-1])."""
        from ..ops.pointnet2 import farthest_point_sample

        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        for i, npoint in enumerate(self.npoints):
            idx = jax.vmap(
                lambda x, v: farthest_point_sample(x, v, npoint)
            )(l_xyz[i], l_valid[i])
            new_xyz = jax.vmap(lambda x, j: x[j])(l_xyz[i], idx)
            new_valid = jax.vmap(lambda v, j: v[j])(l_valid[i], idx)
            sa = SALayer(
                radii=self.radii[i], nsamples=self.nsamples[i],
                mlps=self.sa_mlps[i], dtype=self.dtype, name=f"sa{i}",
                zero_empty=False,  # pointnet2_batch semantics
            )(new_xyz, l_xyz[i], l_feats[i], l_valid[i], train)
            l_xyz.append(new_xyz)
            l_feats.append(sa)
            l_valid.append(new_valid)

        # FP: deepest -> shallowest (pointnet2_backbone.py:86-90)
        for i in range(len(self.npoints) - 1, -1, -1):
            def fp_interp(u, k, kv, f):
                dists, idx = three_nn(u, k, kv)
                return three_interpolate(f, idx, dists)

            interp = jax.vmap(fp_interp)(
                l_xyz[i], l_xyz[i + 1], l_valid[i + 1], l_feats[i + 1]
            )
            skip = l_feats[i]
            h = interp if skip is None else jnp.concatenate([skip, interp], -1)
            l_feats[i] = _FCStack(
                self.fp_mlps[i], dtype=self.dtype, name=f"fp{i}"
            )(h, train)
        return l_feats[0].astype(jnp.float32)


class PointHeadBox(nn.Module):
    """Per-point fg classification + point-anchored box regression
    (point_head_box.py: CLS_FC/REG_FC [256, 256], PointResidualCoder)."""

    num_class: int
    code_size: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool):
        cls = nn.Dense(
            self.num_class, dtype=self.dtype, name="cls_pred"
        )(_FCStack((256, 256), dtype=self.dtype, name="cls_fc")(feats, train))
        reg = nn.Dense(
            self.code_size, dtype=self.dtype, name="box_pred"
        )(_FCStack((256, 256), dtype=self.dtype, name="reg_fc")(feats, train))
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


def point_targets(xyz, valid, gt_boxes, extra_width=(0.2, 0.2, 0.2)):
    """Per-point targets (point_head_template.assign_stack_targets):
    fg = inside a gt box (cls = that box's class); points inside the
    GT_EXTRA_WIDTH-enlarged box but outside the box are ignored (cls -1).

    Returns dict: cls (B, N) int32 in {-1, 0, 1..num_class},
    gt_of_point (B, N, 8), fg (B, N) bool."""
    def one(pts, gts):
        gv = gts[:, -1] > 0
        inb = points_in_boxes(pts, gts[:, :7]) & gv[:, None]  # (M, N)
        # enlarge_box3d adds extra_width ONCE to the dims (box_utils.py:
        # 199), i.e. each face extends by extra/2 — doubling it made the
        # ignore band twice as wide and dropped hard negatives
        big = jnp.concatenate(
            [gts[:, :3], gts[:, 3:6] + jnp.asarray(extra_width),
             gts[:, 6:7]], axis=1
        )
        in_big = points_in_boxes(pts, big) & gv[:, None]
        fg = jnp.any(inb, axis=0)
        ignored = jnp.any(in_big, axis=0) & ~fg
        first = jnp.argmax(inb, axis=0)  # matched gt index for fg points
        cls = jnp.where(
            fg, gts[first, -1].astype(jnp.int32),
            jnp.where(ignored, -1, 0),
        )
        return cls, gts[first], fg

    cls, gt_of_point, fg = jax.vmap(one)(xyz, gt_boxes)
    cls = jnp.where(valid, cls, -1)
    return {"cls": cls, "gt_of_point": gt_of_point, "fg": fg & valid}


def point_head_loss(cls_logits, box_encodings, xyz, targets: Dict,
                    coder: PointResidualCoder, cls_weight: float = 1.0,
                    box_weight: float = 1.0):
    """Sigmoid focal cls (fg-count normalized) + smooth-L1 box on fg points
    (point_head_template get_cls_layer_loss/get_box_layer_loss)."""
    from .anchor_head import sigmoid_focal_loss

    cls_t = targets["cls"]
    care = (cls_t >= 0).astype(jnp.float32)
    one_hot = jax.nn.one_hot(cls_t - 1, cls_logits.shape[-1])
    one_hot = one_hot * (cls_t > 0)[..., None]
    n_fg = jnp.maximum(jnp.sum(targets["fg"].astype(jnp.float32)), 1.0)
    loss_cls = jnp.sum(
        sigmoid_focal_loss(cls_logits, one_hot, care)
    ) / n_fg

    enc_t = coder.encode(
        targets["gt_of_point"][..., :7], xyz,
        jnp.maximum(targets["gt_of_point"][..., -1].astype(jnp.int32), 1),
    )
    # WeightedSmoothL1Loss default beta = 1/9 (loss_utils.py:85)
    from .anchor_head import weighted_smooth_l1

    fgw = targets["fg"].astype(jnp.float32)
    sl1 = weighted_smooth_l1(box_encodings, enc_t, fgw)
    loss_box = jnp.sum(sl1) / n_fg
    return (loss_cls * cls_weight + loss_box * box_weight,
            {"point_cls": loss_cls, "point_box": loss_box})


class PointRCNNHead(nn.Module):
    """Second stage: in-box point pooling + canonical PointNet encoder.

    pointrcnn_head.py: prefix channels [xyz | score | depth], XYZ_UP_LAYER
    [128, 128], merge-down, SA levels NPOINTS [128, 32, -1] RADIUS
    [0.2, 0.4, global] MLPS [[128]*3, [128,128,256], [256,256,512]],
    CLS_FC/REG_FC [256, 256]. Empty RoIs are zeroed (roipool3d_gpu).
    """

    num_sampled: int = 512
    depth_normalizer: float = 70.0
    sa_npoints: Tuple[int, ...] = (128, 32)
    sa_radii: Tuple[float, ...] = (0.2, 0.4)
    sa_nsamples: Tuple[int, ...] = (16, 16)
    dtype: object = None

    @nn.compact
    def __call__(self, rois, roi_valid, xyz, valid, point_feats,
                 point_scores, train: bool):
        from ..ops.pointnet2 import farthest_point_sample

        b, r = rois.shape[:2]
        depth = jnp.linalg.norm(xyz, axis=-1) / self.depth_normalizer - 0.5
        stacked_feats = jnp.concatenate(
            [point_scores[..., None], depth[..., None], point_feats], axis=-1
        )
        pooled, empty, counts = jax.vmap(
            lambda ro, p, f, v: roipoint_pool3d(
                ro, p, f, v, num_sampled=self.num_sampled
            )
        )(rois, xyz, stacked_feats, valid)
        # canonical transform (center + -yaw rotation), zero empty RoIs
        local = pooled[..., :3] - rois[:, :, None, :3]
        c = jnp.cos(-rois[..., 6])[..., None]
        s = jnp.sin(-rois[..., 6])[..., None]
        lx = local[..., 0] * c - local[..., 1] * s
        ly = local[..., 0] * s + local[..., 1] * c
        local = jnp.stack([lx, ly, local[..., 2]], axis=-1)
        keep = (~empty & roi_valid)[..., None, None].astype(pooled.dtype)
        local = local * keep
        extra = pooled[..., 3:] * keep

        slot_valid = (
            jnp.arange(self.num_sampled)[None, None, :] < counts[..., None]
        ) & (~empty & roi_valid)[..., None]

        # xyz-up on [local xyz, score, depth]; merge with point features
        prefix = jnp.concatenate([local, extra[..., :2]], axis=-1)
        xu = _FCStack((128, 128), dtype=self.dtype, name="xyz_up")(
            prefix, train
        )
        pf = extra[..., 2:]
        merged = _FCStack((128,), dtype=self.dtype, name="merge_down")(
            jnp.concatenate([xu, pf], axis=-1), train
        )

        # SA encoder over the canonical point set, flattened over (B, R)
        flat_xyz = local.reshape(b * r, self.num_sampled, 3)
        flat_feats = merged.reshape(b * r, self.num_sampled, -1)
        flat_valid = slot_valid.reshape(b * r, self.num_sampled)
        sa_mlps = ((128, 128, 128), (128, 128, 256))
        for i, (npoint, radius, nsample) in enumerate(
            zip(self.sa_npoints, self.sa_radii, self.sa_nsamples)
        ):
            idx = jax.vmap(
                lambda x, v: farthest_point_sample(x, v, npoint)
            )(flat_xyz, flat_valid)
            new_xyz = jax.vmap(lambda x, j: x[j])(flat_xyz, idx)
            new_valid = jax.vmap(lambda v, j: v[j])(flat_valid, idx)
            flat_feats = SALayer(
                radii=(radius,), nsamples=(nsample,), mlps=(sa_mlps[i],),
                dtype=self.dtype, name=f"sa{i}",
                zero_empty=False,  # pointnet2_batch semantics
            )(new_xyz, flat_xyz, flat_feats, flat_valid, train)
            flat_xyz, flat_valid = new_xyz, new_valid
        # global group-all level: MLP + masked max (npoint -1 in the ref)
        g = jnp.concatenate([flat_xyz, flat_feats], axis=-1)[:, None]
        gv = flat_valid[:, None, :]
        glob = _GroupMLP(
            (256, 256, 512), dtype=self.dtype, name="sa_global"
        )(g, gv, train)[:, 0]

        h = glob.reshape(b, r, -1)
        cls = nn.Dense(1, dtype=self.dtype, name="cls_pred")(
            _FCStack((256, 256), dtype=self.dtype, name="cls_fc")(h, train)
        )
        reg = nn.Dense(7, dtype=self.dtype, name="reg_pred")(
            _FCStack((256, 256), dtype=self.dtype, name="reg_fc")(h, train)
        )
        return cls[..., 0].astype(jnp.float32), reg.astype(jnp.float32)
