"""Part-A2 detector family: UNet part-aware stage + RoI-aware aggregation.

Behavior references (not copied):
  pcdet/models/backbones_3d/spconv_unet.py (UNetV2: VoxelBackBone8x-shaped
    encoder + sparse inverse-conv decoder with skip connections back to
    stride 1),
  pcdet/models/dense_heads/point_head_part... (PointIntraPartOffsetHead:
    per-point fg cls + 3 sigmoid intra-object part offsets),
  pcdet/models/roi_heads/partA2_head.py (RoIAware avg-pool of
    [part offsets | seg score] + max-pool of point features, two small
    conv stacks, merge, shared FCs, cls/reg),
  pcdet/models/detectors/PartA2_net.py (module order).

TPU-first: the sparse UNet decoder runs as dense masked 3D convs with
nearest-neighbor upsampling re-masked to the skip stage's active set (the
submanifold inverse conv writes only to the known finer active set — same
support, different kernel footprint: documented deviation). Point features
are gathered from the stride-1 voxel each point falls in (the reference's
point set IS the voxel set at this stage). Pooled RoI grids run dense
(R, o^3) conv stacks with activity masks.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.points_in_boxes import points_in_boxes
from ..ops.roiaware_pool import roiaware_pool3d
from .layers import MaskedBatchNorm
from .point_rcnn import _FCStack
from .voxel_backbone import _SubMConvBN3D, points_to_voxel_ids


def _upsample_to(src, target_dhw):
    """Nearest-neighbor upsample (B, d, h, w, C) to target (D, H, W)."""
    b, d, h, w, c = src.shape
    td, th, tw = target_dhw
    iz = jnp.minimum((jnp.arange(td) * d) // td, d - 1)
    iy = jnp.minimum((jnp.arange(th) * h) // th, h - 1)
    ix = jnp.minimum((jnp.arange(tw) * w) // tw, w - 1)
    return src[:, iz][:, :, iy][:, :, :, ix]


class UNetDecoder(nn.Module):
    """Decoder half of UNetV2: stride 8 -> 1 with skip concat at each level.

    Channel plan mirrors spconv_unet.py (up4 64, up3 64, up2 32, up1 16).
    """

    dtype: object = None

    @nn.compact
    def __call__(self, stages: Dict, train: bool):
        x, mask, _ = stages["x_conv4"]
        plan = (("x_conv3", 64, "up4"), ("x_conv2", 32, "up3"),
                ("x_conv1", 16, "up2"))
        for skip_name, ch, name in plan:
            skip, skip_mask, _ = stages[skip_name]
            up = _upsample_to(x, skip.shape[1:4])
            h = jnp.concatenate([up, skip], axis=-1)
            x = _SubMConvBN3D(ch, dtype=self.dtype, name=f"{name}_a")(
                h, skip_mask, train
            )
            x = _SubMConvBN3D(ch, dtype=self.dtype, name=f"{name}_b")(
                x, skip_mask, train
            )
            mask = skip_mask
        return x, mask  # stride-1 per-voxel features (B, D, H, W, 16)


class PointPartHead(nn.Module):
    """Per-point fg cls + intra-object part offsets (sigmoid in [0, 1])."""

    num_class: int
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool):
        cls = nn.Dense(self.num_class, dtype=self.dtype, name="cls_pred")(
            _FCStack((128, 128), dtype=self.dtype, name="cls_fc")(feats, train)
        )
        part = nn.Dense(3, dtype=self.dtype, name="part_pred")(
            _FCStack((128, 128), dtype=self.dtype, name="part_fc")(feats, train)
        )
        return cls.astype(jnp.float32), part.astype(jnp.float32)


def gather_point_voxel_features(voxels, points, valid, pc_range, voxel_size,
                                grid_size):
    """Per-point feature = stride-1 voxel feature of the containing cell."""
    nx, ny, nz = grid_size
    ids, in_grid = points_to_voxel_ids(points[..., :3], valid, pc_range,
                                       voxel_size, grid_size)
    b = voxels.shape[0]
    flat = voxels[:, :nz].reshape(b, nz * ny * nx, -1)
    flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 0)))  # dump row for invalid
    out = jax.vmap(lambda f, i: f[i])(flat, ids)
    return out * in_grid[..., None].astype(out.dtype)


def part_targets(xyz, valid, gt_boxes, extra_width=(0.2, 0.2, 0.2)):
    """Intra-object part labels: canonical coords normalized to [0, 1]
    (Part-A2 paper eq. 1; get_part_reg targets). Returns cls (B, N) with
    -1 = ignored (enlarged-box shell AND padded slots — the reference's
    assign_stack_targets set_ignore_flag + real-point stacking; counting
    padded slots as background would add thousands of phantom negatives),
    part (B, N, 3), fg (B, N)."""
    def one(pts, gts):
        gv = gts[:, -1] > 0
        inb = points_in_boxes(pts, gts[:, :7]) & gv[:, None]
        big = jnp.concatenate(
            [gts[:, :3], gts[:, 3:6] + jnp.asarray(extra_width, gts.dtype),
             gts[:, 6:7]], axis=1)
        in_big = points_in_boxes(pts, big) & gv[:, None]
        fg = jnp.any(inb, axis=0)
        ignored = jnp.any(in_big, axis=0) & ~fg
        first = jnp.argmax(inb, axis=0)
        g = gts[first]
        rel = pts - g[:, :3]
        c = jnp.cos(-g[:, 6])
        s = jnp.sin(-g[:, 6])
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        local = jnp.stack([lx, ly, rel[:, 2]], axis=1)
        part = jnp.clip(
            local / jnp.maximum(g[:, 3:6], 1e-3) + 0.5, 0.0, 1.0
        )
        cls = jnp.where(
            fg, g[:, -1].astype(jnp.int32), jnp.where(ignored, -1, 0))
        return cls, part, fg

    cls, part, fg = jax.vmap(one)(xyz, gt_boxes)
    cls = jnp.where(valid, cls, -1)  # padded slots are ignored, not bg
    return {"cls": cls, "part": part, "fg": fg & valid}


def part_head_loss(cls_logits, part_pred, targets: Dict):
    """Focal fg cls (fg-normalized) + BCE part regression on fg points
    (PointIntraPartOffsetHead get_loss)."""
    from .anchor_head import sigmoid_focal_loss

    cls_t = targets["cls"]
    one_hot = jax.nn.one_hot(cls_t - 1, cls_logits.shape[-1])
    one_hot = one_hot * (cls_t > 0)[..., None]
    n_fg = jnp.maximum(jnp.sum(targets["fg"].astype(jnp.float32)), 1.0)
    # cls weights: fg and REAL background only; ignored/padded (-1) carry
    # zero weight (get_cls_layer_loss:135-139)
    care = (cls_t >= 0).astype(jnp.float32)
    loss_cls = jnp.sum(sigmoid_focal_loss(cls_logits, one_hot, care)) / n_fg
    p = jnp.clip(jax.nn.sigmoid(part_pred), 1e-6, 1 - 1e-6)
    t = targets["part"]
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    fgw = targets["fg"].astype(jnp.float32)
    # the reference divides by (3 * pos_normalizer), get_part_layer_loss:163
    loss_part = jnp.sum(bce * fgw[..., None]) / (3.0 * n_fg)
    return (loss_cls + loss_part,
            {"part_cls": loss_cls, "part_reg": loss_part})


class PartA2RoIHead(nn.Module):
    """RoI-aware dual pooling + conv stacks + shared FC cls/reg head.

    partA2_head.py:11-58,104-229. pool_size default 6 (reference 12;
    documented deviation — the flattened shared-FC input would otherwise be
    12^3 x 128; configurable back to 12 via the yaml).
    """

    pool_size: int = 6
    num_features: int = 128
    seg_score_thresh: float = 0.3
    shared_fc: Tuple[int, ...] = (256, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, rois, roi_valid, xyz, valid, point_feats,
                 point_scores, point_parts, train: bool):
        b, r = rois.shape[:2]
        o = self.pool_size
        # part features: zero offsets where the seg score is low
        scr = point_scores[..., None]
        parts = jnp.where(scr >= self.seg_score_thresh, point_parts, 0.0)
        part_feats = jnp.concatenate([parts, scr], axis=-1)

        def pool(ro, p, pf, rf, v):
            pooled_part = roiaware_pool3d(ro, p, pf, v, out_size=o,
                                          pool_method="avg")
            pooled_rpn = roiaware_pool3d(ro, p, rf, v, out_size=o,
                                         pool_method="max")
            return pooled_part, pooled_rpn

        pooled_part, pooled_rpn = jax.vmap(pool)(
            rois, xyz, part_feats, point_feats, valid
        )
        cell_mask = jnp.any(pooled_part != 0, axis=-1, keepdims=True)

        def conv_stack(h, chans, name):
            hm = cell_mask.reshape(b * r, o, o, o, 1)
            h = h.reshape(b * r, o, o, o, -1)
            for i, c in enumerate(chans):
                h = nn.Conv(
                    c, kernel_size=(3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"{name}{i}",
                )(h * hm.astype(h.dtype))
                h = h * hm.astype(h.dtype)
                h = MaskedBatchNorm(c, name=f"{name}{i}_bn")(
                    h, hm, use_running_average=not train
                )
                h = nn.relu(h) * hm.astype(h.dtype)
            return h

        c0 = self.num_features // 2
        x_part = conv_stack(pooled_part, (64, c0), "conv_part")
        x_rpn = conv_stack(pooled_rpn, (64, c0), "conv_rpn")
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)
        h = merged.reshape(b, r, -1)
        h = _FCStack(self.shared_fc, dtype=self.dtype, name="shared_fc")(
            h, train
        )
        cls = nn.Dense(1, dtype=self.dtype, name="cls_pred")(
            _FCStack((256, 256), dtype=self.dtype, name="cls_fc")(h, train)
        )
        reg = nn.Dense(7, dtype=self.dtype, name="reg_pred")(
            _FCStack((256, 256), dtype=self.dtype, name="reg_fc")(h, train)
        )
        return cls[..., 0].astype(jnp.float32), reg.astype(jnp.float32)
