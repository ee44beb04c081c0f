"""CenterPoint center-based dense head — TPU-native.

Behavior reference (not copied): pcdet/models/dense_heads/center_head.py
(SeparateHead:12-46, CenterHead.assign_target_of_single_head:108-161,
get_loss:233-262, sigmoid clamp:229-231),
pcdet/models/model_utils/centernet_utils.py (gaussian_radius:9-35,
gaussian2D/draw_gaussian_to_heatmap:38-70, _topk:155-171,
decode_bbox_from_heatmap:173-241) and pcdet/utils/loss_utils.py
(neg_loss_cornernet:266-300, _reg_loss:347-376, RegLossCenterNet:397-421).

TPU-first design:
  * target assignment is one jittable vectorized graph over the padded
    (B, M, 8) gt tensor — per-object gaussians are a (M, H, W) batch
    max-reduced per class, replacing the reference's per-box CPU loop +
    host->device copies;
  * heads are NHWC so XLA tiles the 3x3 convs onto the MXU;
  * decode is fixed-shape: global exact_top_k over the (C*H*W) heatmap
    (lax.top_k with large k stalls on this TPU stack) and a static K
    candidate set with a validity mask, so the eval path jits once.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.topk import exact_top_k


# ---------------------------------------------------------------------------
# Target assignment
# ---------------------------------------------------------------------------

def gaussian_radius(height, width, min_overlap: float = 0.5):
    """CornerNet gaussian radius: min root of the three IoU quadratics.

    Matches centernet_utils.gaussian_radius:9-35 bit-for-bit, INCLUDING the
    inherited CornerNet quirk of dividing every root by 2 instead of 2a
    (changing it would shift radii and hurt checkpoint parity). Note the
    reference calls it with (dx, dy), i.e. height:=x-extent — call sites
    keep the same argument order.
    """
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def center_targets(
    gt_boxes: jnp.ndarray,
    num_class: int,
    feature_map_hw: Tuple[int, int],
    feature_map_stride: int,
    pc_range: Sequence[float],
    voxel_size: Sequence[float],
    gaussian_overlap: float = 0.1,
    min_radius: int = 2,
    code_size: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Vectorized CenterNet targets for padded (B, M, >=8) gt boxes.

    Padded rows carry class 0 (and zero dims) and are masked out, mirroring
    the dx<=0/dy<=0 skip in assign_target_of_single_head:141-142. Returns
      heatmap (B, H, W, C)  — max-combined int-centered gaussians
      boxes   (B, M, code_size) — [frac dx, frac dy, z, log dims, cos, sin, extras]
      inds    (B, M) int32 flat H*W index of the int center
      mask    (B, M) bool
    """
    h, w = feature_map_hw
    cls = gt_boxes[..., -1].astype(jnp.int32)  # 1-based, 0 = pad
    x, y, z = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
    dx = gt_boxes[..., 3] / (voxel_size[0] * feature_map_stride)
    dy = gt_boxes[..., 4] / (voxel_size[1] * feature_map_stride)

    coord_x = jnp.clip(
        (x - pc_range[0]) / (voxel_size[0] * feature_map_stride), 0, w - 0.5
    )
    coord_y = jnp.clip(
        (y - pc_range[1]) / (voxel_size[1] * feature_map_stride), 0, h - 0.5
    )
    cx_int = coord_x.astype(jnp.int32)
    cy_int = coord_y.astype(jnp.int32)

    radius = jnp.maximum(
        gaussian_radius(dx, dy, gaussian_overlap).astype(jnp.int32), min_radius
    )
    valid = (dx > 0) & (dy > 0) & (cls > 0)

    # int-centered gaussian limited to the |u-cx| <= r, |v-cy| <= r window
    # (draw_gaussian_to_heatmap:47-70 uses gaussian2D centered on int(center))
    sigma = (2 * radius.astype(gt_boxes.dtype) + 1) / 6.0
    us = jnp.arange(w, dtype=gt_boxes.dtype)
    vs = jnp.arange(h, dtype=gt_boxes.dtype)
    du = us[None, None, :] - cx_int[..., None].astype(gt_boxes.dtype)  # (B,M,W)
    dv = vs[None, None, :] - cy_int[..., None].astype(gt_boxes.dtype)  # (B,M,H)
    r_f = radius[..., None].astype(gt_boxes.dtype)
    in_u = (jnp.abs(du) <= r_f) & valid[..., None]
    in_v = jnp.abs(dv) <= r_f
    # (B, M, H, W) gaussians; M*H*W stays small (<= 64 * 160 * 160)
    g = jnp.exp(
        -(du[:, :, None, :] ** 2 + dv[:, :, :, None] ** 2)
        / (2.0 * sigma[..., None, None] ** 2)
    )
    g = g * (in_v[:, :, :, None] & in_u[:, :, None, :]).astype(g.dtype)

    heatmap = jnp.stack(
        [jnp.max(jnp.where((cls == c + 1)[..., None, None], g, 0.0), axis=1)
         for c in range(num_class)],
        axis=-1,
    )  # (B, H, W, C)

    boxes = jnp.zeros(gt_boxes.shape[:-1] + (code_size,), gt_boxes.dtype)
    boxes = boxes.at[..., 0].set(coord_x - cx_int)
    boxes = boxes.at[..., 1].set(coord_y - cy_int)
    boxes = boxes.at[..., 2].set(z)
    safe_dims = jnp.maximum(gt_boxes[..., 3:6], 1e-6)
    boxes = boxes.at[..., 3:6].set(jnp.log(safe_dims))
    boxes = boxes.at[..., 6].set(jnp.cos(gt_boxes[..., 6]))
    boxes = boxes.at[..., 7].set(jnp.sin(gt_boxes[..., 6]))
    if code_size > 8:  # extras (e.g. velocity), gt cols 7:-1
        n_extra = code_size - 8
        if gt_boxes.shape[-1] < 8 + n_extra:
            raise ValueError(
                f"code_size {code_size} needs gt boxes with {7 + n_extra} "
                f"feature columns (+class), got width {gt_boxes.shape[-1]} "
                "— enable PRED_VELOCITY (or drop the extra head branch)"
            )
        boxes = boxes.at[..., 8:].set(gt_boxes[..., 7 : 7 + n_extra])
    boxes = boxes * valid[..., None].astype(boxes.dtype)

    inds = jnp.where(valid, cy_int * w + cx_int, 0).astype(jnp.int32)
    return {"heatmap": heatmap, "boxes": boxes, "inds": inds, "mask": valid}


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def centernet_focal_loss(pred_logits, gt_heatmap):
    """CornerNet focal loss on a clamped sigmoid (neg_loss_cornernet:266-300;
    the clamp is CenterHead.sigmoid:229-231). NHWC layouts."""
    p = jnp.clip(jax.nn.sigmoid(pred_logits), 1e-4, 1 - 1e-4)
    pos = (gt_heatmap == 1.0).astype(p.dtype)
    neg = (gt_heatmap < 1.0).astype(p.dtype)
    neg_w = jnp.power(1.0 - gt_heatmap, 4)
    pos_loss = jnp.sum(jnp.log(p) * jnp.power(1 - p, 2) * pos)
    neg_loss = jnp.sum(jnp.log(1 - p) * jnp.power(p, 2) * neg_w * neg)
    num_pos = jnp.sum(pos)
    return jnp.where(
        num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0)
    )


def center_reg_loss(pred_maps, inds, mask, target_boxes):
    """Masked L1 at the gt center pixels, per-channel sum normalized by the
    object count (_reg_loss:347-376 with the clamp_min(num, 1) variant).

    pred_maps (B, H, W, D) NHWC, inds (B, M), mask (B, M), targets (B, M, D).
    Returns (D,) per-channel losses.
    """
    b, h, w, d = pred_maps.shape
    flat = pred_maps.reshape(b, h * w, d)
    pred = jnp.take_along_axis(flat, inds[..., None], axis=1)  # (B, M, D)
    m = mask.astype(pred.dtype)[..., None] * jnp.isfinite(target_boxes).astype(
        pred.dtype
    )
    num = jnp.maximum(jnp.sum(mask.astype(pred.dtype)), 1.0)
    tgt = jnp.where(jnp.isfinite(target_boxes), target_boxes, 0.0)
    return jnp.sum(jnp.abs(pred * m - tgt * m), axis=(0, 1)) / num


def center_head_loss(
    preds: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    head_order: Sequence[str],
    code_weights: Sequence[float],
    cls_weight: float = 1.0,
    loc_weight: float = 2.0,
):
    """Total CenterHead loss (get_loss:233-262, single head group)."""
    hm_loss = centernet_focal_loss(preds["hm"], targets["heatmap"]) * cls_weight
    reg_maps = jnp.concatenate([preds[k] for k in head_order], axis=-1)
    per_channel = center_reg_loss(
        reg_maps, targets["inds"], targets["mask"], targets["boxes"]
    )
    loc_loss = jnp.sum(
        per_channel * jnp.asarray(code_weights, per_channel.dtype)
    ) * loc_weight
    total = hm_loss + loc_loss
    return total, {"hm_loss": hm_loss, "loc_loss_center": loc_loss}


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class SeparateHead(nn.Module):
    """Per-branch conv stacks over a shared feature (SeparateHead:12-46).

    head_dict: ((name, out_channels, num_conv), ...). The 'hm' branch's final
    bias initializes to init_bias (focal prior)."""

    head_dict: Tuple[Tuple[str, int, int], ...]
    init_bias: float = -2.19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out = {}
        for name, out_ch, num_conv in self.head_dict:
            h = x
            for i in range(num_conv - 1):
                h = nn.Conv(
                    x.shape[-1], (3, 3), use_bias=False, dtype=self.dtype,
                    name=f"{name}_conv{i}",
                )(h)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"{name}_bn{i}",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm" else nn.initializers.zeros_init()
            )
            out[name] = nn.Conv(
                out_ch, (3, 3), use_bias=True, bias_init=bias_init,
                dtype=self.dtype, name=f"{name}_out",
            )(h).astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    """Shared 3x3 conv + separate branches (CenterHead:49-106, single head
    group covering all classes — the VoD/KITTI configuration)."""

    num_class: int
    shared_channels: int = 64
    head_order: Tuple[str, ...] = ("center", "center_z", "dim", "rot")
    head_channels: Tuple[int, ...] = (2, 1, 3, 2)
    num_conv: int = 2
    num_hm_conv: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        h = nn.Conv(
            self.shared_channels, (3, 3), use_bias=False, dtype=self.dtype,
            name="shared_conv",
        )(feats)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="shared_bn",
        )(h)
        h = nn.relu(h)
        head_dict = tuple(
            (n, c, self.num_conv) for n, c in zip(self.head_order, self.head_channels)
        ) + (("hm", self.num_class, self.num_hm_conv),)
        return SeparateHead(head_dict=head_dict, dtype=self.dtype, name="head")(
            h, train
        )


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def decode_center_boxes(
    preds: Dict[str, jnp.ndarray],
    k: int,
    feature_map_stride: int,
    pc_range: Sequence[float],
    voxel_size: Sequence[float],
    post_center_limit_range: Sequence[float],
    score_thresh: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Fixed-shape box decode (decode_bbox_from_heatmap:173-241).

    Global top-K over the flattened (C*H*W) sigmoid heatmap (equivalent to
    the reference's two-stage per-class-then-global _topk:155-171), gathers
    the regression maps at the peak pixels, and masks by the post-center
    range + score threshold. Returns boxes (B,K,7), scores (B,K), 1-based
    labels (B,K), valid (B,K).
    """
    hm = jax.nn.sigmoid(preds["hm"].astype(jnp.float32))  # (B, H, W, C)
    b, h, w, c = hm.shape
    k_eff = min(k, c * h * w)  # tiny feature maps: fewer cells than K
    has_vel = "vel" in preds

    def one(hm_i, center_i, z_i, dim_i, rot_i, vel_i):
        scores, flat_idx = exact_top_k(hm_i.transpose(2, 0, 1).reshape(-1), k_eff)
        cls_id = flat_idx // (h * w)
        spatial = flat_idx % (h * w)
        ys = (spatial // w).astype(jnp.float32)
        xs = (spatial % w).astype(jnp.float32)

        def gather(m):
            return jnp.take_along_axis(
                m.reshape(h * w, m.shape[-1]), spatial[:, None], axis=0
            )

        off = gather(center_i)
        zc = gather(z_i)[:, 0]
        dims = jnp.exp(jnp.clip(gather(dim_i), -10.0, 10.0))
        rot = gather(rot_i)
        angle = jnp.arctan2(rot[:, 1], rot[:, 0])
        xs = (xs + off[:, 0]) * feature_map_stride * voxel_size[0] + pc_range[0]
        ys = (ys + off[:, 1]) * feature_map_stride * voxel_size[1] + pc_range[1]
        boxes = jnp.stack(
            [xs, ys, zc, dims[:, 0], dims[:, 1], dims[:, 2], angle], axis=-1
        )
        lim = jnp.asarray(post_center_limit_range, jnp.float32)
        ok = jnp.all(boxes[:, :3] >= lim[:3], axis=1)
        ok &= jnp.all(boxes[:, :3] <= lim[3:], axis=1)
        ok &= scores > score_thresh
        vels = gather(vel_i) if has_vel else jnp.zeros((k_eff, 2))
        return boxes, scores, cls_id + 1, ok, vels

    boxes, scores, labels, valid, vels = jax.vmap(one)(
        hm, preds["center"], preds["center_z"], preds["dim"], preds["rot"],
        preds["vel"] if has_vel else jnp.zeros((b, h, w, 2)),
    )
    if k_eff < k:  # pad back to the caller's fixed K with invalid slots
        pad = [(0, 0), (0, k - k_eff)]
        boxes = jnp.pad(boxes, pad + [(0, 0)])
        scores = jnp.pad(scores, pad)
        labels = jnp.pad(labels, pad)
        valid = jnp.pad(valid, pad)
        vels = jnp.pad(vels, pad + [(0, 0)])
    out = {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}
    if has_vel:
        out["vels"] = vels  # (B, K, 2) decoded velocities (nuScenes boxes)
    return out
