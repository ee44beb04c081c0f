"""TransFusion-L head: transformer-decoder detection over BEV features.

Behavior reference (not copied): pcdet/models/dense_heads/transfusion_head.py
(TransFusionHead: query init via peak-NMS heatmap top-k :151-218, Hungarian
set assignment + losses :235-383, encode/decode :384-455),
model_utils/transfusion_utils.py (PositionEmbeddingLearned:10-26,
post-norm TransformerDecoderLayer:29-128 — note the cross-attention VALUE
also carries the key pos-embed, clip_sigmoid:5-7) and
dense_heads/target_assigner/hungarian_assigner.py (focal/L1-bev/-IoU3D
costs:55-120), pcdet/utils/loss_utils.py GaussianFocalLoss:577-608.

TPU-first: the whole head — peak NMS, exact top-k proposals, decoder
attention, Hungarian assignment (optax.assignment, jittable), losses —
is one fixed-shape jitted graph; padded gt columns carry a constant large
cost so the rectangular assignment stays exact for the valid columns.
Radar datasets carry no velocity, so code_size is 8 (reference nuScenes: 10).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rotated_iou import boxes_iou3d
from ..ops.topk import exact_top_k


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class PositionEmbeddingLearned(nn.Module):
    """MLP pos-embed over (x, y): Dense -> BN -> ReLU -> Dense."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, xy, train: bool):
        h = nn.Dense(self.features, dtype=self.dtype, name="fc1")(xy)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(h)
        h = nn.relu(h)
        return nn.Dense(self.features, dtype=self.dtype, name="fc2")(h)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer; value in cross-attn carries the key pos."""

    features: int
    num_heads: int
    ffn: int
    dtype: object = None

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool):
        qe = PositionEmbeddingLearned(
            self.features, dtype=self.dtype, name="self_posembed"
        )(query_pos, train)
        ke = PositionEmbeddingLearned(
            self.features, dtype=self.dtype, name="cross_posembed"
        )(key_pos, train)

        q = query + qe
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.features,
            out_features=self.features, dtype=self.dtype, name="self_attn",
        )(q, q, q)
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(query + sa)

        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.features,
            out_features=self.features, dtype=self.dtype, name="cross_attn",
        )(query + qe, key + ke, key + ke)
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(query + ca)

        f = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(query)
        f = nn.Dense(self.features, dtype=self.dtype, name="linear2")(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(query + f)


class _Branch(nn.Module):
    """Per-query prediction branch: Dense(64)+BN+ReLU -> Dense(out)."""

    out: int
    hidden: int = 64
    init_bias: float | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="fc")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(h)
        h = nn.relu(h)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None else nn.initializers.zeros_init()
        )
        return nn.Dense(
            self.out, bias_init=bias_init, dtype=self.dtype, name="out"
        )(h).astype(jnp.float32)


class TransFusionHead(nn.Module):
    """Heatmap-initialized query decoder head (single decoder layer).

    Returns dict with dense_heatmap (B, H, W, C), per-query heatmap
    (B, P, C), center (B, P, 2) in feature coords, height (B, P, 1),
    dim (B, P, 3) log, rot (B, P, 2) (sin, cos), query_labels (B, P),
    query_heatmap_score (B, P, C), query_pos (B, P, 2).
    """

    num_class: int
    hidden: int = 128
    num_proposals: int = 200
    num_heads: int = 8
    ffn: int = 256
    nms_kernel_size: int = 3
    # classes exempt from peak pooling, per TARGET_ASSIGNER_CONFIG.DATASET
    # (predict:168-176): nuScenes (8, 9), Waymo (1, 2), anything else —
    # incl. the shipped VoD/TJ4D configs — pools ALL classes (empty)
    no_pool_classes: Tuple[int, ...] = ()
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool):
        b, h, w, _ = feats.shape
        lidar_feat = nn.Conv(
            self.hidden, (3, 3), padding=1, dtype=self.dtype, name="shared_conv"
        )(feats)

        # heatmap head: BasicBlock2D + 3x3 conv
        hm = nn.Conv(
            self.hidden, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="hm_conv1",
        )(lidar_feat)
        hm = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="hm_bn",
        )(hm)
        hm = nn.relu(hm)
        dense_heatmap = nn.Conv(
            self.num_class, (3, 3), padding=1, dtype=self.dtype, name="hm_out"
        )(hm).astype(jnp.float32)

        # peak NMS: interior max-pool, zero border (predict:161-176); the
        # stop_gradient mirrors the reference's .detach()
        heat = jax.lax.stop_gradient(jax.nn.sigmoid(dense_heatmap))
        pad = self.nms_kernel_size // 2
        inner = nn.max_pool(
            heat, window_shape=(self.nms_kernel_size,) * 2, strides=(1, 1),
            padding="VALID",
        )
        local_max = jnp.pad(inner, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        for c in self.no_pool_classes:
            if c < self.num_class:
                local_max = local_max.at[..., c].set(heat[..., c])
        peaks = heat * (heat == local_max)

        # top num_proposals over (C, H*W) flattened as c * HW + pos
        # (clamped when the feature map has fewer cells than proposals —
        # tiny smoke grids)
        p_eff = min(self.num_proposals, self.num_class * h * w)
        flat = peaks.transpose(0, 3, 1, 2).reshape(b, -1)
        scores, idx = jax.vmap(lambda s: exact_top_k(s, p_eff))(flat)
        query_labels = idx // (h * w)
        spatial = idx % (h * w)

        feat_flat = lidar_feat.reshape(b, h * w, self.hidden)
        query_feat = jnp.take_along_axis(
            feat_flat, spatial[..., None], axis=1
        )
        one_hot = jax.nn.one_hot(query_labels, self.num_class,
                                 dtype=query_feat.dtype)
        query_feat = query_feat + nn.Dense(
            self.hidden, dtype=self.dtype, name="class_encoding"
        )(one_hot)

        # (x, y) positions at cell centers (create_2D_grid adds 0.5)
        ys = (spatial // w).astype(jnp.float32) + 0.5
        xs = (spatial % w).astype(jnp.float32) + 0.5
        query_pos = jnp.stack([xs, ys], axis=-1)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        bev_pos = jnp.stack([gx + 0.5, gy + 0.5], -1).reshape(1, h * w, 2)
        bev_pos = jnp.broadcast_to(bev_pos, (b, h * w, 2))

        query_feat = TransformerDecoderLayer(
            self.hidden, self.num_heads, self.ffn, dtype=self.dtype,
            name="decoder",
        )(query_feat, feat_flat, query_pos, bev_pos, train)

        center = _Branch(2, dtype=self.dtype, name="center")(query_feat, train)
        center = center + query_pos
        height = _Branch(1, dtype=self.dtype, name="height")(query_feat, train)
        dim = _Branch(3, dtype=self.dtype, name="dim")(query_feat, train)
        rot = _Branch(2, dtype=self.dtype, name="rot")(query_feat, train)
        q_hm = _Branch(self.num_class, init_bias=-2.19, dtype=self.dtype,
                       name="heatmap")(query_feat, train)

        # gathered from the POST-peak-NMS map (predict:214-217 gathers the
        # zeroed `heatmap`, not the raw sigmoid): a class's score at a
        # query cell is nonzero only where that class also peaks there
        q_hm_score = jnp.take_along_axis(
            peaks.transpose(0, 3, 1, 2).reshape(b, self.num_class, h * w),
            spatial[:, None, :], axis=-1,
        ).transpose(0, 2, 1)  # (B, P, C)

        return {
            "dense_heatmap": dense_heatmap,
            "heatmap": q_hm,
            "center": center,
            "height": height,
            "dim": dim,
            "rot": rot,
            "query_labels": query_labels,
            "query_heatmap_score": q_hm_score,
            "query_pos": query_pos,
        }


# ---------------------------------------------------------------------------
# Box encode / decode
# ---------------------------------------------------------------------------

def encode_transfusion_boxes(boxes, pc_range, voxel_size, stride):
    """(... , 7) lidar boxes -> (..., 8) targets (encode_bbox:384-396)."""
    cx = (boxes[..., 0] - pc_range[0]) / (voxel_size[0] * stride)
    cy = (boxes[..., 1] - pc_range[1]) / (voxel_size[1] * stride)
    safe_dims = jnp.maximum(boxes[..., 3:6], 1e-6)
    return jnp.concatenate(
        [cx[..., None], cy[..., None], boxes[..., 2:3], jnp.log(safe_dims),
         jnp.sin(boxes[..., 6:7]), jnp.cos(boxes[..., 6:7])], axis=-1
    )


def decode_transfusion_boxes(preds, pc_range, voxel_size, stride):
    """Per-query boxes (B, P, 7) from branch outputs (decode_bbox:397-420)."""
    cx = preds["center"][..., 0] * stride * voxel_size[0] + pc_range[0]
    cy = preds["center"][..., 1] * stride * voxel_size[1] + pc_range[1]
    dims = jnp.exp(jnp.clip(preds["dim"], -10.0, 10.0))
    angle = jnp.arctan2(preds["rot"][..., 0], preds["rot"][..., 1])
    return jnp.stack(
        [cx, cy, preds["height"][..., 0], dims[..., 0], dims[..., 1],
         dims[..., 2], angle], axis=-1
    )


# ---------------------------------------------------------------------------
# Hungarian set assignment (jittable)
# ---------------------------------------------------------------------------

def hungarian_match(pred_boxes, pred_logits, gt_boxes, gt_labels, gt_valid,
                    pc_range, cls_weight=0.15, reg_weight=0.25,
                    iou_weight=0.25, alpha=0.25, gamma=2.0):
    """Assign gts to proposals by minimal (focal + L1-bev + -IoU3D) cost.

    hungarian_assigner.py:61-120; padded gt columns get a CONSTANT large
    cost, which cannot distort the valid columns' optimum, and their matches
    are dropped afterwards. Returns (matched_gt (P,), pos (P,) bool, iou (P,)).
    """
    import optax

    p = jax.nn.sigmoid(pred_logits)  # (P, C)
    eps = 1e-12
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos_cost = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    cls_cost = (
        jnp.take_along_axis(pos_cost, gt_labels[None, :], axis=1)
        - jnp.take_along_axis(neg_cost, gt_labels[None, :], axis=1)
    ) * cls_weight  # (P, M)

    span = jnp.asarray(pc_range[3:5]) - jnp.asarray(pc_range[0:2])
    nb = (pred_boxes[:, :2] - jnp.asarray(pc_range[0:2])) / span
    ng = (gt_boxes[:, :2] - jnp.asarray(pc_range[0:2])) / span
    reg_cost = jnp.sum(jnp.abs(nb[:, None] - ng[None, :]), -1) * reg_weight

    iou = boxes_iou3d(pred_boxes, gt_boxes)  # (P, M)
    cost = cls_cost + reg_cost - iou * iou_weight
    big = 1e4
    cost = jnp.where(gt_valid[None, :], cost, big)

    rows, cols = optax.assignment.hungarian_algorithm(cost)
    # rows: matched proposal per assignment slot; cols: matched gt index
    matched_gt = jnp.full((pred_boxes.shape[0],), -1, jnp.int32)
    keep = gt_valid[cols]
    matched_gt = matched_gt.at[rows].set(
        jnp.where(keep, cols.astype(jnp.int32), -1)
    )
    pos = matched_gt >= 0
    safe = jnp.maximum(matched_gt, 0)
    iou_per_prop = jnp.take_along_axis(iou, safe[:, None], axis=1)[:, 0]
    return matched_gt, pos, jnp.where(pos, iou_per_prop, 0.0)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def gaussian_focal_loss(pred_sigmoid, gt, alpha=2.0, gamma=4.0):
    """Penalty-reduced focal on a gaussian heatmap (GaussianFocalLoss:577-608),
    summed (caller normalizes by #peaks)."""
    eps = 1e-12
    pos = (gt == 1.0).astype(pred_sigmoid.dtype)
    neg_w = jnp.power(1 - gt, gamma)
    pos_l = -jnp.log(pred_sigmoid + eps) * jnp.power(1 - pred_sigmoid, alpha) * pos
    neg_l = -jnp.log(1 - pred_sigmoid + eps) * jnp.power(pred_sigmoid, alpha) * neg_w
    return jnp.sum(pos_l + neg_l)


def transfusion_loss(preds: Dict, gt_boxes: jnp.ndarray, num_class: int,
                     pc_range, voxel_size, stride,
                     feature_map_hw: Tuple[int, int],
                     cls_weight=1.0, bbox_weight=0.25, hm_weight=1.0,
                     code_weights: Sequence[float] = (1.0,) * 8,
                     gaussian_overlap=0.1, min_radius=2):
    """Total TransFusion loss (loss:342-383). gt_boxes (B, M, 8) padded."""
    from .center_head import center_targets

    b = gt_boxes.shape[0]
    gt_valid = gt_boxes[..., -1] > 0
    gt_labels = jnp.maximum(gt_boxes[..., -1].astype(jnp.int32) - 1, 0)

    pred_boxes = decode_transfusion_boxes(preds, pc_range, voxel_size, stride)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    logits_sg = jax.lax.stop_gradient(preds["heatmap"])

    matched_gt, pos, ious = jax.vmap(
        lambda pb, pl, gb, gl, gv: hungarian_match(
            pb, pl, gb, gl, gv, pc_range
        )
    )(pred_boxes, logits_sg, gt_boxes[..., :7], gt_labels, gt_valid)
    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

    # dense heatmap loss (int-centered gaussians, same drawing as CenterPoint)
    targets = center_targets(
        gt_boxes, num_class, feature_map_hw, stride, pc_range, voxel_size,
        gaussian_overlap=gaussian_overlap, min_radius=min_radius,
    )
    hm_pred = jnp.clip(jax.nn.sigmoid(preds["dense_heatmap"]), 1e-4, 1 - 1e-4)
    n_peaks = jnp.maximum(jnp.sum((targets["heatmap"] == 1.0)), 1.0)
    loss_hm = gaussian_focal_loss(hm_pred, targets["heatmap"]) / n_peaks

    # proposal classification: one-hot of matched gt label, bg all-zero
    safe = jnp.maximum(matched_gt, 0)
    tgt_label = jnp.take_along_axis(gt_labels, safe, axis=1)
    onehot = jax.nn.one_hot(tgt_label, num_class) * pos[..., None]
    p = jnp.clip(jax.nn.sigmoid(preds["heatmap"]), 1e-6, 1 - 1e-6)
    pt = onehot * p + (1 - onehot) * (1 - p)
    focal = -jnp.power(1 - pt, 2.0) * jnp.log(pt)
    alpha_w = onehot * 0.25 + (1 - onehot) * 0.75
    loss_cls = jnp.sum(alpha_w * focal) / num_pos

    # bbox L1 on encoded targets at matched proposals
    tgt_boxes = jnp.take_along_axis(
        gt_boxes[..., :7], safe[..., None], axis=1
    )
    enc = encode_transfusion_boxes(tgt_boxes, pc_range, voxel_size, stride)
    pred_enc = jnp.concatenate(
        [preds["center"], preds["height"], preds["dim"], preds["rot"]], -1
    )
    cw = jnp.asarray(code_weights, jnp.float32)
    l1 = jnp.abs(pred_enc - enc) * pos[..., None] * cw
    loss_bbox = jnp.sum(l1) / num_pos

    total = loss_hm * hm_weight + loss_cls * cls_weight + loss_bbox * bbox_weight
    tb = {
        "loss_heatmap": loss_hm, "loss_cls_trans": loss_cls,
        "loss_bbox": loss_bbox,
        "matched_ious": jnp.sum(ious) / num_pos,
    }
    return total, tb


def transfusion_get_boxes(preds: Dict, pc_range, voxel_size, stride,
                          score_thresh: float,
                          post_center_range) -> Dict[str, jnp.ndarray]:
    """Fixed-shape final boxes (get_bboxes:455-...): score = sigmoid(q_hm)
    * query_heatmap_score gated to the query's class."""
    boxes = decode_transfusion_boxes(preds, pc_range, voxel_size, stride)
    one_hot = jax.nn.one_hot(preds["query_labels"],
                             preds["heatmap"].shape[-1])
    score = jax.nn.sigmoid(preds["heatmap"]) * preds["query_heatmap_score"]
    scores = jnp.sum(score * one_hot, axis=-1)  # (B, P)
    labels = preds["query_labels"] + 1
    lim = jnp.asarray(post_center_range, jnp.float32)
    ok = jnp.all(boxes[..., :3] >= lim[:3], -1)
    ok &= jnp.all(boxes[..., :3] <= lim[3:], -1)
    ok &= scores > score_thresh
    return {"boxes": boxes, "scores": scores, "labels": labels, "valid": ok}
