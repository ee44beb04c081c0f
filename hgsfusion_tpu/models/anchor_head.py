"""Anchor-based detection head: 1x1 convs, losses, box decoding.

TPU-native equivalent of AnchorHeadSingle / AnchorHeadTemplate
(pcdet/models/dense_heads/anchor_head_single.py:7-75,
anchor_head_template.py:11-275) and the loss library
(pcdet/utils/loss_utils.py: SigmoidFocalClassificationLoss:10,
WeightedSmoothL1Loss:76, WeightedCrossEntropyLoss:183).
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.common import limit_period
from ..utils.box_coder import ResidualCoder


class AnchorHeadSingle(nn.Module):
    """cls / box / dir 1x1 convs over the fused BEV (anchor_head_single.py:16-56).

    Output layouts (NHWC): cls (B, ny, nx, A*num_class), box (B, ny, nx,
    A*code_size), dir (B, ny, nx, A*num_dir_bins), where A anchors per
    location are ordered (class-set, rotation) to match the anchor flattening.
    """

    num_class: int = 3
    num_anchors_per_location: int = 6
    code_size: int = 7
    num_dir_bins: int = 2
    use_direction_classifier: bool = True

    @nn.compact
    def __call__(self, spatial_features_2d):
        pi = 0.01
        cls_preds = nn.Conv(
            self.num_anchors_per_location * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
            name="conv_cls",
        )(spatial_features_2d)
        box_preds = nn.Conv(
            self.num_anchors_per_location * self.code_size, (1, 1),
            kernel_init=nn.initializers.normal(stddev=0.001),
            name="conv_box",
        )(spatial_features_2d)
        out = {"cls_preds": cls_preds, "box_preds": box_preds}
        if self.use_direction_classifier:
            out["dir_cls_preds"] = nn.Conv(
                self.num_anchors_per_location * self.num_dir_bins, (1, 1),
                name="conv_dir_cls",
            )(spatial_features_2d)
        return out


# ---------------------------------------------------------------------------
# Losses (pure functions)
# ---------------------------------------------------------------------------

def sigmoid_focal_loss(logits, one_hot_targets, weights, alpha: float = 0.25,
                       gamma: float = 2.0):
    """Per-element sigmoid focal loss x anchor weights (loss_utils.py:10-74)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = one_hot_targets * alpha + (1 - one_hot_targets) * (1 - alpha)
    pt = one_hot_targets * (1.0 - pred_sigmoid) + (1.0 - one_hot_targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0, None) - logits * one_hot_targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return focal_weight * bce * weights[..., None]


def weighted_smooth_l1(pred, target, weights, code_weights=None,
                       beta: float = 1.0 / 9.0):
    """Code-weighted smooth-L1 x anchor weights (loss_utils.py:76-140)."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    return loss * weights[..., None]


def weighted_cross_entropy(logits, one_hot_targets, weights):
    """CE over the last axis x anchor weights (loss_utils.py:183-209)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(one_hot_targets * logp, axis=-1)
    return ce * weights


def add_sin_difference(boxes1, boxes2, dim: int = 6):
    """Encode angle residual as sin(a-b) (anchor_head_template.py:146-152)."""
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
    b1 = jnp.concatenate(
        [boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1
    )
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset: float, num_bins: int):
    """One-hot direction-bin targets (anchor_head_template.py:154-168)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    dir_cls = jnp.clip(dir_cls, 0, num_bins - 1)
    return jax.nn.one_hot(dir_cls, num_bins, dtype=reg_targets.dtype)


def anchor_head_loss(preds, targets, anchors, num_class: int,
                     loss_weights: dict, dir_offset: float = 0.78539,
                     num_dir_bins: int = 2):
    """Total RPN loss (cls + loc + dir) (anchor_head_template.py:101-223).

    preds: dict of NHWC head outputs; targets: TargetAssigner output;
    anchors: (A, 7) flat anchors. Returns (loss, tb_dict).
    """
    cls_preds = preds["cls_preds"]
    box_preds = preds["box_preds"]
    dir_preds = preds.get("dir_cls_preds")
    b = cls_preds.shape[0]

    box_cls_labels = targets["box_cls_labels"]  # (B, A)
    box_reg_targets = targets["box_reg_targets"]  # (B, A, 7)

    cared = box_cls_labels >= 0
    positives = box_cls_labels > 0
    negatives = box_cls_labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.clip(
        jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0, None
    )
    reg_weights = reg_weights / pos_normalizer
    cls_weights = cls_weights / pos_normalizer

    cls_targets = jnp.where(cared, box_cls_labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1, dtype=cls_preds.dtype)[..., 1:]
    cls_preds_flat = cls_preds.reshape(b, -1, num_class)
    cls_loss = (
        jnp.sum(sigmoid_focal_loss(cls_preds_flat, one_hot, cls_weights)) / b
    ) * loss_weights["cls_weight"]

    anchors_b = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
    box_preds_flat = box_preds.reshape(b, anchors.shape[0], -1)
    box_preds_sin, reg_targets_sin = add_sin_difference(box_preds_flat, box_reg_targets)
    loc_loss = (
        jnp.sum(
            weighted_smooth_l1(
                box_preds_sin, reg_targets_sin, reg_weights,
                code_weights=loss_weights.get("code_weights"),
            )
        )
        / b
    ) * loss_weights["loc_weight"]

    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss
    if dir_preds is not None:
        dir_targets = get_direction_target(
            anchors_b, box_reg_targets, dir_offset, num_dir_bins
        )
        dir_logits = dir_preds.reshape(b, anchors.shape[0], num_dir_bins)
        weights = positives.astype(jnp.float32)
        weights = weights / jnp.clip(
            jnp.sum(weights, axis=-1, keepdims=True), 1.0, None
        )
        dir_loss = (
            jnp.sum(weighted_cross_entropy(dir_logits, dir_targets, weights)) / b
        ) * loss_weights["dir_weight"]
        tb["rpn_loss_dir"] = dir_loss
        total = total + dir_loss
    tb["rpn_loss"] = total
    return total, tb


def generate_predicted_boxes(cls_preds, box_preds, dir_preds, anchors,
                             box_coder: ResidualCoder, num_class: int,
                             dir_offset: float = 0.78539,
                             dir_limit_offset: float = 0.0,
                             num_dir_bins: int = 2):
    """Decode head outputs to (B, A, num_class) scores + (B, A, 7) boxes.

    anchor_head_template.generate_predicted_boxes:225-272 incl. direction-bin
    heading correction via limit_period.
    """
    b = cls_preds.shape[0]
    a = anchors.shape[0]
    batch_cls = cls_preds.reshape(b, a, num_class)
    batch_box = box_coder.decode(
        box_preds.reshape(b, a, -1), jnp.broadcast_to(anchors[None], (b, a, 7))
    )
    if dir_preds is not None:
        dir_labels = jnp.argmax(dir_preds.reshape(b, a, num_dir_bins), axis=-1)
        period = 2 * np.pi / num_dir_bins
        dir_rot = limit_period(batch_box[..., 6] - dir_offset, dir_limit_offset, period)
        heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
        batch_box = batch_box.at[..., 6].set(heading)
    return batch_cls, batch_box
