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
        box_preds.reshape(b, a, -1),
        jnp.broadcast_to(anchors[None], (b, a, anchors.shape[-1]))
    )
    if dir_preds is not None:
        dir_labels = jnp.argmax(dir_preds.reshape(b, a, num_dir_bins), axis=-1)
        period = 2 * np.pi / num_dir_bins
        dir_rot = limit_period(batch_box[..., 6] - dir_offset, dir_limit_offset, period)
        heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
        batch_box = batch_box.at[..., 6].set(heading)
    return batch_cls, batch_box


def decode_selected_boxes(box_rows, dir_rows, anchor_rows,
                          box_coder: ResidualCoder,
                          dir_offset: float = 0.78539,
                          dir_limit_offset: float = 0.0,
                          num_dir_bins: int = 2):
    """generate_predicted_boxes' box decode restricted to PRE-SELECTED
    anchor rows (any leading shape). Per-anchor independent, so decoding
    the top-k rows after score selection is exactly the full decode
    followed by a gather — post_process uses this to decode 4 k rows
    instead of 614 k (the full decode was ~40% of the post stage,
    `_bench_post.py` round 4)."""
    dec = box_coder.decode(box_rows, anchor_rows)
    if dir_rows is not None:
        dir_labels = jnp.argmax(dir_rows, axis=-1)
        period = 2 * np.pi / num_dir_bins
        dir_rot = limit_period(dec[..., 6] - dir_offset, dir_limit_offset,
                               period)
        heading = (dir_rot + dir_offset
                   + period * dir_labels.astype(dec.dtype))
        dec = dec.at[..., 6].set(heading)
    return dec


# ---------------------------------------------------------------------------
# AnchorHeadMulti (grouped multi-head, nuScenes-style)
# ---------------------------------------------------------------------------

class SingleRPNHead(nn.Module):
    """One class-group head (anchor_head_multi.SingleHead:9-148).

    With the nuScenes RPN_HEAD_CFGS the inherited per-head BaseBEVBackbone
    has no layers (rpn_head_cfg carries only HEAD_CLS_NAME), so it is the
    identity and is omitted here. Channel layouts replicate the reference
    exactly, including the separate-reg quirk: the per-part conv outputs are
    concatenated part-major ([reg:A*2 | height:A*1 | ...]) but then
    REinterpreted anchor-major by `.view(-1, A, code, H, W)`
    (anchor_head_multi.py:118-126) — train and decode share the same view,
    so the permutation is consistent; we reproduce it bit-for-bit.
    """

    num_class: int  # classes served by this head
    num_anchors_per_location: int
    code_size: int
    separate_reg_list: tuple  # e.g. ("reg:2","height:1","size:3","angle:2","velo:2")
    num_middle_conv: int = 1
    num_middle_filter: int = 64
    num_dir_bins: int = 2
    use_dir: bool = False
    dtype: object = jnp.float32

    def _middle(self, x, prefix, train):
        for k in range(self.num_middle_conv):
            x = nn.Conv(
                self.num_middle_filter, (3, 3), use_bias=False,
                dtype=self.dtype, name=f"{prefix}_mid{k}_conv",
            )(x)
            # plain BatchNorm2d in the reference (anchor_head_multi.py:35,
            # 56): torch momentum 0.1 -> flax 0.9; only the shared_conv BN
            # is eps=1e-3/momentum=0.01 (:165)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=f"{prefix}_mid{k}_bn",
            )(x)
            x = nn.relu(x)
        return x

    def _to_multihead(self, x, per_anchor):
        """(B, H, W, A*F) channel-major -> (B, A*H*W, F) anchor-major rows
        (the torch .view(-1, A, F, H, W).permute(0,1,3,4,2) flattening)."""
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, self.num_anchors_per_location, per_anchor)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))
        return x.reshape(b, -1, per_anchor)

    @nn.compact
    def __call__(self, feats, train: bool):
        a = self.num_anchors_per_location
        pi = 0.01
        cls_in = self._middle(feats, "cls", train)
        cls_preds = nn.Conv(
            a * self.num_class, (3, 3),
            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
            dtype=self.dtype, name="conv_cls",
        )(cls_in)

        parts = []
        for reg_cfg in self.separate_reg_list:
            reg_name, reg_ch = reg_cfg.split(":")
            x = self._middle(feats, f"reg_{reg_name}", train)
            parts.append(nn.Conv(
                a * int(reg_ch), (3, 3),
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"),
                dtype=self.dtype, name=f"conv_{reg_name}",
            )(x))
        box_preds = jnp.concatenate(parts, axis=-1)  # part-major channels

        out = {
            "cls_preds": self._to_multihead(
                cls_preds.astype(jnp.float32), self.num_class),
            "box_preds": self._to_multihead(
                box_preds.astype(jnp.float32), self.code_size),
        }
        if self.use_dir:
            dir_preds = nn.Conv(
                a * self.num_dir_bins, (1, 1), dtype=self.dtype,
                name="conv_dir_cls",
            )(feats)
            out["dir_cls_preds"] = self._to_multihead(
                dir_preds.astype(jnp.float32), self.num_dir_bins)
        return out


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head anchor head (anchor_head_multi.AnchorHeadMulti).

    shared 3x3 conv -> one SingleRPNHead per class group; outputs per-head
    lists in the multihead anchor order (per-class blocks, anchor-major —
    flatten_anchors_multihead).
    """

    class_names: tuple  # all classes, CLASS_NAMES order
    rpn_head_cfgs: tuple  # tuple of class-name tuples
    num_per_loc: tuple  # anchors per location per class (CLASS_NAMES order)
    code_size: int = 10  # ResidualCoder(code_size=9, sincos) -> 10
    shared_conv_filters: int = 64
    separate_reg_list: tuple = (
        "reg:2", "height:1", "size:3", "angle:2", "velo:2")
    num_middle_conv: int = 1
    num_middle_filter: int = 64
    num_dir_bins: int = 2
    use_dir: bool = False
    separate_multihead: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        if self.shared_conv_filters:
            feats = nn.Conv(
                self.shared_conv_filters, (3, 3), use_bias=False,
                dtype=self.dtype, name="shared_conv",
            )(feats)
            feats = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=jnp.float32, name="shared_bn",
            )(feats)
            feats = nn.relu(feats)

        head_outs = []
        names = list(self.class_names)
        for hi, head_cls in enumerate(self.rpn_head_cfgs):
            a = sum(self.num_per_loc[names.index(c)] for c in head_cls)
            nc = len(head_cls) if self.separate_multihead else len(names)
            head_outs.append(SingleRPNHead(
                num_class=nc, num_anchors_per_location=a,
                code_size=self.code_size,
                separate_reg_list=self.separate_reg_list,
                num_middle_conv=self.num_middle_conv,
                num_middle_filter=self.num_middle_filter,
                num_dir_bins=self.num_dir_bins, use_dir=self.use_dir,
                dtype=self.dtype, name=f"head_{hi}",
            )(feats, train))

        out = {
            "cls_preds": [h["cls_preds"] for h in head_outs],
            "box_preds": [h["box_preds"] for h in head_outs],
        }
        if self.use_dir:
            out["dir_cls_preds"] = [h["dir_cls_preds"] for h in head_outs]
        if not self.separate_multihead:
            out = {k: jnp.concatenate(v, axis=1) for k, v in out.items()}
        return out


def multihead_anchor_slices(class_names, rpn_head_cfgs, num_per_loc,
                            grid_hw):
    """Per-head (start, stop) slices into the multihead-flattened anchor
    axis, plus per-head 1-based label indices (head_label_indices)."""
    names = list(class_names)
    per_class = [n * grid_hw for n in num_per_loc]
    starts = np.concatenate([[0], np.cumsum(per_class)])
    slices, label_idx = [], []
    for head_cls in rpn_head_cfgs:
        cls_ids = [names.index(c) for c in head_cls]
        assert cls_ids == list(range(cls_ids[0], cls_ids[0] + len(cls_ids))), (
            "head classes must be contiguous in CLASS_NAMES order "
            "(reference RPN_HEAD_CFGS convention)")
        slices.append((int(starts[cls_ids[0]]),
                       int(starts[cls_ids[-1] + 1])))
        label_idx.append([i + 1 for i in cls_ids])
    return slices, label_idx


def anchor_head_multi_loss(preds, targets, assigner, loss_weights,
                           rpn_head_cfgs, grid_hw,
                           dir_offset: float = 0.78539,
                           num_dir_bins: int = 2,
                           separate_multihead: bool = True):
    """Multihead cls + reg (+dir) loss (anchor_head_multi.py:246-373).

    targets come from TargetAssigner(use_multihead=True) in the same
    per-class-block anchor order as the head outputs.
    """
    cls_preds = preds["cls_preds"]
    box_preds = preds["box_preds"]
    dir_preds = preds.get("dir_cls_preds")
    if not isinstance(cls_preds, (list, tuple)):
        cls_preds, box_preds = [cls_preds], [box_preds]
        dir_preds = [dir_preds] if dir_preds is not None else None

    labels = targets["box_cls_labels"]  # (B, A)
    reg_targets = targets["box_reg_targets"]
    b = labels.shape[0]
    num_class = len(assigner.class_names)

    pos = labels > 0
    neg = labels == 0
    cls_weights = (neg + 1.0 * pos).astype(jnp.float32)
    reg_weights = pos.astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(pos, axis=1, keepdims=True), 1.0, None)
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm
    cared = labels >= 0
    cls_targets = jnp.where(cared, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]

    slices, _ = multihead_anchor_slices(
        assigner.class_names, rpn_head_cfgs, assigner.num_per_loc, grid_hw)

    anchors = assigner.flat_anchors
    cls_loss = 0.0
    loc_loss = 0.0
    dir_loss = 0.0
    c_idx = 0
    for hi, (cp, bp) in enumerate(zip(cls_preds, box_preds)):
        s0, s1 = slices[hi]
        nc = cp.shape[-1]
        oh = one_hot[:, s0:s1]
        if separate_multihead:
            oh = oh[..., c_idx:c_idx + nc]
            c_idx += nc
        cls_loss = cls_loss + jnp.sum(sigmoid_focal_loss(
            cp, oh, cls_weights[:, s0:s1])) / b

        rt = reg_targets[:, s0:s1]
        # sin-difference only when a dir head exists (anchor_head_multi.py:
        # 341-346); with the sincos coder and no dir head, column 6 is a
        # cos-angle residual, not an angle — transforming it would be wrong
        if dir_preds is not None:
            bp_sin, rt_sin = add_sin_difference(bp, rt)
        else:
            bp_sin, rt_sin = bp, rt
        loc_loss = loc_loss + jnp.sum(weighted_smooth_l1(
            bp_sin, rt_sin, reg_weights[:, s0:s1],
            code_weights=loss_weights.get("code_weights"))) / b

        if dir_preds is not None:
            dir_targets = get_direction_target(
                jnp.broadcast_to(
                    anchors[None, s0:s1], (b, s1 - s0, anchors.shape[-1])),
                rt, dir_offset, num_dir_bins)
            w = pos.astype(jnp.float32)
            w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0, None)
            dir_loss = dir_loss + jnp.sum(weighted_cross_entropy(
                dir_preds[hi], dir_targets, w[:, s0:s1])) / b

    cls_loss = cls_loss * loss_weights["cls_weight"]
    loc_loss = loc_loss * loss_weights["loc_weight"]
    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss
    if dir_preds is not None:
        dir_loss = dir_loss * loss_weights["dir_weight"]
        tb["rpn_loss_dir"] = dir_loss
        total = total + dir_loss
    tb["rpn_loss"] = total
    return total, tb


def generate_predicted_boxes_multihead(preds, assigner, rpn_head_cfgs,
                                       grid_hw,
                                       dir_offset: float = 0.78539,
                                       dir_limit_offset: float = 0.0,
                                       num_dir_bins: int = 2):
    """Per-head decode (generate_predicted_boxes with use_multihead).

    Returns (cls_list, box_list, label_mapping): per-head sigmoid-ready
    logits (B, A_h, nc_h), decoded boxes (B, A_h, 7+extras), and the
    1-based global class ids of each head (multihead_label_mapping).
    """
    slices, label_idx = multihead_anchor_slices(
        assigner.class_names, rpn_head_cfgs, assigner.num_per_loc, grid_hw)
    anchors = assigner.flat_anchors
    cls_out, box_out = [], []
    dir_preds = preds.get("dir_cls_preds")
    for hi, (cp, bp) in enumerate(zip(preds["cls_preds"],
                                      preds["box_preds"])):
        s0, s1 = slices[hi]
        b = cp.shape[0]
        anchors_h = jnp.broadcast_to(
            anchors[None, s0:s1], (b, s1 - s0, anchors.shape[-1]))
        boxes = assigner.box_coder.decode(bp, anchors_h)
        if dir_preds is not None:
            dir_labels = jnp.argmax(dir_preds[hi], axis=-1)
            period = 2 * np.pi / num_dir_bins
            dir_rot = limit_period(
                boxes[..., 6] - dir_offset, dir_limit_offset, period)
            heading = (dir_rot + dir_offset
                       + period * dir_labels.astype(boxes.dtype))
            boxes = boxes.at[..., 6].set(heading)
        cls_out.append(cp)
        box_out.append(boxes)
    return cls_out, box_out, label_idx
