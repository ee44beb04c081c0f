"""Anchor generation and axis-aligned target assignment (jnp, on-device).

TPU-native equivalents of AnchorGenerator
(pcdet/models/dense_heads/target_assigner/anchor_generator.py:4-60) and
AxisAlignedTargetAssigner
(pcdet/.../axis_aligned_target_assigner.py:8-210). The per-image Python loop
with dynamic gt counts becomes a fixed-shape vmap over padded gt boxes; the
force-match / threshold-match / background priority logic is reproduced with
masks. Assignment runs inside the jitted train step (the reference ran its
IoU on GPU too, but synchronously per item).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.box_utils import boxes3d_nearest_bev_iou
from ..utils.box_coder import ResidualCoder


def generate_anchors(anchor_configs: Sequence[dict], grid_size, pc_range):
    """Dense grid anchors per class (numpy; static).

    anchor_generator.py:17-60 with align_center False: stride = extent /
    (grid - 1), offsets 0, anchor z = bottom height + h/2. Returns a list of
    (nz=1, ny, nx, n_size, n_rot, 7) arrays plus num_anchors_per_location.
    """
    all_anchors = []
    num_per_loc = []
    for cfg in anchor_configs:
        sizes = np.asarray(cfg["anchor_sizes"], np.float32)  # (ns, 3)
        rotations = np.asarray(cfg["anchor_rotations"], np.float32)  # (nr,)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float32)  # (nh,)
        stride = cfg.get("feature_map_stride", 1)
        gx = int(grid_size[0]) // stride
        gy = int(grid_size[1]) // stride
        num_per_loc.append(len(rotations) * len(sizes) * len(heights))
        if cfg.get("align_center", False):
            x_stride = (pc_range[3] - pc_range[0]) / gx
            y_stride = (pc_range[4] - pc_range[1]) / gy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pc_range[3] - pc_range[0]) / (gx - 1)
            y_stride = (pc_range[4] - pc_range[1]) / (gy - 1)
            x_off, y_off = 0.0, 0.0
        # accumulate in float64 then cast, matching torch.arange semantics
        # (anchor_generator.py:30-35) — float32 accumulation breaks exact
        # coordinate symmetry, which flips force-match ties in the assigner
        x_shifts = np.arange(
            pc_range[0] + x_off, pc_range[3] + 1e-5, x_stride
        ).astype(np.float32)
        y_shifts = np.arange(
            pc_range[1] + y_off, pc_range[4] + 1e-5, y_stride
        ).astype(np.float32)
        z_shifts = heights
        nx, ny, nz = len(x_shifts), len(y_shifts), len(z_shifts)
        ns, nr = len(sizes), len(rotations)
        xg, yg, zg = np.meshgrid(x_shifts, y_shifts, z_shifts, indexing="ij")
        centers = np.stack([xg, yg, zg], axis=-1)  # (nx, ny, nz, 3)
        anchors = np.broadcast_to(
            centers[:, :, :, None, None, :], (nx, ny, nz, ns, nr, 3)
        )
        size_b = np.broadcast_to(
            sizes[None, None, None, :, None, :], (nx, ny, nz, ns, nr, 3)
        )
        rot_b = np.broadcast_to(
            rotations[None, None, None, None, :, None], (nx, ny, nz, ns, nr, 1)
        )
        anchors = np.concatenate([anchors, size_b, rot_b], axis=-1)
        anchors = np.transpose(anchors, (2, 1, 0, 3, 4, 5)).copy()  # (nz, ny, nx, ...)
        anchors[..., 2] += anchors[..., 5] / 2  # bottom -> center z
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors, num_per_loc


def flatten_anchors(all_anchors: List[np.ndarray]) -> np.ndarray:
    """Concat class anchor sets along the size axis then flatten to (A, 7).

    Matches anchor ordering of torch.cat(anchors, dim=-3).view(-1, 7)
    (anchor_head_template.py:181-186): index = (((z*ny + y)*nx + x)*n_cls_sets
    + set)*n_rot + rot.
    """
    cat = np.concatenate(all_anchors, axis=-3)
    return cat.reshape(-1, cat.shape[-1])


def flatten_anchors_multihead(all_anchors: List[np.ndarray]) -> np.ndarray:
    """Multihead anchor order: per-class blocks, anchor-type-major.

    Matches torch.cat([a.permute(3, 4, 0, 1, 2, 5).view(-1, C) for a in
    anchors]) (anchor_head_template.generate_predicted_boxes:240-241 with
    use_multihead): within each class block, index =
    (((ns*nr + nr)*nz + z)*ny + y)*nx + x.
    """
    flat = [
        np.transpose(a, (3, 4, 0, 1, 2, 5)).reshape(-1, a.shape[-1])
        for a in all_anchors
    ]
    return np.concatenate(flat, axis=0)


def _assign_single_class(anchors, gt_boxes, gt_mask, gt_classes, matched_thr,
                         unmatched_thr, box_coder: ResidualCoder):
    """Assign one class's anchors for one image (static shapes).

    anchors: (A, 7); gt_boxes: (M, 7); gt_mask: (M,) bool (this class & valid);
    gt_classes: (M,) int. Returns labels (A,) int32, bbox_targets (A, code),
    reg_weights (A,). Mirrors assign_targets_single:137-210.
    """
    a = anchors.shape[0]
    iou = boxes3d_nearest_bev_iou(anchors, gt_boxes)  # (A, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)

    anchor_max = jnp.max(iou, axis=1)
    anchor_arg = jnp.argmax(iou, axis=1)

    gt_max = jnp.max(iou, axis=0)  # (M,)
    # empty gt (max iou == 0) must not force-match (reference sets it to -1)
    force_gt = gt_mask & (gt_max > 0)
    force_anchor = jnp.any((iou == gt_max[None, :]) & force_gt[None, :], axis=1)

    pos = anchor_max >= matched_thr
    bg = anchor_max < unmatched_thr
    cls_of_anchor = gt_classes[anchor_arg]

    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(bg, 0, labels)
    labels = jnp.where(pos | force_anchor, cls_of_anchor, labels)
    # no valid gt for this class in this image -> all background (ref :190)
    has_gt = jnp.any(gt_mask)
    labels = jnp.where(has_gt, labels, 0)

    fg = labels > 0
    targets = box_coder.encode(gt_boxes[anchor_arg], anchors)
    targets = jnp.where(fg[:, None], targets, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, targets, reg_weights


class TargetAssigner:
    """Axis-aligned target assigner over padded gt boxes, fully vectorized."""

    def __init__(self, anchor_configs, grid_size, pc_range, class_names,
                 box_coder: ResidualCoder | None = None,
                 use_multihead: bool = False):
        self.class_names = list(class_names)
        self.box_coder = box_coder or ResidualCoder()
        self.anchor_configs = list(anchor_configs)
        self.use_multihead = use_multihead
        all_anchors, num_per_loc = generate_anchors(
            anchor_configs, grid_size, pc_range
        )
        if self.box_coder.code_size > 7:
            # pad anchors to the coder width with zeros (e.g. nuScenes
            # velocity anchors), anchor_head_template.generate_anchors:46-50
            pad = self.box_coder.code_size - 7
            all_anchors = [
                np.concatenate(
                    [a, np.zeros(a.shape[:-1] + (pad,), np.float32)], axis=-1
                )
                for a in all_anchors
            ]
        self.anchor_dim = all_anchors[0].shape[-1]
        self.per_class_anchors = [
            jnp.asarray(a.reshape(-1, self.anchor_dim)) for a in all_anchors]
        self.anchor_shapes = [a.shape for a in all_anchors]
        self.num_per_loc = [int(n) for n in num_per_loc]
        self.num_anchors_per_location = int(np.sum(num_per_loc))
        self.flat_anchors = jnp.asarray(
            flatten_anchors_multihead(all_anchors) if use_multihead
            else flatten_anchors(all_anchors)
        )
        self.matched = [c["matched_threshold"] for c in anchor_configs]
        self.unmatched = [c["unmatched_threshold"] for c in anchor_configs]

    def __call__(self, gt_boxes):
        """gt_boxes: (B, M, 8) padded, class id in the last column (0 = pad).

        Returns dict with box_cls_labels (B, A), box_reg_targets (B, A, code),
        reg_weights (B, A) in the flattened anchor order of flatten_anchors.
        """
        # all box columns except the trailing class id (7-dof, or 9-dof with
        # velocities for the nuScenes-style multihead coder)
        gt7 = gt_boxes[..., :-1]
        gt_cls = gt_boxes[..., -1].astype(jnp.int32)

        per_class = []
        for ci, anchors in enumerate(self.per_class_anchors):
            # anchor-set order may differ from CLASS_NAMES order (e.g. TJ4D
            # lists Car, Truck, Ped, Cyc); match by class *name*
            # (axis_aligned_target_assigner.py:62-67)
            class_id = self.class_names.index(self.anchor_configs[ci]["class_name"]) + 1
            gt_mask = gt_cls == class_id

            def one(gt_b, m_b, c_b, anchors=anchors, ci=ci):
                return _assign_single_class(
                    anchors, gt_b, m_b, c_b,
                    self.matched[ci], self.unmatched[ci], self.box_coder,
                )

            labels, targets, weights = jax.vmap(one)(gt7, gt_mask, gt_cls)
            per_class.append((labels, targets, weights))

        b = gt_boxes.shape[0]
        code = self.box_coder.code_size
        labels_c, targets_c, weights_c = [], [], []
        if self.use_multihead:
            # per-class blocks, anchor-type-major within each block (the
            # multihead flattening of axis_aligned_target_assigner.py:44-49)
            for (labels, targets, weights), shape in zip(
                    per_class, self.anchor_shapes):
                nz, ny, nx, ns, nr, _ = shape

                def mh(x, extra=()):
                    x = x.reshape(b, nz, ny, nx, ns, nr, *extra)
                    x = jnp.transpose(
                        x, (0, 4, 5, 1, 2, 3) + tuple(
                            6 + i for i in range(len(extra))))
                    return x.reshape((b, -1) + tuple(extra))

                labels_c.append(mh(labels))
                targets_c.append(mh(targets, (code,)))
                weights_c.append(mh(weights))
            box_cls_labels = jnp.concatenate(labels_c, axis=1)
            box_reg_targets = jnp.concatenate(targets_c, axis=1)
            reg_weights = jnp.concatenate(weights_c, axis=1)
            return {
                "box_cls_labels": box_cls_labels,
                "box_reg_targets": box_reg_targets,
                "reg_weights": reg_weights,
            }
        # interleave classes per spatial location: (B, nz*ny*nx, ncls, nr[*ns])
        for (labels, targets, weights), shape in zip(per_class, self.anchor_shapes):
            nz, ny, nx, ns, nr, _ = shape
            labels_c.append(labels.reshape(b, nz * ny * nx, ns * nr))
            targets_c.append(targets.reshape(b, nz * ny * nx, ns * nr, code))
            weights_c.append(weights.reshape(b, nz * ny * nx, ns * nr))
        box_cls_labels = jnp.concatenate(labels_c, axis=-1).reshape(b, -1)
        box_reg_targets = jnp.concatenate(targets_c, axis=-2).reshape(b, -1, code)
        reg_weights = jnp.concatenate(weights_c, axis=-1).reshape(b, -1)
        return {
            "box_cls_labels": box_cls_labels,
            "box_reg_targets": box_reg_targets,
            "reg_weights": reg_weights,
        }
