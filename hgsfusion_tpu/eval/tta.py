"""Test-time augmentation harness.

Reference: tools/eval_utils/eval_utils.py TTA class (:15-184) +
eval_one_epoch_tta (:196-313): for each B=1 frame, build `tta_num` randomly
augmented copies (world flip -> image-flip-fusion -> rotation -> scaling,
each with fresh random draws), run the model on every copy, and evaluate each
copy's predictions against that copy's *augmented* gt (there is no
inverse-transform ensembling in the reference; the val set is effectively
evaluated tta_num times).

Here the augmentations operate on the static-padded sample arrays; padded
rows are zeros and stay ignorable (class 0 gt, invalid points).
"""
from __future__ import annotations

import numpy as np

from ..utils.common import rotate_points_along_z


def _flip_x(sample, rng):
    enable = bool(rng.choice([False, True]))
    if enable:
        sample["points"][:, 1] = -sample["points"][:, 1]
        gt = sample["gt_boxes"]
        gt[:, 1] = -gt[:, 1]
        gt[:, 6] = -gt[:, 6]
    sample["flip_x"] = enable
    return sample


def _image_flip_fusion(sample, rng, calib):
    if not sample.get("flip_x", False):
        return sample
    if "images" not in sample:  # lidar/radar-only configs: nothing to flip
        return sample
    img = sample["images"]
    w = img.shape[1]
    sample["images"] = np.ascontiguousarray(np.fliplr(img))
    gt = sample["gt_boxes"]
    valid = gt[:, -1] > 0
    if valid.any():
        img_pts, img_depth = calib.lidar_to_img(gt[valid, :3])
        img_pts[:, 0] = w - img_pts[:, 0]
        rect = calib.img_to_rect(img_pts[:, 0], img_pts[:, 1], img_depth)
        gt[valid, :3] = calib.rect_to_lidar(rect)
        gt[valid, 6] = -gt[valid, 6]
    return sample


def _rotation(sample, rng, rot_range=(-0.3926, 0.3926)):
    rot = rng.uniform(*rot_range)
    pts = sample["points"]
    pts[:, :] = rotate_points_along_z(pts[None], np.array([rot]))[0]
    gt = sample["gt_boxes"]
    gt[:, 0:3] = rotate_points_along_z(gt[None, :, 0:3], np.array([rot]))[0]
    gt[:, 6] += rot
    sample["noise_rot"] = rot
    return sample


def _scaling(sample, rng, scale_range=(0.95, 1.05)):
    scale = rng.uniform(*scale_range)
    sample["points"][:, :3] *= scale
    sample["gt_boxes"][:, :6] *= scale
    sample["noise_scale"] = scale
    return sample


def make_tta_variants(sample, calib, tta_num: int = 4, seed: int = 0):
    """One padded sample dict -> list of `tta_num` augmented copies, each with
    an updated lidar_aug_matrix (for BEV_AUG undo in the frustum grid)."""
    from ..datasets.dataset import DatasetTemplate

    rng = np.random.RandomState(seed)
    variants = []
    for _ in range(tta_num):
        s = {
            k: (v.copy() if isinstance(v, np.ndarray) else v)
            for k, v in sample.items()
        }
        s.pop("lidar_aug_matrix", None)
        s.pop("flip_x", None)
        s.pop("noise_rot", None)
        s.pop("noise_scale", None)
        s = _flip_x(s, rng)
        s = _image_flip_fusion(s, rng, calib)
        s = _rotation(s, rng)
        s = _scaling(s, rng)
        s = DatasetTemplate.set_lidar_aug_matrix(s)
        for k in ("flip_x", "noise_rot", "noise_scale"):
            s.pop(k, None)
        variants.append(s)
    return variants
