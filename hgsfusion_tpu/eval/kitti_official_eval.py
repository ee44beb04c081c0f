"""Standard KITTI evaluation protocol (easy/moderate/hard).

Reference: pcdet/datasets/kitti/kitti_object_eval_python/eval.py (numba).
Difficulty rules: min bbox heights (40/25/25 px), max occlusion (0/1/2),
max truncation (.15/.3/.5); neighbor classes (Van~Car, Person_sitting~Ped)
count as ignored rather than false positives.
"""
from __future__ import annotations

import numpy as np

from .kitti_ap import eval_class, get_map_r11, get_map_r40

CLASS_NAMES = ["Car", "Pedestrian", "Cyclist", "Van", "Person_sitting", "Truck"]
MIN_HEIGHT = [40.0, 25.0, 25.0]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]

# min_overlaps[tier, metric, class]: same table as the reference
OVERLAP_MODERATE = np.array(
    [[0.7, 0.5, 0.5, 0.7, 0.5, 0.7]] * 3
)
OVERLAP_EASY = np.array(
    [
        [0.7, 0.5, 0.5, 0.7, 0.5, 0.5],
        [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
        [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
    ]
)
MIN_OVERLAPS = np.stack([OVERLAP_MODERATE, OVERLAP_EASY], axis=0)


def clean_data(gt_anno, dt_anno, current_class, difficulty):
    cls_name = CLASS_NAMES[current_class].lower()
    ignored_gt, ignored_dt, dc_bboxes = [], [], []
    num_valid_gt = 0
    for i in range(len(gt_anno["name"])):
        name = gt_anno["name"][i].lower()
        bbox = gt_anno["bbox"][i]
        height = bbox[3] - bbox[1]
        if name == cls_name:
            valid_class = 1
        elif cls_name == "pedestrian" and name == "person_sitting":
            valid_class = 0
        elif cls_name == "car" and name == "van":
            valid_class = 0
        else:
            valid_class = -1
        ignore = (
            gt_anno["occluded"][i] > MAX_OCCLUSION[difficulty]
            or gt_anno["truncated"][i] > MAX_TRUNCATION[difficulty]
            or height <= MIN_HEIGHT[difficulty]
        )
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if gt_anno["name"][i] == "DontCare":
            dc_bboxes.append(gt_anno["bbox"][i])
    for i in range(len(dt_anno["name"])):
        valid_class = 1 if dt_anno["name"][i].lower() == cls_name else -1
        height = abs(dt_anno["bbox"][i, 3] - dt_anno["bbox"][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, ignored_gt, ignored_dt, dc_bboxes


def kitti_official_eval(gt_annos, dt_annos, class_names):
    current_classes = [CLASS_NAMES.index(c) for c in class_names
                       if c in CLASS_NAMES]
    difficulties = [0, 1, 2]
    result_dict = {}
    lines = []
    for metric, mname in ((0, "bbox"), (1, "bev"), (2, "3d")):
        ret = eval_class(
            gt_annos, dt_annos, clean_data, current_classes, difficulties,
            metric, MIN_OVERLAPS[:, :, current_classes],
        )
        ap40 = get_map_r40(ret["precision"])
        ap11 = get_map_r11(ret["precision"])
        for j, ci in enumerate(current_classes):
            cname = CLASS_NAMES[ci]
            for d, dname in enumerate(("easy", "moderate", "hard")):
                result_dict[f"{cname}_{mname}/{dname}_R40"] = float(ap40[j, d, 0])
                result_dict[f"{cname}_{mname}/{dname}_R11"] = float(ap11[j, d, 0])
            lines.append(
                f"{cname} {mname} AP_R40: "
                f"{ap40[j, 0, 0]:.2f} {ap40[j, 1, 0]:.2f} {ap40[j, 2, 0]:.2f}"
            )
    return "\n".join(lines), result_dict
