"""ONCE benchmark evaluation (devkit-free numpy reimplementation).

Reference: pcdet/datasets/once/once_eval/evaluation.py (+eval_utils.py,
iou_utils.py). Protocol: 3D IoU with heading gate (matches with >90 deg
orientation difference are zeroed), per-class IoU thresholds (superclass
mode merges Car/Bus/Truck into Vehicle @0.7, Pedestrian @0.3, Cyclist
@0.5), 50-point interpolated PR curves with KITTI-style score-threshold
sampling, difficulty = overall + distance rings (0-30 / 30-50 / 50-inf m).
The numba kernels (get_thresholds / accumulate_scores /
compute_statistics, evaluation.py:153-257) are replicated as plain
numpy/python with identical tie-breaking and ignore semantics.
"""
from __future__ import annotations

import numpy as np

from .rotated_iou_np import rotate_iou_eval

IOU_THRESHOLD = {
    "Car": 0.7, "Bus": 0.7, "Truck": 0.7, "Pedestrian": 0.3, "Cyclist": 0.5,
}
SUPERCLASS_IOU_THRESHOLD = {
    "Vehicle": 0.7, "Pedestrian": 0.3, "Cyclist": 0.5,
}
DIFFICULTY_TYPES = ("overall", "0-30m", "30-50m", "50m-inf")


def iou3d_with_heading(gt_boxes, pred_boxes, with_heading=True):
    """(N, 7) x (M, 7) -> (N, M) 3D IoU; heading gate zeroes pairs whose
    yaw difference exceeds pi/2 (evaluation.py:346-381)."""
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 7)
    pred_boxes = np.asarray(pred_boxes, np.float64).reshape(-1, 7)
    inter_2d = rotate_iou_eval(
        gt_boxes[:, [0, 1, 3, 4, 6]], pred_boxes[:, [0, 1, 3, 4, 6]],
        criterion=2)
    gt_max = gt_boxes[:, [2]] + gt_boxes[:, [5]] * 0.5
    gt_min = gt_boxes[:, [2]] - gt_boxes[:, [5]] * 0.5
    pr_max = pred_boxes[:, [2]] + pred_boxes[:, [5]] * 0.5
    pr_min = pred_boxes[:, [2]] - pred_boxes[:, [5]] * 0.5
    inter_h = np.minimum(gt_max, pr_max.T) - np.maximum(gt_min, pr_min.T)
    inter_h[inter_h <= 0] = 0
    inter_3d = inter_2d * inter_h
    gt_vol = np.prod(gt_boxes[:, 3:6], axis=1)[:, None]
    pr_vol = np.prod(pred_boxes[:, 3:6], axis=1)[None, :]
    iou = inter_3d / (gt_vol + pr_vol - inter_3d)
    if with_heading:
        diff = np.abs(gt_boxes[:, [6]] - pred_boxes[:, [6]].T)
        diff = np.where(diff >= np.pi, 2 * np.pi - diff, diff)
        iou[diff > np.pi / 2] = 0
    return iou


def _distance_ignore(boxes, level):
    """overall_distance_filter (eval_utils.py:37-52): True = ignored."""
    dist = np.linalg.norm(np.asarray(boxes, np.float64)[:, :3], axis=1)
    if level == 0:
        keep = np.ones(len(dist), bool)
    elif level == 1:
        keep = dist < 30
    elif level == 2:
        keep = (dist >= 30) & (dist < 50)
    else:
        keep = dist >= 50
    return ~keep


def _flags(anno, level, class_name, use_superclass):
    """filter_data (evaluation.py:258-313): 0 accept / 1 ignore / -1 reject."""
    names = np.asarray(anno["name"])
    flag = np.zeros(len(names), np.int64)
    if use_superclass and class_name == "Vehicle":
        reject = (names == "Pedestrian") | (names == "Cyclist")
    else:
        reject = names != class_name
    flag[reject] = -1
    ignore = _distance_ignore(anno["boxes_3d"], level)
    flag[ignore] = 1
    return flag


def get_thresholds(scores, num_gt, num_pr_points=50):
    """KITTI-style recall-spaced score thresholds (evaluation.py:153-174)."""
    eps = 1e-6
    scores = np.sort(np.asarray(scores, np.float64))[::-1]
    recall_level = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if (r_recall + l_recall < 2 * recall_level) and i < len(scores) - 1:
            continue
        thresholds.append(score)
        recall_level += 1.0 / num_pr_points
        while r_recall + l_recall + eps > 2 * recall_level:
            thresholds.append(score)
            recall_level += 1.0 / num_pr_points
    return thresholds


def accumulate_scores(iou, pred_scores, gt_flag, pred_flag, iou_threshold):
    """TP candidate scores for threshold sampling (evaluation.py:177-208):
    each gt greedily takes its highest-scoring unassigned overlap. The
    reference's numba inner loop over predictions is vectorized (argmax
    keeps the first of tied scores, matching the strict-> scan)."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    sel_ok = pred_flag != -1
    accum = []
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        cand = sel_ok & ~assigned & (iou[i] > iou_threshold)
        if not cand.any():
            continue
        det_idx = int(np.argmax(np.where(cand, pred_scores, -np.inf)))
        assigned[det_idx] = True
        if not (gt_flag[i] == 1 or pred_flag[det_idx] == 1):
            accum.append(pred_scores[det_idx])
    return np.asarray(accum, np.float64)


def compute_statistics(iou, pred_scores, gt_flag, pred_flag, score_threshold,
                       iou_threshold):
    """tp/fp/fn at one score threshold (evaluation.py:211-257), with the
    reference's best-IoU matching and ignore-preemption rules. Inner loop
    vectorized: a kept (flag 0) candidate always preempts ignored (flag 1)
    candidates, the best-IoU kept candidate wins (first of ties, matching
    the strict-> scan), and with only ignored candidates the first one in
    scan order is taken."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    under = pred_scores < score_threshold
    sel_ok = pred_flag != -1
    is_kept = pred_flag == 0
    is_ign = pred_flag == 1
    tp = fp = fn = 0
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        avail = sel_ok & ~assigned & ~under & (iou[i] > iou_threshold)
        detected = False
        to_ignore = False
        det_idx = -1
        kept = avail & is_kept
        if kept.any():
            det_idx = int(np.argmax(np.where(kept, iou[i], -np.inf)))
            detected = True
        else:
            ign = avail & is_ign
            if ign.any():
                det_idx = int(np.argmax(ign))  # first in scan order
                detected, to_ignore = True, True
        if not detected and gt_flag[i] == 0:
            fn += 1
        elif detected and (gt_flag[i] == 1 or to_ignore):
            assigned[det_idx] = True
        elif detected:
            tp += 1
            assigned[det_idx] = True
    fp = int(np.sum(~(assigned | ~sel_ok | is_ign | under)))
    return tp, fp, fn


def get_evaluation_results(gt_annos, pred_annos, classes, use_superclass=True,
                           iou_thresholds=None, num_pr_points=50,
                           ap_with_heading=True):
    """Top-level protocol (evaluation.py:26-151). Annos: per-sample dicts
    with 'name' (N,) and 'boxes_3d' (N, 7); preds also 'score' (N,)."""
    if iou_thresholds is None:
        iou_thresholds = (
            SUPERCLASS_IOU_THRESHOLD if use_superclass else IOU_THRESHOLD)
    assert len(gt_annos) == len(pred_annos)
    classes = list(classes)
    if use_superclass:
        if any(c in classes for c in ("Car", "Bus", "Truck")):
            assert all(c in classes for c in ("Car", "Bus", "Truck")), (
                "Car/Bus/Truck must all exist for vehicle detection")
        classes = [c for c in classes if c not in ("Car", "Bus", "Truck")]
        classes.insert(0, "Vehicle")

    ious = [
        iou3d_with_heading(g["boxes_3d"], p["boxes_3d"],
                           with_heading=ap_with_heading)
        for g, p in zip(gt_annos, pred_annos)
    ]

    num_diff = len(DIFFICULTY_TYPES)
    precision = np.zeros([len(classes), num_diff, num_pr_points + 1])
    recall = np.zeros([len(classes), num_diff, num_pr_points + 1])

    for ci, cur_class in enumerate(classes):
        iou_th = iou_thresholds[cur_class]
        for di in range(num_diff):
            gt_flags, pred_flags, accum_all = [], [], []
            num_valid_gt = 0
            for gt, pred, iou in zip(gt_annos, pred_annos, ious):
                gf = _flags(gt, di, cur_class, use_superclass)
                pf = _flags(pred, di, cur_class, use_superclass)
                gt_flags.append(gf)
                pred_flags.append(pf)
                num_valid_gt += int((gf == 0).sum())
                accum_all.append(accumulate_scores(
                    iou, np.asarray(pred["score"], np.float64), gf, pf,
                    iou_th))
            if num_valid_gt == 0:
                continue
            thresholds = get_thresholds(
                np.concatenate(accum_all), num_valid_gt, num_pr_points)
            cm = np.zeros([len(thresholds), 3])
            for pred, iou, gf, pf in zip(
                    pred_annos, ious, gt_flags, pred_flags):
                scores = np.asarray(pred["score"], np.float64)
                for ti, th in enumerate(thresholds):
                    tp, fp, fn = compute_statistics(
                        iou, scores, gf, pf, th, iou_th)
                    cm[ti] += (tp, fp, fn)
            for ti in range(len(thresholds)):
                recall[ci, di, ti] = cm[ti, 0] / max(cm[ti, 0] + cm[ti, 2], 1)
                precision[ci, di, ti] = cm[ti, 0] / max(
                    cm[ti, 0] + cm[ti, 1], 1)
            for ti in range(len(thresholds)):
                precision[ci, di, ti] = np.max(precision[ci, di, ti:])
                recall[ci, di, ti] = np.max(recall[ci, di, ti:])

    ap = precision[..., 1:].sum(-1) / num_pr_points * 100

    ret_dict = {}
    ret_str = "\n|AP@%-9s|" % str(num_pr_points)
    for diff_type in DIFFICULTY_TYPES:
        ret_str += "%-12s|" % diff_type
    ret_str += "\n"
    for ci, cur_class in enumerate(classes):
        ret_str += "|%-12s|" % cur_class
        for di, diff_type in enumerate(DIFFICULTY_TYPES):
            ret_dict[f"AP_{cur_class}/{diff_type}"] = ap[ci, di]
            ret_str += "%-12.2f|" % ap[ci, di]
        ret_str += "\n"
    map_ = ap.mean(axis=0)
    ret_str += "|%-12s|" % "mAP"
    for di, diff_type in enumerate(DIFFICULTY_TYPES):
        ret_dict[f"AP_mean/{diff_type}"] = map_[di]
        ret_str += "%-12.2f|" % map_[di]
    ret_str += "\n"
    return ret_str, ret_dict
