"""Waymo-protocol detection metrics (AP / APH, L1 / L2) in pure numpy.

The reference wraps the TensorFlow `waymo_open_dataset` metrics estimator
(pcdet/datasets/waymo/waymo_eval.py:91-221); neither TF-metrics nor the
devkit is available here, so this is a protocol-faithful numpy estimator:

- difficulty promotion: gt with labeled difficulty 0 becomes LEVEL_1 when
  it has >5 lidar points, else LEVEL_2 (waymo_eval.py:44-46);
- LEVEL_1 evaluates difficulty-1 gts (difficulty-2 gts are ignored — they
  neither count as gt nor penalize matched predictions); LEVEL_2 evaluates
  both;
- matching: per frame, predictions in descending score greedily take the
  highest-3D-IoU unmatched gt of the same class above the class IoU
  threshold (Vehicle 0.7, Pedestrian/Cyclist/Sign 0.5);
- AP: area under the max-interpolated precision-recall curve on a 101-point
  recall grid; APH: the same curve with every true positive weighted by its
  heading accuracy 1 - |Δθ|/π (Δθ wrapped to [0, π]).
"""
from __future__ import annotations

import numpy as np

from .once_eval import iou3d_with_heading

IOU_THRESHOLD = {
    "Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5, "Sign": 0.5,
    # kitti-style aliases used when waymo infos carry mapped names
    "Car": 0.7,
}


def _heading_accuracy(gt_yaw, pred_yaw):
    d = np.abs(gt_yaw - pred_yaw) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    return np.maximum(0.0, 1.0 - d / np.pi)


def _promote_difficulty(difficulty, num_points_in_gt):
    difficulty = np.asarray(difficulty, np.int64).copy()
    if num_points_in_gt is None:
        difficulty[difficulty == 0] = 1
        return difficulty
    num_points_in_gt = np.asarray(num_points_in_gt)
    zero = difficulty == 0
    difficulty[zero & (num_points_in_gt > 5)] = 1
    difficulty[zero & (num_points_in_gt <= 5)] = 2
    return difficulty


def _accumulate_class(gt_frames, pred_frames, class_name, level,
                      iou_threshold):
    """Returns (scores, tp_flags, heading_weights, num_gt)."""
    scores, tps, hws = [], [], []
    num_gt = 0
    for gt, pred in zip(gt_frames, pred_frames):
        g_mask = np.asarray(gt["name"]) == class_name
        g_boxes = np.asarray(gt["boxes"], np.float64)[g_mask]
        g_diff = np.asarray(gt["difficulty"])[g_mask]
        # LEVEL_1 ignores difficulty-2 gts; LEVEL_2 counts both
        g_ignore = (g_diff > 1) if level == 1 else np.zeros(len(g_diff), bool)
        num_gt += int((~g_ignore).sum())

        p_mask = np.asarray(pred["name"]) == class_name
        p_boxes = np.asarray(pred["boxes"], np.float64)[p_mask]
        p_scores = np.asarray(pred["score"], np.float64)[p_mask]
        if len(p_boxes) == 0:
            continue
        order = np.argsort(-p_scores)
        # Waymo's metric library computes TRUE geometric IoU; the shared
        # kernel uses the KITTI clockwise corner convention, and
        # CW-corners(-theta) == CCW-corners(theta), so negate headings to
        # get the proper lidar-frame IoU (ONCE keeps CW on purpose — its
        # official eval uses the second.pytorch kernel as-is)
        if len(g_boxes):
            gb = g_boxes[:, :7].copy()
            pb = p_boxes[:, :7].copy()
            gb[:, 6] = -gb[:, 6]
            pb[:, 6] = -pb[:, 6]
            iou = iou3d_with_heading(gb, pb, with_heading=False)
        else:
            iou = np.zeros((0, len(p_boxes)))
        taken = np.zeros(len(g_boxes), bool)
        for j in order:
            best, best_i = iou_threshold, -1
            for i in range(len(g_boxes)):
                if not taken[i] and iou[i, j] >= best:
                    best, best_i = iou[i, j], i
            scores.append(p_scores[j])
            if best_i >= 0:
                taken[best_i] = True
                if g_ignore[best_i]:
                    # matched an ignored gt: drop from both numerators
                    scores.pop()
                    continue
                tps.append(1.0)
                hws.append(float(_heading_accuracy(
                    g_boxes[best_i, 6], p_boxes[j, 6])))
            else:
                tps.append(0.0)
                hws.append(0.0)
    return (np.asarray(scores), np.asarray(tps), np.asarray(hws), num_gt)


def _ap_from_matches(scores, tp, weights, num_gt):
    """Max-interpolated PR-curve area on a 101-point recall grid."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = tp[order]
    w = weights[order]
    cum_tp = np.cumsum(tp)
    cum_w = np.cumsum(w)
    cum_fp = np.cumsum(1.0 - tp)
    # BOTH axes use the weighted TP sum (Waymo detection_metrics.cc:
    # precision_ha = sum_ha/(tp+fp) AND recall_ha = sum_ha/(tp+fn)); for
    # AP the weights are tp itself, so this reduces to tp/num_gt there
    recall = cum_w / num_gt
    precision = cum_w / np.maximum(cum_tp + cum_fp, 1e-9)
    # max-interpolation (monotone non-increasing precision)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    grid = np.linspace(0, 1, 101)
    prec_i = np.zeros_like(grid)
    for k, r in enumerate(grid):
        idx = np.searchsorted(recall, r, side="left")
        prec_i[k] = precision[idx] if idx < len(precision) else 0.0
    return float(prec_i.mean())


def waymo_evaluation(det_annos, gt_annos, class_names, distance_thresh=1000):
    """det_annos: per-frame dicts {name, score, boxes_lidar}; gt_annos:
    {name, difficulty, num_points_in_gt, gt_boxes_lidar}. Returns
    (result_str, ap_dict) keyed like the reference's TF estimator output
    (OBJECT_TYPE_TYPE_<cls>_LEVEL_<l> AP/APH)."""
    gt_frames, pred_frames = [], []
    for gt in gt_annos:
        boxes = np.asarray(gt["gt_boxes_lidar"], np.float64).reshape(
            len(gt["name"]), -1)
        diff = _promote_difficulty(
            gt.get("difficulty", np.zeros(len(gt["name"]))),
            gt.get("num_points_in_gt"))
        keep = (np.linalg.norm(boxes[:, :2], axis=1) < distance_thresh
                if len(boxes) else np.zeros(0, bool))
        gt_frames.append({
            "name": np.asarray(gt["name"])[keep],
            "boxes": boxes[keep],
            "difficulty": diff[keep],
        })
    for det in det_annos:
        boxes = np.asarray(det["boxes_lidar"], np.float64).reshape(
            len(det["name"]), -1)
        keep = (np.linalg.norm(boxes[:, :2], axis=1) < distance_thresh
                if len(boxes) else np.zeros(0, bool))
        pred_frames.append({
            "name": np.asarray(det["name"])[keep],
            "boxes": boxes[keep],
            "score": np.asarray(det["score"], np.float64)[keep],
        })

    ap_dict = {}
    lines = []
    for cls in class_names:
        iou_th = IOU_THRESHOLD.get(cls, 0.5)
        for level in (1, 2):
            scores, tp, hw, num_gt = _accumulate_class(
                gt_frames, pred_frames, cls, level, iou_th)
            # AP weights = tp, so cum_w == cum_tp and precision is
            # tp/(tp+fp); all-ones weights would make precision identically
            # 1.0 and false positives would never reduce AP.
            ap = _ap_from_matches(scores, tp, tp, num_gt)
            aph = _ap_from_matches(scores, tp, hw, num_gt)
            key = f"OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}"
            ap_dict[key + "/AP"] = ap
            ap_dict[key + "/APH"] = aph
            lines.append(f"{key}/AP: {ap:.4f}")
            lines.append(f"{key}/APH: {aph:.4f}")
    return "\n" + "\n".join(lines) + "\n", ap_dict
