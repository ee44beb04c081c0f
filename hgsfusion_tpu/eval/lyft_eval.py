"""Lyft mAP evaluation (devkit-free numpy reimplementation).

Reference: pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py (the Lyft SDK's
mAP_evaluation): per class and per 3D-IoU threshold, predictions sorted by
score greedily match the highest-IoU unclaimed gt in their sample; AP is
the VOC-style area under the precision envelope; the reported score per
class is the mean over the IoU threshold list. The SDK's shapely-based
Box3D.get_iou is replaced by our rotated-BEV x height-overlap IoU
(`eval/once_eval.iou3d_with_heading` without the heading gate), which is
the same quantity for yaw-only boxes. Boxes are evaluated in the lidar
frame — 3D IoU is invariant under the rigid lidar->global transform the
SDK applies.
"""
from __future__ import annotations

import numpy as np

from .once_eval import iou3d_with_heading


def get_envelope(precisions):
    for i in range(precisions.size - 1, 0, -1):
        precisions[i - 1] = np.maximum(precisions[i - 1], precisions[i])
    return precisions


def get_ap(recalls, precisions):
    """VOC-style AP (lyft_eval.py:243-265)."""
    recalls = np.concatenate(([0.0], recalls, [1.0]))
    precisions = np.concatenate(([0.0], precisions, [0.0]))
    precisions = get_envelope(precisions)
    i = np.where(recalls[1:] != recalls[:-1])[0]
    return float(np.sum((recalls[i + 1] - recalls[i]) * precisions[i + 1]))


def recall_precision(gt, predictions, iou_thresholds):
    """gt/predictions: lists of dicts {sample_token, box (7,), score}
    for ONE class (lyft_eval.py:272-342). Returns (recalls, precisions,
    aps) each (num_thresholds,)-shaped; (-1, -1, -1) with no gt."""
    num_gts = len(gt)
    if num_gts == 0:
        return -1, -1, -1
    by_sample = {}
    for g in gt:
        by_sample.setdefault(g["sample_token"], []).append(
            np.asarray(g["box"], np.float64))
    # pre-mirror y once per token (see the convention note below)
    by_sample = {
        tok: np.stack(boxes) * np.array([1, -1, 1, 1, 1, 1, 1])
        for tok, boxes in by_sample.items()
    }
    checked = {
        tok: np.zeros((len(boxes), len(iou_thresholds)))
        for tok, boxes in by_sample.items()
    }
    predictions = sorted(predictions, key=lambda x: -x["score"])
    tp = np.zeros((len(predictions), len(iou_thresholds)))
    fp = np.zeros((len(predictions), len(iou_thresholds)))
    for pi, pred in enumerate(predictions):
        tok = pred["sample_token"]
        gts = by_sample.get(tok)
        if gts is None:
            fp[pi] = 1
            continue
        # the Lyft devkit's ground polygon uses an IMPROPER rotation
        # (corner offset map [[c, s], [s, -c]], det -1 — lyft_eval.py:
        # 131-155): equivalent to a proper clockwise rotation of boxes
        # with the y axis mirrored, so both sides have y negated (gts
        # once per token above) to reproduce the official numbers
        # exactly (parity-tested)
        pb = np.asarray(pred["box"], np.float64)[None, :7].copy()
        pb[:, 1] = -pb[:, 1]
        ious = iou3d_with_heading(gts, pb, with_heading=False)[:, 0]
        best = int(np.argmax(ious))
        for ti, th in enumerate(iou_thresholds):
            if ious[best] > th:
                if checked[tok][best, ti] == 0:
                    tp[pi, ti] = 1
                    checked[tok][best, ti] = 1
                else:
                    fp[pi, ti] = 1
            else:
                fp[pi, ti] = 1
    tp = np.cumsum(tp, axis=0)
    fp = np.cumsum(fp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    aps = np.asarray([
        get_ap(recalls[:, ti], precisions[:, ti])
        for ti in range(len(iou_thresholds))
    ])
    return recalls, precisions, aps


def get_average_precisions(gt, predictions, class_names, iou_thresholds):
    """Per-class mean AP over the IoU threshold list
    (lyft_eval.py:345-382). gt/predictions: lists of dicts
    {sample_token, name, box (7,) [, score]}."""
    gt_by_class = {}
    for g in gt:
        gt_by_class.setdefault(g["name"], []).append(g)
    pred_by_class = {}
    for p in predictions:
        pred_by_class.setdefault(p["name"], []).append(p)
    average_precisions = np.zeros(len(class_names))
    for ci, cls in enumerate(class_names):
        if cls not in gt_by_class:
            continue
        _, _, aps = recall_precision(
            gt_by_class[cls], pred_by_class.get(cls, []), iou_thresholds)
        average_precisions[ci] = float(np.mean(aps))
    return average_precisions


def format_lyft_results(classwise_ap, class_names, iou_threshold_list,
                        version="trainval"):
    """lyft_utils.format_lyft_results:319-332."""
    ret_dict = {}
    result = f"----------------Lyft {version} results-----------------\n"
    for i, name in enumerate(class_names):
        result += f"{name}: {classwise_ap[i]:.4f}\n"
        ret_dict[f"AP_{name}"] = float(classwise_ap[i])
    mAP = float(np.mean(classwise_ap))
    result += "--------------average performance-------------\n"
    result += "mAP:\t %.4f\n" % mAP
    result += f"(IoU thresholds: {list(iou_threshold_list)})\n"
    ret_dict["mAP"] = mAP
    return result, ret_dict
