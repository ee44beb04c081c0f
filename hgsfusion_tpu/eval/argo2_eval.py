"""Argoverse 2 detection metrics (devkit-free numpy reimplementation).

The reference calls the external `av2` evaluation API
(pcdet/datasets/argo2/argo2_dataset.py:449-485). This replicates the av2
sensor-detection protocol: greedy matching by 3D center distance at
affinity thresholds {0.5, 1, 2, 4} m (dets in descending score), AP as
the area under the precision envelope on a 100-point recall grid, true
positive errors at the 2 m threshold (ATE translation, ASE = 1 - aligned
3D IoU, AOE = wrapped yaw error), and the Composite Detection Score
CDS = AP * mean(1 - normalized TP errors) with av2's normalizers
(ATE / 2 m, ASE / 1, AOE / pi). Range filtering keeps boxes within
`max_range_m` of the ego origin; the devkit's ROI (drivable-area) filter
needs the HD maps and is skipped (documented deviation).
"""
from __future__ import annotations

import numpy as np

AFFINITY_THRESHOLDS_M = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD_M = 2.0
NORMALIZERS = {"ATE": 2.0, "ASE": 1.0, "AOE": np.pi}


def _aligned_iou_3d(dims_a, dims_b):
    inter = np.prod(np.minimum(dims_a, dims_b))
    union = np.prod(dims_a) + np.prod(dims_b) - inter
    return inter / max(union, 1e-9)


def _wrap_yaw_err(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    return min(d, 2 * np.pi - d)


def _accumulate(gt_by_uuid, dt_by_uuid, threshold):
    """One affinity-threshold sweep for one category. Boxes: (N, 7).
    Returns (scores, tp_flags, errors-at-2m or None).

    av2 assignment semantics (av2/evaluation/detection/utils.py assign):
    each detection's candidate is its single ARGMAX-affinity (nearest) gt;
    per gt, only the first (highest-scored) such detection is assigned
    (np.unique(idx_gts, return_index=True)); a detection whose nearest gt
    is claimed is an FP at every threshold — it does NOT fall back to the
    next-nearest unclaimed gt (greedy fallback inflates AP when
    detections cluster near one gt with another gt in range)."""
    scores, tps = [], []
    errs = {"ATE": [], "ASE": [], "AOE": []}
    is_tp_thresh = threshold == TP_THRESHOLD_M
    for uuid, dts in dt_by_uuid.items():
        gts = gt_by_uuid.get(uuid, np.zeros((0, 7)))
        order = np.argsort(-dts[:, 7])
        if len(gts) == 0:
            scores.extend(dts[order, 7])
            tps.extend([0.0] * len(order))
            continue
        d = np.linalg.norm(
            dts[order, None, :3] - gts[None, :, :3], axis=-1)  # (D, G)
        idx_gt = d.argmin(axis=1)
        dist = d[np.arange(len(order)), idx_gt]
        assigned = np.zeros(len(order), bool)
        _, first_det = np.unique(idx_gt, return_index=True)
        assigned[first_det] = True
        for jj, j in enumerate(order):
            scores.append(dts[j, 7])
            if assigned[jj] and dist[jj] < threshold:
                tps.append(1.0)
                if is_tp_thresh:
                    gi = idx_gt[jj]
                    errs["ATE"].append(float(dist[jj]))
                    errs["ASE"].append(
                        1.0 - _aligned_iou_3d(gts[gi, 3:6], dts[j, 3:6]))
                    errs["AOE"].append(
                        _wrap_yaw_err(gts[gi, 6], dts[j, 6]))
            else:
                tps.append(0.0)
    return np.asarray(scores), np.asarray(tps), (
        errs if is_tp_thresh else None)


def _interp_ap(scores, tps, num_gt):
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = tps[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    grid = np.linspace(0, 1, 100)
    prec_i = np.interp(grid, recall, precision, right=0.0)
    return float(prec_i.mean())


def argo2_detection_eval(gt_by_uuid_cat, dt_by_uuid_cat, categories,
                         max_range_m=200.0):
    """gt/dt: {category: {uuid: (N, 7[/8 with score]) arrays}}. Returns
    (metrics_str, ap_dict) with per-category AP/ATE/ASE/AOE/CDS plus
    AVERAGE_METRICS."""
    rows = {}
    for cat in categories:
        gts = {
            uuid: b[np.linalg.norm(b[:, :2], axis=1) <= max_range_m]
            for uuid, b in gt_by_uuid_cat.get(cat, {}).items()
        }
        dts = {
            uuid: b[np.linalg.norm(b[:, :2], axis=1) <= max_range_m]
            for uuid, b in dt_by_uuid_cat.get(cat, {}).items()
        }
        num_gt = sum(len(b) for b in gts.values())
        aps = []
        tp_errs = None
        for th in AFFINITY_THRESHOLDS_M:
            scores, tps, errs = _accumulate(gts, dts, th)
            aps.append(_interp_ap(scores, tps, num_gt))
            if errs is not None:
                tp_errs = errs
        ap = float(np.nanmean(aps))
        if tp_errs and len(tp_errs["ATE"]):
            ate = float(np.mean(tp_errs["ATE"]))
            ase = float(np.mean(tp_errs["ASE"]))
            aoe = float(np.mean(tp_errs["AOE"]))
        else:
            # av2 assigns the maximum error when nothing matched
            ate, ase, aoe = NORMALIZERS["ATE"], NORMALIZERS["ASE"], \
                NORMALIZERS["AOE"]
        cds = ap * float(np.mean([
            1 - min(ate / NORMALIZERS["ATE"], 1.0),
            1 - min(ase / NORMALIZERS["ASE"], 1.0),
            1 - min(aoe / NORMALIZERS["AOE"], 1.0),
        ]))
        rows[cat] = {"AP": ap, "ATE": ate, "ASE": ase, "AOE": aoe,
                     "CDS": cds}

    avg = {
        k: (float(np.nanmean([rows[c][k] for c in categories]))
            if categories else float("nan"))
        for k in ("AP", "ATE", "ASE", "AOE", "CDS")
    }
    rows["AVERAGE_METRICS"] = avg

    header = f"{'category':<24}{'AP':>8}{'ATE':>8}{'ASE':>8}" \
             f"{'AOE':>8}{'CDS':>8}"
    lines = [header]
    ap_dict = {}
    for cat, row in rows.items():
        lines.append(
            f"{cat:<24}" + "".join(f"{row[k]:>8.4f}"
                                   for k in ("AP", "ATE", "ASE", "AOE",
                                             "CDS")))
        for k, v in row.items():
            ap_dict[f"{cat}/{k}"] = v
    return "\n".join(lines), ap_dict
