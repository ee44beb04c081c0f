"""Self-contained nuScenes detection metrics (mAP / TP errors / NDS).

The reference delegates evaluation to the external `nuscenes` devkit
(pcdet/datasets/nuscenes/nuscenes_dataset.py:258-310). This is a devkit-free
numpy reimplementation of the official `detection_cvpr_2019` protocol
(nuscenes-devkit eval/detection): greedy center-distance matching at
thresholds {0.5, 1, 2, 4} m, AP as the normalized area of the 101-point
interpolated precision/recall curve above (0.1, 0.1), cumulative-mean TP
errors (ATE/ASE/AOE/AVE/AAE) at the 2 m threshold, and
NDS = (5 mAP + sum_tp (1 - min(1, err))) / 10.

Deviations (documented): range filtering measures center distance in the
box frame it is given (lidar/ego origin) rather than the devkit's
global-frame ego distance (sub-meter difference), and the devkit's special
bike-rack / lidarseg filters are skipped.
"""
from __future__ import annotations

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
MEAN_AP_WEIGHT = 5
NELEM = 101  # interpolation grid resolution

# detection_cvpr_2019 class ranges (meters)
CLASS_RANGE = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0, "motorcycle": 40.0,
    "bicycle": 40.0, "traffic_cone": 30.0, "barrier": 30.0,
}
# classes for which a TP metric is undefined (devkit sets NaN)
SKIP_TP = {
    "traffic_cone": {"orient_err", "vel_err", "attr_err"},
    "barrier": {"vel_err", "attr_err"},
}
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
TP_METRIC_NAMES = {
    "trans_err": "mATE", "scale_err": "mASE", "orient_err": "mAOE",
    "vel_err": "mAVE", "attr_err": "mAAE",
}


def _angle_diff(a, b, period):
    d = (a - b) % period
    return np.minimum(d, period - d)


def _scale_err(size_a, size_b):
    """1 - IoU of axis/center-aligned boxes (devkit scale_iou)."""
    inter = np.prod(np.minimum(size_a, size_b), axis=-1)
    union = np.prod(size_a, axis=-1) + np.prod(size_b, axis=-1) - inter
    return 1.0 - inter / np.maximum(union, 1e-9)


def _cummean(x):
    """Mean of the first k entries, NaNs skipped (devkit cummean).

    Positions before the first valid entry are 0.0 (the devkit's np.divide
    with a zeros `out` and `where=count!=0`); the all-NaN input is the
    devkit's special case returning ones."""
    ok = ~np.isnan(x)
    if not ok.any():
        return np.ones_like(x)
    cnt = np.cumsum(ok)
    s = np.cumsum(np.where(ok, x, 0.0))
    return np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)


def _filter_by_range(boxes):
    out = []
    for b in boxes:
        rng = CLASS_RANGE.get(b["detection_name"])
        if rng is None:
            continue
        if float(np.hypot(b["translation"][0], b["translation"][1])) <= rng:
            out.append(b)
    return out


def accumulate(gt_by_token, pred_by_token, class_name, dist_th):
    """One (class, distance-threshold) PR sweep (devkit algo.accumulate).

    gt/pred boxes are dicts with keys translation (3,), size (3,) wlh,
    yaw, velocity (2,), detection_name, attribute_name, and for preds
    detection_score. Returns the interpolated curves or None if no gt.
    """
    npos = sum(
        sum(1 for g in gts if g["detection_name"] == class_name)
        for gts in gt_by_token.values()
    )
    if npos == 0:
        return None

    preds = [
        (tok, p)
        for tok, ps in pred_by_token.items()
        for p in ps
        if p["detection_name"] == class_name
    ]
    # devkit ordering (algo.py): ascending (score, enumeration index) then
    # reversed — among EQUAL scores the later-enumerated prediction comes
    # first; a plain stable descending sort would reverse tied matches
    preds = [
        p for _, _, p in
        sorted(((p[1]["detection_score"], i, p)
                for i, p in enumerate(preds)),
               key=lambda t: (t[0], t[1]))
    ][::-1]

    taken = set()  # (token, gt_idx)
    tp, fp, conf = [], [], []
    match = {k: [] for k in TP_METRICS}
    match["conf"] = []
    period = np.pi if class_name == "barrier" else 2 * np.pi

    for tok, p in preds:
        gts = gt_by_token.get(tok, [])
        best, best_idx = np.inf, None
        for i, g in enumerate(gts):
            if g["detection_name"] != class_name or (tok, i) in taken:
                continue
            d = np.hypot(
                g["translation"][0] - p["translation"][0],
                g["translation"][1] - p["translation"][1],
            )
            if d < best:
                best, best_idx = d, i
        score = float(p["detection_score"])
        if best < dist_th:
            taken.add((tok, best_idx))
            g = gts[best_idx]
            tp.append(1); fp.append(0); conf.append(score)
            match["trans_err"].append(best)
            match["scale_err"].append(
                float(_scale_err(np.asarray(g["size"], np.float64),
                                 np.asarray(p["size"], np.float64)))
            )
            match["orient_err"].append(
                float(_angle_diff(g["yaw"], p["yaw"], period))
            )
            gv = np.asarray(g.get("velocity", (0.0, 0.0)), np.float64)
            pv = np.asarray(p.get("velocity", (0.0, 0.0)), np.float64)
            verr = float(np.hypot(*(gv - pv)))
            match["vel_err"].append(
                np.nan if np.isnan(verr) else verr
            )
            g_attr = g.get("attribute_name", "") or ""
            match["attr_err"].append(
                np.nan if g_attr == ""
                else 1.0 - float(g_attr == p.get("attribute_name", ""))
            )
            match["conf"].append(score)
        else:
            tp.append(0); fp.append(1); conf.append(score)

    if len(match["conf"]) == 0:
        return {
            "recall": np.linspace(0, 1, NELEM),
            "precision": np.zeros(NELEM),
            "confidence": np.zeros(NELEM),
            **{k: np.ones(NELEM) for k in TP_METRICS},
        }

    tp = np.cumsum(tp).astype(np.float64)
    fp = np.cumsum(fp).astype(np.float64)
    conf = np.asarray(conf, np.float64)
    prec = tp / (tp + fp)
    rec = tp / npos

    rec_interp = np.linspace(0, 1, NELEM)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)

    out = {"recall": rec_interp, "precision": prec_i, "confidence": conf_i}
    mconf = np.asarray(match["conf"], np.float64)
    for k in TP_METRICS:
        tmp = _cummean(np.asarray(match[k], np.float64))
        # interpolate over DECREASING confidence (devkit flips both axes)
        out[k] = np.interp(conf_i[::-1], mconf[::-1], tmp[::-1])[::-1]
    return out


def _calc_ap(md):
    prec = np.copy(md["precision"])[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _calc_tp(md, metric):
    nz = np.nonzero(md["confidence"])[0]
    if len(nz) == 0:
        return 1.0
    last = nz.max()
    first = round(100 * MIN_RECALL) + 1
    if last < first:
        return 1.0
    return float(np.mean(md[metric][first:last + 1]))


def nuscenes_detection_eval(gt_by_token, pred_by_token, class_names):
    """Full protocol over per-sample box lists keyed by sample token.

    Returns (result_str, details) shaped like the reference's
    format_nuscene_results (nuscenes_utils.py:559-588).
    """
    gt_by_token = {
        tok: _filter_by_range(boxes) for tok, boxes in gt_by_token.items()
    }
    # cap at 500 boxes/sample keeping the HIGHEST-scoring ones (the devkit
    # asserts <=500; silent arbitrary-order truncation would drop good dets)
    pred_by_token = {
        tok: sorted(
            _filter_by_range(boxes),
            key=lambda b: -b.get("detection_score", 0.0),
        )[:500]
        for tok, boxes in pred_by_token.items()
    }

    label_aps = {}       # class -> {dist_th: ap}
    label_tp_errors = {} # class -> {metric: err}
    for cls in class_names:
        mds = {th: accumulate(gt_by_token, pred_by_token, cls, th)
               for th in DIST_THS}
        label_aps[cls] = {
            th: (_calc_ap(md) if md is not None else np.nan)
            for th, md in mds.items()
        }
        md_tp = mds[DIST_TH_TP]
        errs = {}
        for metric in TP_METRICS:
            if metric in SKIP_TP.get(cls, ()) or md_tp is None:
                errs[metric] = np.nan
            else:
                errs[metric] = _calc_tp(md_tp, metric)
        label_tp_errors[cls] = errs

    mean_dist_aps = {
        cls: float(np.nanmean(list(aps.values())))
        for cls, aps in label_aps.items()
    }
    mean_ap = float(np.nanmean(list(mean_dist_aps.values())))
    tp_errors = {}
    for metric in TP_METRICS:
        vals = [label_tp_errors[c][metric] for c in class_names]
        tp_errors[TP_METRIC_NAMES[metric]] = (
            float(np.nanmean(vals)) if np.any(~np.isnan(vals)) else np.nan
        )
    nds_terms = [
        1.0 - min(1.0, v) for v in tp_errors.values() if not np.isnan(v)
    ]
    # devkit counts all 5 TP metrics in the denominator
    nds = (MEAN_AP_WEIGHT * mean_ap + sum(nds_terms)) / (
        MEAN_AP_WEIGHT + len(TP_METRICS)
    )

    result = "----------------Nuscene results-----------------\n"
    details = {}
    for cls in class_names:
        threshs = ", ".join(str(t) for t in DIST_THS)
        ap_list = [label_aps[cls][t] for t in DIST_THS]
        err_list = list(label_tp_errors[cls].values())
        result += f"***{cls} error@ATE, ASE, AOE, AVE, AAE | AP@{threshs}\n"
        result += ", ".join(f"{x:.2f}" for x in err_list) + " | "
        result += ", ".join(f"{x * 100:.2f}" for x in ap_list)
        result += f" | mean AP: {mean_dist_aps[cls]}\n"
        details[f"mAP_{cls}"] = mean_dist_aps[cls]
    result += "--------------average performance-------------\n"
    for k, v in tp_errors.items():
        result += "%s:\t %.4f\n" % (k, v)
        details[k] = v
    result += "mAP:\t %.4f\n" % mean_ap
    result += "NDS:\t %.4f\n" % nds
    details.update({"mAP": mean_ap, "NDS": nds})
    return result, details
