"""Detection-level equivalence analysis: polar vs gather view transform.

Compares two eval runs' detections (the `result.pkl` det-anno lists that
tools/test.py writes) box-for-box post-NMS, and scores both against the
ground truth with the OFFICIAL protocol (eval/vod_eval.py — the
reference's vod_utils.py:681-762 metric — or eval/tj4d_eval.py), so the
polar serving default's accuracy cost is quantified at the metric the
north star is written in (AP), not in feature space.

Reported per class:
  - detection counts per path at the shipped 0.1 score threshold
  - matched-detection rate at the protocol min-overlap (3D IoU, greedy
    score-ordered matching): matches / max(nA, nB)
  - IoU distribution of matches (mean / median / p10)
  - |score delta| of matches (mean / max)
  - unmatched box counts per side
  - official AP (3D + BEV, entire-area) per path and the delta

Usage:
    python tools/study_polar_match.py --a <gather result.pkl> \
        --b <polar result.pkl> --infos <kitti_infos_val.pkl> \
        [--dataset vod|tj4d] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# protocol min-overlaps (vod_eval.py MIN_OVERLAPS official tier / the
# VERDICT's IoU 0.5 (Car) / 0.25 (Ped, Cyc) matching ask; Truck uses the
# TJ4D Car threshold)
MIN_OVERLAP = {"Car": 0.5, "Pedestrian": 0.25, "Cyclist": 0.25,
               "Truck": 0.5}


def _cam_boxes7(anno, idx):
    """(n, 7) camera-frame [x, y, z, l, h, w, ry] rows for kitti_ap IoU."""
    loc = np.asarray(anno["location"])[idx].reshape(-1, 3)
    dims = np.asarray(anno["dimensions"])[idx].reshape(-1, 3)  # (l, h, w)
    ry = np.asarray(anno["rotation_y"])[idx].reshape(-1, 1)
    return np.concatenate([loc, dims, ry], axis=1).astype(np.float64)


def greedy_match(boxes_a, scores_a, boxes_b, scores_b, min_iou):
    """Score-ordered greedy 1:1 matching on camera 3D IoU.

    Returns (pairs, ious): pairs is a list of (ia, ib)."""
    from hgsfusion_tpu.eval.kitti_ap import d3_box_overlap

    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return [], []
    iou = d3_box_overlap(boxes_a, boxes_b)
    pairs, ious = [], []
    used_b = set()
    for ia in np.argsort(-scores_a):
        cand = [(iou[ia, ib], ib) for ib in np.argsort(-iou[ia])
                if ib not in used_b and iou[ia, ib] >= min_iou]
        if cand:
            best_iou, ib = max(cand)
            used_b.add(ib)
            pairs.append((int(ia), int(ib)))
            ious.append(float(best_iou))
    return pairs, ious


def analyze(annos_a, annos_b, class_names, score_thresh=0.1):
    """Per-class box-level match stats across all frames."""
    stats = {c: dict(n_a=0, n_b=0, matched=0, ious=[], sdelta=[])
             for c in class_names}
    assert len(annos_a) == len(annos_b), "frame count mismatch"
    for fa, fb in zip(annos_a, annos_b):
        for cname in class_names:
            thr = MIN_OVERLAP.get(cname, 0.25)
            sa = np.asarray(fa["score"], np.float64)
            sb = np.asarray(fb["score"], np.float64)
            ia = np.where((np.asarray(fa["name"]) == cname)
                          & (sa >= score_thresh))[0]
            ib = np.where((np.asarray(fb["name"]) == cname)
                          & (sb >= score_thresh))[0]
            st = stats[cname]
            st["n_a"] += len(ia)
            st["n_b"] += len(ib)
            pairs, ious = greedy_match(
                _cam_boxes7(fa, ia), sa[ia], _cam_boxes7(fb, ib), sb[ib],
                thr)
            st["matched"] += len(pairs)
            st["ious"].extend(ious)
            st["sdelta"].extend(
                abs(float(sa[ia[pa]]) - float(sb[ib[pb]]))
                for pa, pb in pairs)
    out = {}
    for cname, st in stats.items():
        ious = np.asarray(st["ious"]) if st["ious"] else np.zeros(0)
        sd = np.asarray(st["sdelta"]) if st["sdelta"] else np.zeros(0)
        denom = max(st["n_a"], st["n_b"], 1)
        out[cname] = {
            "n_a": st["n_a"], "n_b": st["n_b"],
            "matched": st["matched"],
            "match_rate": st["matched"] / denom,
            "unmatched_a": st["n_a"] - st["matched"],
            "unmatched_b": st["n_b"] - st["matched"],
            "iou_mean": float(ious.mean()) if ious.size else None,
            "iou_median": float(np.median(ious)) if ious.size else None,
            "iou_p10": float(np.percentile(ious, 10)) if ious.size else None,
            "score_delta_mean": float(sd.mean()) if sd.size else None,
            "score_delta_max": float(sd.max()) if sd.size else None,
        }
    return out


def official_ap(gt_annos, dt_annos, dataset, class_names):
    if dataset == "tj4d":
        from hgsfusion_tpu.eval.tj4d_eval import tj4d_official_eval

        _, res = tj4d_official_eval(gt_annos, dt_annos)
        # headline keys: KITTI/<cls>_3D_moderate_strict-style; normalize
        return {k: v for k, v in res.items() if isinstance(v, float)}
    from hgsfusion_tpu.eval.vod_eval import vod_official_eval

    _, res = vod_official_eval(gt_annos, dt_annos, class_names=class_names)
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="result.pkl of path A (gather)")
    p.add_argument("--b", required=True, help="result.pkl of path B (polar)")
    p.add_argument("--infos", required=True, help="kitti_infos_val.pkl (gt)")
    p.add_argument("--dataset", default="vod", choices=["vod", "tj4d"])
    p.add_argument("--score_thresh", type=float, default=0.1)
    p.add_argument("--json", default=None, help="write the full report here")
    args = p.parse_args()

    annos_a = pickle.load(open(args.a, "rb"))
    annos_b = pickle.load(open(args.b, "rb"))
    infos = pickle.load(open(args.infos, "rb"))
    gt_annos = [info["annos"] for info in infos][: len(annos_a)]
    class_names = (["Car", "Pedestrian", "Cyclist"] if args.dataset == "vod"
                   else ["Car", "Pedestrian", "Cyclist", "Truck"])

    match = analyze(annos_a, annos_b, class_names, args.score_thresh)
    ap_a = official_ap(gt_annos, annos_a, args.dataset, class_names)
    ap_b = official_ap(gt_annos, annos_b, args.dataset, class_names)
    dap = {k: ap_b.get(k, 0.0) - v for k, v in ap_a.items()
           if isinstance(v, float)}

    print(f"== box-level match (score >= {args.score_thresh}) ==")
    hdr = (f"{'class':12s} {'nA':>5s} {'nB':>5s} {'match':>6s} "
           f"{'rate':>6s} {'iou_med':>8s} {'iou_p10':>8s} {'d_score':>8s}")
    print(hdr)
    for c, st in match.items():
        print(f"{c:12s} {st['n_a']:5d} {st['n_b']:5d} {st['matched']:6d} "
              f"{st['match_rate']:6.3f} "
              f"{st['iou_median'] if st['iou_median'] is not None else -1:8.3f} "
              f"{st['iou_p10'] if st['iou_p10'] is not None else -1:8.3f} "
              f"{st['score_delta_mean'] if st['score_delta_mean'] is not None else -1:8.4f}")
    print("== official AP (A | B | delta) ==")
    worst = 0.0
    for k in sorted(ap_a):
        if not isinstance(ap_a[k], float):
            continue
        print(f"{k:42s} {ap_a[k]:7.2f} {ap_b.get(k, 0.0):7.2f} "
              f"{dap[k]:+7.2f}")
        worst = max(worst, abs(dap[k]))
    print(f"max |dAP| over all keys: {worst:.2f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"match": match, "ap_a": ap_a, "ap_b": ap_b,
                       "dap": dap, "max_abs_dap": worst}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
