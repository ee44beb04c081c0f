"""GT-database copy-paste augmentation (gt_sampling).

Reference: pcdet/datasets/augmentor/database_sampler.py:15-502 and the
database creation in vod_dataset.create_groundtruth_database (:271-323).
Inactive in the shipped HGS configs (DISABLE_AUG_LIST) but part of the
framework surface: sample per-class gt instances from a prebuilt database,
reject BEV collisions with existing boxes, drop scene points inside the
sampled boxes, and merge the cached instance points in.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ..utils import box_utils


def create_groundtruth_database(dataset, used_classes=None, split="train"):
    """Build gt_database/*.bin + kitti_dbinfos_{split}.pkl for a dataset.

    Mirrors vod_dataset.create_groundtruth_database: per frame, per gt box,
    dump the in-box points (coordinates made box-relative) and record an info
    entry.
    """
    import numpy as np

    from ..ops.points_in_boxes import points_in_boxes

    root = Path(dataset.root_path)
    db_dir = root / "gt_database"
    db_dir.mkdir(parents=True, exist_ok=True)
    db_infos = {}
    for idx in range(len(dataset.infos)):
        info = dataset.infos[idx]
        sample_idx = info["point_cloud"]["lidar_idx"]
        points = dataset.get_lidar(sample_idx)
        annos = info.get("annos")
        if annos is None:
            continue
        gt_boxes = annos["gt_boxes_lidar"]
        names = annos["name"]
        inside = np.asarray(points_in_boxes(points[:, :3], gt_boxes)) if len(
            gt_boxes
        ) else np.zeros((0, len(points)), bool)
        for gi in range(len(gt_boxes)):
            name = names[gi]
            if used_classes is not None and name not in used_classes:
                continue
            gt_points = points[inside[gi]]
            gt_points = gt_points.copy()
            gt_points[:, :3] -= gt_boxes[gi, :3]
            fname = f"{sample_idx}_{name}_{gi}.bin"
            gt_points.astype(np.float32).tofile(db_dir / fname)
            entry = {
                "name": name,
                "path": str(Path("gt_database") / fname),
                "image_idx": sample_idx,
                "gt_idx": gi,
                "box3d_lidar": gt_boxes[gi],
                "num_points_in_gt": int(inside[gi].sum()),
                "difficulty": int(annos["difficulty"][gi]) if gi < len(
                    annos.get("difficulty", [])
                ) else 0,
            }
            db_infos.setdefault(name, []).append(entry)
    out = root / f"kitti_dbinfos_{split}.pkl"
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    return out


class DataBaseSampler:
    """Samples cached gt instances into the current frame (gt_sampling)."""

    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.class_names = class_names
        self.logger = logger
        self.sampler_cfg = sampler_cfg
        self.num_point_features = int(sampler_cfg.get("NUM_POINT_FEATURES", 4))
        self.db_infos = {}
        for db_path in sampler_cfg["DB_INFO_PATH"]:
            path = self.root_path / db_path
            with open(path, "rb") as f:
                infos = pickle.load(f)
            for name, lst in infos.items():
                self.db_infos.setdefault(name, []).extend(lst)

        prepare = sampler_cfg.get("PREPARE", {})
        if "filter_by_min_points" in prepare:
            for spec in prepare["filter_by_min_points"]:
                name, n = spec.split(":")
                n = int(n)
                if name in self.db_infos:
                    self.db_infos[name] = [
                        x for x in self.db_infos[name]
                        if x["num_points_in_gt"] >= n
                    ]
        if "filter_by_difficulty" in prepare:
            removed = set(prepare["filter_by_difficulty"])
            for name in self.db_infos:
                self.db_infos[name] = [
                    x for x in self.db_infos[name]
                    if x["difficulty"] not in removed
                ]

        self.sample_groups = {}
        for spec in sampler_cfg["SAMPLE_GROUPS"]:
            name, n = spec.split(":")
            if name in class_names:
                self.sample_groups[name] = int(n)
        self.limit_whole_scene = sampler_cfg.get("LIMIT_WHOLE_SCENE", True)

    def __call__(self, data_dict):
        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"]
        points = data_dict["points"]

        sampled_boxes, sampled_names, sampled_points = [], [], []
        existing = gt_boxes[:, :7].copy()

        def _bev_iou(a, b):
            # ROTATED BEV IoU, like the reference's boxes_bev_iou_cpu
            # (database_sampler.py:472-473) — axis-aligned IoU over-rejects
            # diagonally adjacent rotated boxes
            from ..eval.rotated_iou_np import rotate_iou_eval

            return rotate_iou_eval(a[:, [0, 1, 3, 4, 6]],
                                   b[:, [0, 1, 3, 4, 6]])

        for name, target in self.sample_groups.items():
            pool = self.db_infos.get(name, [])
            if not pool:
                continue
            n_have = int((gt_names == name).sum()) if len(gt_names) else 0
            n_want = max(target - n_have, 0) if self.limit_whole_scene else target
            if n_want == 0:
                continue
            picks = np.random.choice(
                len(pool), size=min(n_want, len(pool)), replace=False
            )
            for pi in picks:
                entry = pool[pi]
                box = np.asarray(entry["box3d_lidar"], np.float32)
                # reject BEV collisions with existing and already-sampled boxes
                if len(existing):
                    iou = _bev_iou(box[None, :7], existing)
                    if float(np.max(iou)) > 0.0:
                        continue
                pts = np.fromfile(
                    str(self.root_path / entry["path"]), dtype=np.float32
                ).reshape(-1, self.num_point_features)
                pts = pts.copy()
                pts[:, :3] += box[:3]
                sampled_boxes.append(box)
                sampled_names.append(name)
                sampled_points.append(pts)
                existing = np.concatenate([existing, box[None, :7]])

        if not sampled_boxes:
            return data_dict
        # pad/trim sampled boxes to the frame's gt width (the reference
        # keeps existed_boxes at full 7+C width, :489 — truncating gt to 7
        # would silently drop velocity columns for the whole frame)
        width = gt_boxes.shape[1] if len(gt_boxes) else max(
            len(b) for b in sampled_boxes)
        uni = np.zeros((len(sampled_boxes), width), np.float32)
        for i, b in enumerate(sampled_boxes):
            uni[i, :min(len(b), width)] = b[:min(len(b), width)]
        sampled_boxes = uni

        if (self.sampler_cfg.get("USE_ROAD_PLANE", False)
                and data_dict.get("road_plane") is not None
                and data_dict.get("calib") is not None):
            # lift sampled boxes onto the road plane and drop their crops
            # by the same height (database_sampler.put_boxes_on_road_planes
            # :150-168 + the obj_points z-shift in add_sampled_boxes_to_scene)
            a, b, c, d = data_dict["road_plane"]
            calib = data_dict["calib"]
            center_cam = calib.lidar_to_rect(sampled_boxes[:, 0:3])
            center_cam[:, 1] = (
                -d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
            cur_lidar_h = calib.rect_to_lidar(center_cam)[:, 2]
            mv_height = (sampled_boxes[:, 2] - sampled_boxes[:, 5] / 2
                         - cur_lidar_h)
            sampled_boxes[:, 2] -= mv_height
            for i in range(len(sampled_points)):
                sampled_points[i][:, 2] -= mv_height[i]

        # remove original points inside the ENLARGED sampled boxes
        # (add_sampled_boxes_to_scene:429-432 enlarge_box3d by
        # REMOVE_EXTRA_WIDTH — without the margin, leftover scene points hug
        # the pasted objects as ghost double-surfaces), then merge with the
        # object crops FIRST, matching the reference's concat order (:434)
        from ..ops.points_in_boxes import points_in_boxes

        extra = np.asarray(
            self.sampler_cfg.get("REMOVE_EXTRA_WIDTH", [0.0, 0.0, 0.0]),
            np.float32)
        large = sampled_boxes[:, :7].copy()
        large[:, 3:6] += extra[None, :]
        inside = np.asarray(points_in_boxes(points[:, :3], large))
        keep = ~inside.any(axis=0)
        pts_new = np.concatenate(sampled_points)
        if pts_new.shape[1] < points.shape[1]:
            pad = np.zeros(
                (len(pts_new), points.shape[1] - pts_new.shape[1]), np.float32
            )
            pts_new = np.concatenate([pts_new, pad], axis=1)
        elif pts_new.shape[1] > points.shape[1]:
            pts_new = pts_new[:, : points.shape[1]]
        data_dict["points"] = np.concatenate([pts_new, points[keep]])
        # full-width concat (the reference keeps velocity columns, :489)
        data_dict["gt_boxes"] = np.concatenate(
            [gt_boxes, np.asarray(sampled_boxes, np.float32)]
        ) if len(gt_boxes) else np.asarray(sampled_boxes, np.float32)
        data_dict["gt_names"] = np.concatenate(
            [gt_names, np.asarray(sampled_names)]
        )
        if "gt_boxes_mask" in data_dict:
            data_dict["gt_boxes_mask"] = np.concatenate(
                [data_dict["gt_boxes_mask"], np.ones(len(sampled_boxes), bool)]
            )
        if data_dict.get("gt_boxes2d", None) is not None:
            # keep gt_boxes2d aligned with gt_boxes so the augmentor's
            # final mask application doesn't desync; sampled db objects
            # carry no 2D boxes (the reference only fills these via its
            # img_aug copy-paste path, database_sampler.py:287-330)
            data_dict["gt_boxes2d"] = np.concatenate([
                np.asarray(data_dict["gt_boxes2d"], np.float32).reshape(-1, 4),
                np.zeros((len(sampled_boxes), 4), np.float32),
            ])
        return data_dict
