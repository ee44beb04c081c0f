"""Custom point-cloud dataset (inherited family; not used by the HGS path).

Reference: pcdet/datasets/custom/custom_dataset.py — the OpenPCDet
"bring-your-own-data" format:
  <root>/points/<id>.npy          (N, num_features) float32 clouds
  <root>/labels/<id>.txt          lines "x y z dx dy dz heading category"
  <root>/ImageSets/<split>.txt    sample id lists
Evaluation maps the custom classes onto KITTI classes via
MAP_CLASS_TO_KITTI (custom_dataset.py:113-140) and reuses the KITTI AP
core. Info-file generation mirrors get_infos/create_custom_infos:142-166.
"""
from __future__ import annotations

import pickle

import numpy as np

from .dataset import DatasetTemplate


def lidar_box_to_pseudo_camera(boxes):
    """Lidar-frame (x, y, z, dx, dy, dz, heading) -> KITTI camera-format
    (location bottom-center, dims (l, h, w), ry) under the canonical
    calib-free axis map x_c=-y_l, y_c=-z_l (down), z_c=x_l — the
    custom dataset has no calibration, so evaluation uses this fixed
    transform on BOTH gt and detections (geometry-preserving)."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    loc = np.stack(
        [-boxes[:, 1], -(boxes[:, 2] - boxes[:, 5] / 2.0), boxes[:, 0]],
        axis=1,
    )
    dims = boxes[:, [3, 5, 4]]  # l, h, w
    ry = -boxes[:, 6] - np.pi / 2.0
    return loc, dims, ry


class CustomDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        self.num_point_features = int(
            dataset_cfg.get("NUM_POINT_FEATURES", 4)
        )
        self.map_class_to_kitti = dict(
            dataset_cfg.get("MAP_CLASS_TO_KITTI", {})
        )
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_id_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.infos = []
        self.load_infos()

    # -- raw IO ---------------------------------------------------------
    def get_lidar(self, idx):
        pts = np.load(self.root_path / "points" / f"{idx}.npy")
        return pts.astype(np.float32).reshape(-1, self.num_point_features)

    def get_label(self, idx):
        lines = open(self.root_path / "labels" / f"{idx}.txt").readlines()
        boxes, names = [], []
        for line in lines:
            parts = line.strip().split(" ")
            boxes.append([float(v) for v in parts[:7]])
            names.append(parts[7])
        return (np.asarray(boxes, np.float32).reshape(-1, 7),
                np.asarray(names))

    # -- infos ----------------------------------------------------------
    def load_infos(self):
        path = self.root_path / f"custom_infos_{self.split}.pkl"
        if path.exists():
            with open(path, "rb") as f:
                self.infos = pickle.load(f)
        elif self.logger is not None and self.sample_id_list:
            self.logger.warning(
                f"no info file at {path}; run create_infos first"
            )

    def create_infos(self, splits=("train", "val"), save=True):
        """get_infos + create_custom_infos (custom_dataset.py:142-166,
        233-256): gt boxes already live in the unified lidar frame."""
        all_infos = {}
        for split in splits:
            split_file = self.root_path / "ImageSets" / f"{split}.txt"
            ids = (
                [x.strip() for x in open(split_file).readlines()]
                if split_file.exists() else []
            )
            infos = []
            for idx in ids:
                info = {
                    "point_cloud": {
                        "num_features": self.num_point_features,
                        "lidar_idx": idx,
                    },
                }
                label_file = self.root_path / "labels" / f"{idx}.txt"
                if label_file.exists():
                    boxes, names = self.get_label(idx)
                    loc, dims, ry = lidar_box_to_pseudo_camera(boxes)
                    info["annos"] = {
                        "name": names,
                        "gt_boxes_lidar": boxes,
                        # KITTI-eval compatibility fields (pseudo camera)
                        "truncated": np.zeros(len(names)),
                        "occluded": np.zeros(len(names)),
                        "alpha": np.zeros(len(names)),
                        "bbox": np.tile([0, 0, 50, 50], (len(names), 1)).astype(np.float32),
                        "dimensions": dims,
                        "location": loc,
                        "rotation_y": ry,
                        "score": np.zeros(len(names)),
                        "difficulty": np.zeros(len(names), np.int32),
                    }
                infos.append(info)
            all_infos[split] = infos
            if save:
                out = self.root_path / f"custom_infos_{split}.pkl"
                with open(out, "wb") as f:
                    pickle.dump(infos, f)
        return all_infos

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.infos))

    def _get_one(self, index):
        info = self.infos[index]
        idx = info["point_cloud"]["lidar_idx"]
        input_dict = {
            "frame_id": idx,
            "points": self.get_lidar(idx),
        }
        if "annos" in info:
            input_dict["gt_boxes"] = info["annos"]["gt_boxes_lidar"]
            input_dict["gt_names"] = info["annos"]["name"]
        return self.prepare_data(input_dict)

    # -- prediction/eval ------------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Lidar-frame boxes -> KITTI-style annos (custom_dataset
        generate_prediction_dicts via DatasetTemplate)."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            boxes = np.asarray(pd["pred_boxes"]).reshape(-1, 7)
            labels = np.asarray(pd["pred_labels"], np.int64)
            scores = np.asarray(pd["pred_scores"])
            n = len(boxes)
            loc, dims, ry = lidar_box_to_pseudo_camera(boxes)
            annos.append({
                "name": np.asarray(
                    [class_names[l - 1] for l in labels]
                ),
                "boxes_lidar": boxes,
                "score": scores,
                "truncated": np.zeros(n),
                "occluded": np.zeros(n),
                "alpha": np.zeros(n),
                "bbox": np.tile([0, 0, 50, 50], (n, 1)).astype(np.float32),
                "dimensions": dims,
                "location": loc,
                "rotation_y": ry,
                "frame_id": batch_dict["frame_id"][i],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """KITTI-protocol AP with the configured class mapping
        (custom_dataset.py:113-140): classes are renamed onto their KITTI
        counterparts on both sides, then the official evaluator runs."""
        import copy

        from ..eval.kitti_official_eval import kitti_official_eval

        gt_annos = copy.deepcopy([info["annos"] for info in self.infos])
        det_annos = copy.deepcopy(det_annos)
        for annos in (gt_annos, det_annos):
            for a in annos:
                a["name"] = np.asarray(
                    [self.map_class_to_kitti.get(n, n) for n in a["name"]]
                )
        kitti_classes = sorted(
            {self.map_class_to_kitti.get(c, c) for c in class_names}
        )
        return kitti_official_eval(gt_annos, det_annos, kitti_classes)
