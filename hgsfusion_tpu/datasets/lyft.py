"""Lyft Level 5 dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/lyft/lyft_dataset.py + lyft_utils.py +
lyft_mAP_eval/. The Lyft SDK is a fork of the nuScenes devkit with the
same JSON table schema, so info creation reuses `NuScenesTables` (table
dir `<root>/data/`); evaluation runs either the KITTI protocol on
axis-mapped boxes or the devkit-free Lyft mAP in `eval/lyft_eval.py`.
Lyft lidar bins are 5-float rows that occasionally ship truncated — the
reference trims the remainder (lyft_dataset.py:44-47), replicated here.
"""
from __future__ import annotations

import copy
import pickle
from functools import reduce
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate
from .nuscenes import NuScenesTables, transform_matrix

MAP_NAME_TO_KITTI = {
    "car": "Car", "pedestrian": "Pedestrian", "truck": "Truck",
    "bicycle": "Cyclist", "motorcycle": "Cyclist",
}


class LyftDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        root_path = (
            Path(root_path) if root_path is not None
            else Path(dataset_cfg.DATA_PATH)
        ) / dataset_cfg.VERSION
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.infos = []
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.include_lyft_data(self.mode)

    def include_lyft_data(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(
                f"Total samples for lyft dataset: {len(self.infos)}")

    # -- lidar IO -------------------------------------------------------
    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        # note the 1.5x x-radius (lyft_dataset.py:38-40)
        return points[~((np.abs(points[:, 0]) < center_radius * 1.5)
                        & (np.abs(points[:, 1]) < center_radius))]

    def _read_bin(self, path):
        pts = np.fromfile(str(path), dtype=np.float32)
        if pts.shape[0] % 5 != 0:  # truncated-file quirk
            pts = pts[: pts.shape[0] - (pts.shape[0] % 5)]
        return pts.reshape(-1, 5)[:, :4]

    def get_sweep(self, sweep_info):
        points = self.remove_ego_points(
            self._read_bin(self.root_path / sweep_info["lidar_path"]))
        tm = sweep_info["transform_matrix"]
        if tm is not None:
            hom = np.concatenate(
                [points[:, :3], np.ones((len(points), 1), np.float32)],
                axis=1)
            points[:, :3] = (hom @ np.asarray(tm, np.float32).T)[:, :3]
        times = sweep_info["time_lag"] * np.ones((len(points), 1), np.float32)
        return points, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        points = self._read_bin(self.root_path / info["lidar_path"])
        pts_list = [points]
        times_list = [np.zeros((len(points), 1), np.float32)]
        n_sweep = len(info["sweeps"])
        if n_sweep > 0 and max_sweeps > 1:
            for k in np.random.choice(
                    n_sweep, min(max_sweeps - 1, n_sweep), replace=False):
                p, t = self.get_sweep(info["sweeps"][k])
                pts_list.append(p)
                times_list.append(t)
        points = np.concatenate(pts_list, axis=0)
        times = np.concatenate(times_list, axis=0).astype(points.dtype)
        return np.concatenate([points, times], axis=1)

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.infos))

    def _get_one(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(index, max_sweeps=self.max_sweeps)
        input_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info["token"]},
        }
        if "gt_boxes" in info:
            input_dict.update({
                "gt_boxes": info["gt_boxes"],
                "gt_names": info["gt_names"],
            })
        return self.prepare_data(input_dict)

    # -- predictions / eval ---------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i, pd in enumerate(pred_dicts):
            boxes = np.asarray(pd["pred_boxes"]).reshape(-1, 7)
            labels = np.asarray(pd["pred_labels"], np.int64)
            annos.append({
                "name": (np.asarray(class_names)[labels - 1]
                         if len(labels) else np.zeros(0)),
                "score": np.asarray(pd["pred_scores"]),
                "boxes_lidar": boxes,
                "pred_labels": labels,
                "frame_id": batch_dict["frame_id"][i],
                "metadata": batch_dict["metadata"][i]
                if "metadata" in batch_dict else {"token": None},
            })
        return annos

    def kitti_eval(self, eval_det_annos, eval_gt_annos, class_names):
        from ..eval.kitti_official_eval import kitti_official_eval
        from .waymo import transform_annotations_to_kitti_format

        transform_annotations_to_kitti_format(
            eval_det_annos, MAP_NAME_TO_KITTI)
        # gt infos carry gt_names/gt_boxes keys
        for anno in eval_gt_annos:
            anno["name"] = anno.pop("gt_names")
            anno["boxes_lidar"] = anno.pop("gt_boxes")
        transform_annotations_to_kitti_format(
            eval_gt_annos, MAP_NAME_TO_KITTI)
        classes = sorted({
            MAP_NAME_TO_KITTI[c] for c in class_names
            if c in MAP_NAME_TO_KITTI})
        return kitti_official_eval(eval_gt_annos, eval_det_annos, classes)

    def lyft_eval(self, det_annos, class_names, iou_thresholds=(0.5,)):
        from ..eval.lyft_eval import (
            format_lyft_results,
            get_average_precisions,
        )

        by_token = {info["token"]: info for info in self.infos}
        gt_list, pred_list = [], []
        for info in self.infos:
            if "gt_boxes" not in info:
                continue
            for k in range(len(info["gt_boxes"])):
                gt_list.append({
                    "sample_token": info["token"],
                    "name": str(info["gt_names"][k]),
                    "box": np.asarray(info["gt_boxes"][k][:7], np.float64),
                })
        for det in det_annos:
            tok = det["metadata"]["token"]
            if tok not in by_token:
                continue
            for k in range(len(det["name"])):
                pred_list.append({
                    "sample_token": tok,
                    "name": str(det["name"][k]),
                    "box": np.asarray(
                        det["boxes_lidar"][k][:7], np.float64),
                    "score": float(det["score"][k]),
                })
        aps = get_average_precisions(
            gt_list, pred_list, class_names, list(iou_thresholds))
        return format_lyft_results(
            aps, class_names, list(iou_thresholds),
            version=self.dataset_cfg.VERSION)

    def evaluation(self, det_annos, class_names, **kwargs):
        metric = kwargs.get("eval_metric", "lyft")
        if metric == "kitti":
            return self.kitti_eval(
                copy.deepcopy(det_annos),
                [copy.deepcopy(i) for i in self.infos], class_names)
        if metric == "lyft":
            return self.lyft_eval(
                det_annos, class_names,
                iou_thresholds=self.dataset_cfg.get(
                    "EVAL_LYFT_IOU_LIST", [0.5]))
        raise NotImplementedError(metric)

    # -- gt database -----------------------------------------------------
    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        db_path = self.root_path / "gt_database"
        db_info_path = self.root_path / f"lyft_dbinfos_{max_sweeps}sweeps.pkl"
        db_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            if "gt_boxes" not in info:
                continue
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            self.gt_db_add_frame(
                points, info["gt_boxes"], info["gt_names"], db_path,
                self.root_path, lambda i, n: f"{idx}_{n}_{i}.bin",
                all_db_infos, used_classes,
                extra=lambda i: {"image_idx": idx},
            )
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos


def create_lyft_info(data_path, save_path, version="trainval",
                     train_scenes=None, val_scenes=None, max_sweeps=10):
    """Devkit-free info creation over the Lyft JSON tables
    (lyft_utils.fill_trainval_infos:86-222; tables live in
    `<data_path>/<version>/data/`, bins under `<data_path>/<version>/`)."""
    data_path = Path(data_path) / version
    save_path = Path(save_path)
    tables = NuScenesTables(data_path, "data")
    scenes = list(tables.rec["scene"].values())
    name_to_token = {s["name"]: s["token"] for s in scenes}
    if train_scenes is None:
        train_scenes = [s["name"] for s in scenes]
        val_scenes = []
    train_tokens = {name_to_token[n] for n in train_scenes
                    if n in name_to_token}
    val_tokens = {name_to_token[n] for n in (val_scenes or [])
                  if n in name_to_token}

    train_infos, val_infos = [], []
    samples = sorted(tables.sample, key=lambda s: s["timestamp"])
    for sample in samples:
        ref_sd_token = sample["data"]["LIDAR_TOP"]
        ref_sd = tables.get("sample_data", ref_sd_token)
        ref_cs = tables.get(
            "calibrated_sensor", ref_sd["calibrated_sensor_token"])
        ref_pose = tables.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]
        ref_lidar_path, ref_boxes, _ = tables.get_sample_data(ref_sd_token)

        info = {
            "lidar_path": ref_sd["filename"],
            "token": sample["token"],
            "sweeps": [],
            "ref_from_car": transform_matrix(
                ref_cs["translation"], ref_cs["rotation"], inverse=True),
            "ref_to_car": transform_matrix(
                ref_cs["translation"], ref_cs["rotation"], inverse=False),
            "car_from_global": transform_matrix(
                ref_pose["translation"], ref_pose["rotation"], inverse=True),
            "car_to_global": transform_matrix(
                ref_pose["translation"], ref_pose["rotation"], inverse=False),
            "timestamp": ref_time,
        }

        curr = ref_sd
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr["prev"] == "":
                if len(sweeps) == 0:
                    sweeps.append({
                        "lidar_path": ref_sd["filename"],
                        "sample_data_token": curr["token"],
                        "transform_matrix": None,
                        "time_lag": 0.0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr = tables.get("sample_data", curr["prev"])
                pose_c = tables.get("ego_pose", curr["ego_pose_token"])
                cs_c = tables.get(
                    "calibrated_sensor", curr["calibrated_sensor_token"])
                tm = reduce(np.dot, [
                    info["ref_from_car"], info["car_from_global"],
                    transform_matrix(pose_c["translation"],
                                     pose_c["rotation"], inverse=False),
                    transform_matrix(cs_c["translation"],
                                     cs_c["rotation"], inverse=False),
                ])
                sweeps.append({
                    "lidar_path": curr["filename"],
                    "sample_data_token": curr["token"],
                    "transform_matrix": tm,
                    "time_lag": ref_time - 1e-6 * curr["timestamp"],
                })
        info["sweeps"] = sweeps

        locs = np.array(
            [b["center"] for b in ref_boxes], np.float64).reshape(-1, 3)
        dims = np.array(
            [b["wlh"] for b in ref_boxes], np.float64
        ).reshape(-1, 3)[:, [1, 0, 2]]
        rots = np.array(
            [b["yaw"] for b in ref_boxes], np.float64).reshape(-1, 1)
        info["gt_boxes"] = np.concatenate([locs, dims, rots], axis=1)
        info["gt_names"] = np.array([b["name"] for b in ref_boxes])

        if sample["scene_token"] in train_tokens:
            train_infos.append(info)
        elif sample["scene_token"] in val_tokens:
            val_infos.append(info)

    save_path.mkdir(parents=True, exist_ok=True)
    with open(save_path / f"lyft_infos_train.pkl", "wb") as f:
        pickle.dump(train_infos, f)
    with open(save_path / f"lyft_infos_val.pkl", "wb") as f:
        pickle.dump(val_infos, f)
    return train_infos, val_infos
