"""PandaSet (Hesai) dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/pandaset/pandaset_dataset.py. The external
`pandaset` devkit is replaced by direct reads of the raw layout
(`<root>/dataset/<seq>/{lidar/<frame:02d>.pkl.gz, lidar/poses.json,
annotations/cuboids/<frame:02d>.pkl.gz}` — gzipped pandas pickles) and
devkit-free pose geometry (`lidar_points_to_ego` = R(q)^T (p - t)).
PandaSet world-frame points are mapped to ego, then to the normative
frame by swapping x/y and negating y (pandaset_dataset.py:150-185); boxes
get the ego yaw via the world->ego z-rotation estimate (:187-254). The
reference ships no official evaluation (evaluation returns empty,
:437-444) — replicated, with an opt-in KITTI-protocol evaluation via
TRAINING_CATEGORIES mapping as an extension.
"""
from __future__ import annotations

import copy
import json
import os
import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate
from .nuscenes import quat_to_rotmat


def pose_dict_to_numpy(pose):
    return [
        pose["position"]["x"], pose["position"]["y"], pose["position"]["z"],
        pose["heading"]["w"], pose["heading"]["x"], pose["heading"]["y"],
        pose["heading"]["z"],
    ]


def pose_numpy_to_dict(pose):
    return {
        "position": {"x": pose[0], "y": pose[1], "z": pose[2]},
        "heading": {"w": pose[3], "x": pose[4], "y": pose[5], "z": pose[6]},
    }


def lidar_points_to_ego(points, pose):
    """World -> ego (pandaset devkit ps.geometry.lidar_points_to_ego)."""
    q = [pose["heading"][k] for k in ("w", "x", "y", "z")]
    t = np.asarray([pose["position"][k] for k in ("x", "y", "z")])
    return (np.asarray(points, np.float64) - t) @ quat_to_rotmat(q)


def ego_to_lidar_points(points, pose):
    """Ego -> world (ps.geometry.ego_to_lidar_points)."""
    q = [pose["heading"][k] for k in ("w", "x", "y", "z")]
    t = np.asarray([pose["position"][k] for k in ("x", "y", "z")])
    return np.asarray(points, np.float64) @ quat_to_rotmat(q).T + t


class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        self.sequences = dataset_cfg.SEQUENCES[self.split]
        self.pandaset_infos = []
        self.include_pandaset_infos(self.mode)
        self._poses_cache = {}

    def include_pandaset_infos(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                self.pandaset_infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(
                f"Total samples for PandaSet dataset: "
                f"{len(self.pandaset_infos)}")

    def set_split(self, split):
        self.split = split
        self.sequences = self.dataset_cfg.SEQUENCES[split]
        self.pandaset_infos = []

    # -- raw IO ---------------------------------------------------------
    def _get_pose(self, info):
        seq = info["sequence"]
        if seq not in self._poses_cache:
            with open(self.root_path / "dataset" / seq / "lidar"
                      / "poses.json") as f:
                self._poses_cache[seq] = json.load(f)
        return self._poses_cache[seq][info["frame_idx"]]

    def _get_lidar_points(self, info, pose):
        """World-frame pandas pickle -> normative ego points with [0, 1]
        intensity (pandaset_dataset.py:150-185)."""
        import pandas as pd

        lidar_frame = pd.read_pickle(info["lidar_path"])
        device = self.dataset_cfg.get("LIDAR_DEVICE", 0)
        if device != -1 and "d" in lidar_frame:
            lidar_frame = lidar_frame[lidar_frame.d == device]
        world = lidar_frame.to_numpy()
        ego = lidar_points_to_ego(world[:, :3], pose)
        ego = ego[:, [1, 0, 2]]
        ego[:, 1] = -ego[:, 1]
        intensity = world[:, 3] / 255.0
        return np.concatenate(
            [ego, intensity[:, None]], axis=1).astype(np.float32)

    def _get_annotations(self, info, pose):
        """Cuboids pickle -> normative 7-dof boxes + mapped labels
        (pandaset_dataset.py:187-254)."""
        import pandas as pd

        cuboids = pd.read_pickle(info["cuboids_path"])
        device = self.dataset_cfg.get("LIDAR_DEVICE", 0)
        if device != -1 and "cuboids.sensor_id" in cuboids:
            cuboids = cuboids[cuboids["cuboids.sensor_id"] != 1 - device]
        centers = np.stack([
            cuboids["position.x"].to_numpy(),
            cuboids["position.y"].to_numpy(),
            cuboids["position.z"].to_numpy()], axis=1)
        dxs = cuboids["dimensions.x"].to_numpy()
        dys = cuboids["dimensions.y"].to_numpy()
        dzs = cuboids["dimensions.z"].to_numpy()
        yaws = cuboids["yaw"].to_numpy()
        labels = cuboids["label"].to_numpy()
        mapping = dict(self.dataset_cfg.get("TRAINING_CATEGORIES", {}))
        labels = np.array([mapping.get(lab, lab) for lab in labels])

        ego_centers = lidar_points_to_ego(centers, pose)
        # ego yaw of the world y-axis (pitch assumed negligible)
        yaxis = lidar_points_to_ego(
            np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), pose)
        yaxis = yaxis[1] - yaxis[0]
        zrot_world_to_ego = float(np.arctan2(-yaxis[0], yaxis[1]))
        ego_boxes = np.stack([
            ego_centers[:, 1], -ego_centers[:, 0], ego_centers[:, 2],
            dys, dxs, dzs, yaws + zrot_world_to_ego], axis=1)
        return ego_boxes.astype(np.float32), labels, zrot_world_to_ego

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.pandaset_infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.pandaset_infos))

    def _get_one(self, index):
        info = self.pandaset_infos[index]
        pose = self._get_pose(info)
        points = self._get_lidar_points(info, pose)
        boxes, labels, zrot = self._get_annotations(info, pose)
        input_dict = {
            "points": points,
            "gt_boxes": boxes,
            "gt_names": labels,
            "sequence": int(info["sequence"]),
            "frame_idx": info["frame_idx"],
            "frame_id": f"{info['sequence']}_{info['frame_idx']:02d}",
            "zrot_world_to_ego": zrot,
            "pose": pose_dict_to_numpy(pose),
        }
        return self.prepare_data(input_dict)

    # -- infos ----------------------------------------------------------
    def get_infos(self):
        """pandaset_dataset.py:358-383 without the devkit sequence cache."""
        infos = []
        for seq in self.sequences:
            lidar_dir = self.root_path / "dataset" / seq / "lidar"
            frames = sorted(lidar_dir.glob("*.pkl.gz"))
            if len(frames) > 100:
                raise ValueError(
                    "sequences longer than 100 frames are not supported "
                    f"({seq} has {len(frames)})")
            for ii in range(len(frames)):
                infos.append({
                    "sequence": seq,
                    "frame_idx": ii,
                    "lidar_path": str(
                        lidar_dir / f"{ii:02d}.pkl.gz"),
                    "cuboids_path": str(
                        self.root_path / "dataset" / seq / "annotations"
                        / "cuboids" / f"{ii:02d}.pkl.gz"),
                })
        return infos

    def create_groundtruth_database(self, info_path=None, used_classes=None,
                                    split="train"):
        db_path = self.root_path / (
            "gt_database" if split == "train" else f"gt_database_{split}")
        db_info_path = self.root_path / f"pandaset_dbinfos_{split}.pkl"
        db_path.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        all_db_infos = {}
        for info in infos:
            pose = self._get_pose(info)
            points = self._get_lidar_points(info, pose)
            gt_boxes, names, _ = self._get_annotations(info, pose)
            fidx = info["frame_idx"]
            self.gt_db_add_frame(
                points, gt_boxes, names, db_path, self.root_path,
                lambda i, n: (
                    f"{fidx}_{n.replace('/', '').replace(' ', '')}_{i}.bin"
                ),
                all_db_infos, used_classes,
                extra=lambda i: {"difficulty": -1},
            )
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos

    # -- predictions / eval ---------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Normative -> pandaset-world prediction DataFrames
        (pandaset_dataset.py:256-356)."""
        import pandas as pd

        annos = []
        for i, pd_dict in enumerate(pred_dicts):
            boxes = np.asarray(pd_dict["pred_boxes"]).reshape(-1, 7)
            scores = np.asarray(pd_dict["pred_scores"])
            labels = np.asarray(pd_dict["pred_labels"], np.int64)
            zrot = float(np.asarray(batch_dict["zrot_world_to_ego"][i]))
            pose = pose_numpy_to_dict(np.asarray(batch_dict["pose"][i]))
            names = (np.asarray(class_names)[labels - 1]
                     if len(labels) else np.zeros(0))
            ego_centers = np.stack(
                [-boxes[:, 1], boxes[:, 0], boxes[:, 2]], axis=1)
            world = ego_to_lidar_points(ego_centers, pose)
            df = pd.DataFrame({
                "position.x": world[:, 0], "position.y": world[:, 1],
                "position.z": world[:, 2],
                "dimensions.x": boxes[:, 4], "dimensions.y": boxes[:, 3],
                "dimensions.z": boxes[:, 5],
                "yaw": (boxes[:, 6] - zrot) % (2 * np.pi),
                "label": names, "score": scores,
            })
            seq_id = str(int(batch_dict["sequence"][i])).zfill(3)
            frame_idx = batch_dict["frame_idx"][i]
            anno = {
                "preds": df, "name": list(names),
                "frame_idx": frame_idx, "sequence": seq_id,
                # lidar-frame copies for the opt-in kitti-protocol eval
                "boxes_lidar": boxes, "score": scores,
            }
            if output_path is not None:
                out = (Path(output_path) / seq_id / "predictions"
                       / "cuboids")
                out.mkdir(parents=True, exist_ok=True)
                df.to_pickle(
                    out / f"{str(int(frame_idx)).zfill(2)}.pkl.gz")
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """No official PandaSet evaluation exists (the reference returns an
        empty result, pandaset_dataset.py:437-444). eval_metric='kitti'
        optionally runs the KITTI protocol on the normative-frame boxes."""
        if kwargs.get("eval_metric") == "kitti":
            from ..eval.kitti_official_eval import kitti_official_eval
            from .waymo import transform_annotations_to_kitti_format

            map_to_kitti = dict(self.dataset_cfg.get(
                "MAP_CLASS_TO_KITTI",
                {"Car": "Car", "Pedestrian": "Pedestrian"}))
            eval_det = copy.deepcopy(det_annos)
            eval_gt = []
            for info in self.pandaset_infos:
                pose = self._get_pose(info)
                boxes, names, _ = self._get_annotations(info, pose)
                eval_gt.append({
                    "name": names, "boxes_lidar": boxes,
                })
            transform_annotations_to_kitti_format(eval_det, map_to_kitti)
            transform_annotations_to_kitti_format(eval_gt, map_to_kitti)
            classes = sorted({
                map_to_kitti.get(c, c) for c in class_names
                if map_to_kitti.get(c, c) in
                ("Car", "Pedestrian", "Cyclist", "Truck")})
            return kitti_official_eval(eval_gt, eval_det, classes)
        if self.logger:
            self.logger.warning(
                "Evaluation is not implemented for Pandaset as there is "
                "no official one. Returning an empty evaluation result.")
        return "", {}


def create_pandaset_infos(dataset_cfg, class_names, data_path, save_path,
                          splits=("train", "val", "test")):
    """pandaset_dataset.create_pandaset_infos:446-470."""
    save_path = Path(save_path)
    out = {}
    for split in splits:
        dataset = PandasetDataset(
            dataset_cfg=dataset_cfg, class_names=class_names,
            root_path=data_path, training=False)
        dataset.set_split(split)
        infos = dataset.get_infos()
        with open(save_path / f"pandaset_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)
        out[split] = infos
    return out
