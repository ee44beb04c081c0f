"""ONCE dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/once/once_dataset.py + once_toolkits.py
(Octopus). The toolkit is inlined (it is path plumbing over the raw
layout `<root>/data/<seq>/{<seq>.json, lidar_roof/<frame>.bin,
cam0X/<frame>.jpg}`); evaluation uses the devkit-free numpy protocol in
`eval/once_eval.py`; point painting replaces the torch grid_sample with
the same bilinear math in numpy.
"""
from __future__ import annotations

import copy
import json
import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate

CAM_NAMES = ("cam01", "cam03", "cam05", "cam06", "cam07", "cam08", "cam09")


def _bilinear_sample_hw(feat_hwc, uv_norm):
    """torch F.grid_sample(align_corners=False, zeros) equivalent for the
    point-painting projection (once_dataset.py:105-118): feat (H, W, C),
    uv in [-1, 1] -> (N, C)."""
    h, w, c = feat_hwc.shape
    ix = (uv_norm[:, 0] + 1) * w / 2 - 0.5
    iy = (uv_norm[:, 1] + 1) * h / 2 - 0.5
    x0, y0 = np.floor(ix), np.floor(iy)
    tx, ty = ix - x0, iy - y0
    out = np.zeros((len(uv_norm), c), np.float64)
    for dx, dy, wgt in ((0, 0, (1 - tx) * (1 - ty)), (1, 0, tx * (1 - ty)),
                        (0, 1, (1 - tx) * ty), (1, 1, tx * ty)):
        xi = (x0 + dx).astype(np.int64)
        yi = (y0 + dy).astype(np.int64)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = np.clip(xi, 0, w - 1)
        yi_c = np.clip(yi, 0, h - 1)
        out += feat_hwc[yi_c, xi_c] * (wgt * valid)[:, None]
    return out


class ONCEDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.split = dataset_cfg.DATA_SPLIT["train" if training else "test"]
        assert self.split in [
            "train", "val", "test", "raw_small", "raw_medium", "raw_large"]
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_seq_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else None
        )
        self.cam_names = list(CAM_NAMES)
        self.once_infos = []
        self.include_once_data(self.split)

    def include_once_data(self, split):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[split]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                infos.extend(pickle.load(f))
        if not split.startswith("raw"):  # raw_small/raw_medium/raw_large
            infos = [i for i in infos if "annos" in i]
        self.once_infos.extend(infos)
        if self.logger:
            self.logger.info(
                f"Total samples for ONCE dataset: {len(infos)}")

    # -- raw IO (replaces once_toolkits.Octopus) ------------------------
    def get_lidar(self, sequence_id, frame_id):
        path = (self.root_path / "data" / sequence_id / "lidar_roof"
                / f"{frame_id}.bin")
        return np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)

    def get_image(self, sequence_id, frame_id, cam_name):
        from PIL import Image

        path = (self.root_path / "data" / sequence_id / cam_name
                / f"{frame_id}.jpg")
        return np.asarray(Image.open(str(path)))

    def point_painting(self, points, info, semseg_dir="./",
                       used_classes=(0, 1, 2, 3, 4, 5)):
        """Append per-point semantic one-hot scores projected from the 7
        cameras (once_dataset.py:84-120; user-provided seg maps)."""
        from PIL import Image

        painted = np.zeros((len(points), len(used_classes)))
        for cam_name in self.cam_names:
            img_path = (Path(semseg_dir) / str(info["sequence_id"])
                        / cam_name / f"{info['frame_id']}_label.png")
            calib = info["calib"][cam_name]
            cam_2_velo = np.asarray(calib["cam_to_velo"], np.float64)
            intr = np.hstack([
                np.asarray(calib["cam_intrinsic"], np.float64),
                np.zeros((3, 1))])
            hom = np.hstack([
                points[:, :3], np.ones((len(points), 1), np.float32)])
            pts_cam = hom @ np.linalg.inv(cam_2_velo).T
            mask = pts_cam[:, 2] > 0
            pts_img = pts_cam[mask] @ intr.T
            uv = pts_img[:, :2] / pts_img[:, [2]]
            seg_map = np.asarray(Image.open(img_path))
            h, w = seg_map.shape
            feats = np.zeros((h, w, len(used_classes)))
            for ci, cls_i in enumerate(used_classes):
                feats[..., ci] = seg_map == cls_i
            uv_norm = np.stack([
                (uv[:, 0] - w / 2) / (w / 2),
                (uv[:, 1] - h / 2) / (h / 2)], axis=1)
            painted[mask] = _bilinear_sample_hw(feats, uv_norm)
        return np.concatenate([points, painted], axis=1)

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.once_infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.once_infos))

    def _get_one(self, index):
        info = copy.deepcopy(self.once_infos[index])
        points = self.get_lidar(info["sequence_id"], info["frame_id"])
        if self.dataset_cfg.get("POINT_PAINTING", False):
            points = self.point_painting(points, info)
        input_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            input_dict.update({
                "gt_names": info["annos"]["name"],
                "gt_boxes": info["annos"]["boxes_3d"],
            })
        data = self.prepare_data(input_dict)
        if data is not None:
            data.pop("num_points_in_gt", None)
        return data

    # -- infos ----------------------------------------------------------
    def get_infos(self, sample_seq_list=None):
        """Per-sequence json -> info dicts (once_dataset.py:155-292)."""
        from ..ops.points_in_boxes import points_in_boxes

        infos = []
        seq_list = (sample_seq_list if sample_seq_list is not None
                    else self.sample_seq_list) or []
        for seq_idx in seq_list:
            seq_path = self.root_path / "data" / seq_idx
            with open(seq_path / f"{seq_idx}.json") as f:
                seq_json = json.load(f)
            meta_info = seq_json.get("meta_info")
            calib = seq_json["calib"]
            frames = seq_json["frames"]
            for f_idx, frame in enumerate(frames):
                frame_id = frame["frame_id"]
                info = {
                    "sequence_id": seq_idx,
                    "frame_id": frame_id,
                    "timestamp": int(frame_id),
                    "prev_id": (frames[f_idx - 1]["frame_id"]
                                if f_idx > 0 else None),
                    "next_id": (frames[f_idx + 1]["frame_id"]
                                if f_idx + 1 < len(frames) else None),
                    "meta_info": meta_info,
                    "lidar": str(seq_path / "lidar_roof" / f"{frame_id}.bin"),
                    "pose": np.asarray(frame["pose"]),
                }
                calib_dict = {}
                for cam in self.cam_names:
                    if cam not in calib:
                        continue
                    info[cam] = str(seq_path / cam / f"{frame_id}.jpg")
                    calib_dict[cam] = {
                        "cam_to_velo": np.asarray(calib[cam]["cam_to_velo"]),
                        "cam_intrinsic": np.asarray(
                            calib[cam]["cam_intrinsic"]),
                        "distortion": np.asarray(calib[cam]["distortion"]),
                    }
                info["calib"] = calib_dict
                if "annos" in frame:
                    annos = frame["annos"]
                    boxes_3d = np.asarray(annos["boxes_3d"], np.float32)
                    if boxes_3d.shape[0] == 0:
                        continue
                    annos_dict = {
                        "name": np.asarray(annos["names"]),
                        "boxes_3d": boxes_3d,
                        "boxes_2d": {
                            cam: np.asarray(annos["boxes_2d"][cam])
                            for cam in annos.get("boxes_2d", {})
                        },
                    }
                    points = self.get_lidar(seq_idx, frame_id)
                    inside = np.asarray(points_in_boxes(
                        points[:, :3], boxes_3d[:, :7]))
                    annos_dict["num_points_in_gt"] = inside.sum(
                        axis=1).astype(np.int32)
                    info["annos"] = annos_dict
                infos.append(info)
        return infos

    def create_groundtruth_database(self, info_path=None, used_classes=None,
                                    split="train"):
        db_path = self.root_path / (
            "gt_database" if split == "train" else f"gt_database_{split}")
        db_info_path = self.root_path / f"once_dbinfos_{split}.pkl"
        db_path.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        all_db_infos = {}
        for info in infos:
            if "annos" not in info:
                continue
            points = self.get_lidar(info["sequence_id"], info["frame_id"])
            fid = info["frame_id"]
            self.gt_db_add_frame(
                points, info["annos"]["boxes_3d"], info["annos"]["name"],
                db_path, self.root_path,
                lambda i, n: f"{fid}_{n}_{i}.bin", all_db_infos,
                used_classes,
            )
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos

    # -- predictions / eval ---------------------------------------------
    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i, pd in enumerate(pred_dicts):
            scores = np.asarray(pd["pred_scores"])
            boxes = np.asarray(pd["pred_boxes"]).reshape(-1, 7)
            labels = np.asarray(pd["pred_labels"], np.int64)
            annos.append({
                "name": (np.asarray(class_names)[labels - 1]
                         if len(labels) else np.zeros(0)),
                "score": scores,
                "boxes_3d": boxes,
                "frame_id": batch_dict["frame_id"][i],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..eval.once_eval import get_evaluation_results

        gt_annos = [copy.deepcopy(info["annos"]) for info in self.once_infos]
        return get_evaluation_results(
            gt_annos, copy.deepcopy(det_annos), class_names)


def create_once_infos(dataset_cfg, class_names, data_path, save_path,
                      splits=("train", "val")):
    """once_dataset.create_once_infos:386-409."""
    save_path = Path(save_path)
    out = {}
    for split in splits:
        cfg = copy.deepcopy(dataset_cfg)
        cfg.DATA_SPLIT = {"train": split, "test": split}
        dataset = ONCEDataset(
            dataset_cfg=cfg, class_names=class_names, root_path=data_path,
            training=False)
        infos = dataset.get_infos()
        filename = save_path / f"once_infos_{split}.pkl"
        with open(filename, "wb") as f:
            pickle.dump(infos, f)
        out[split] = infos
    return out
