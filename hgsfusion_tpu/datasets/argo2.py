"""Argoverse 2 sensor dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/argo2/argo2_dataset.py (+argo2_utils/so3.py,
constants.py). The external `av2` package is replaced by direct
pandas/pyarrow feather reads: raw extraction
(`prepare`/`create_argo2_infos`, :19-167) walks
`<sensor_root>/{train,val}/<log>/sensors/lidar/<ts>.feather` +
`annotations.feather` and emits KITTI-layout velodyne bins + info pkls
(same bin_idx scheme: <split-prefix><seg:03d><frame:03d>); evaluation
(:416-485) runs the devkit-free protocol in `eval/argo2_eval.py` on the
val_anno.feather table. Quaternion<->yaw math (argo2_utils/so3.py) reuses
the shared helpers in `datasets/nuscenes.py`.
"""
from __future__ import annotations

import copy
import os
import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate
from .nuscenes import quaternion_yaw, yaw_to_quat

# av2 cuboid serialization order (argo2_utils/constants.py)
LABEL_ATTR = (
    "tx_m", "ty_m", "tz_m", "length_m", "width_m", "height_m",
    "qw", "qx", "qy", "qz",
)


def quat_to_yaw_batch(quats):
    """(N, 4) wxyz -> (N,) yaw (argo2_utils/so3.py quat_to_yaw)."""
    return np.asarray(
        [quaternion_yaw(q) for q in np.asarray(quats, np.float64)])


def yaw_to_quat_batch(yaws):
    return np.stack([yaw_to_quat(y) for y in np.asarray(yaws)], axis=0)


class Argo2Dataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        self.root_split_path = self.root_path / (
            "training" if self.split != "test" else "testing")
        self.argo2_infos = []
        self.include_argo2_data(self.mode)
        self.evaluate_range = dataset_cfg.get("EVALUATE_RANGE", 200.0)

    def include_argo2_data(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                self.argo2_infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(
                f"Total samples for Argo2 dataset: {len(self.argo2_infos)}")

    def get_lidar(self, idx):
        lidar_file = self.root_split_path / "velodyne" / f"{idx}.bin"
        return np.fromfile(str(lidar_file), dtype=np.float32).reshape(-1, 4)

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.argo2_infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.argo2_infos))

    def _get_one(self, index):
        info = copy.deepcopy(self.argo2_infos[index])
        sample_idx = info["point_cloud"]["velodyne_path"].split(
            "/")[-1].rstrip(".bin")
        input_dict = {"frame_id": sample_idx}
        if "annos" in info and info["annos"]["name"] is not None:
            annos = info["annos"]
            gt_boxes = np.concatenate([
                np.asarray(annos["location"], np.float32),
                np.asarray(annos["dimensions"], np.float32),
                np.asarray(annos["rotation_y"],
                           np.float32)[..., None],
            ], axis=1)
            input_dict.update({
                "gt_names": np.asarray(annos["name"]),
                "gt_boxes": gt_boxes,
            })
        input_dict["points"] = self.get_lidar(sample_idx)
        return self.prepare_data(input_dict)

    # -- predictions / eval ---------------------------------------------
    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """KITTI-template prediction annos in the LIDAR frame
        (argo2_dataset.py:226-297)."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            boxes = np.asarray(pd["pred_boxes"]).reshape(-1, 7)
            scores = np.asarray(pd["pred_scores"])
            labels = np.asarray(pd["pred_labels"], np.int64)
            names = (np.asarray(class_names)[labels - 1]
                     if len(labels) else np.zeros(0))
            annos.append({
                "name": names,
                "alpha": (-np.arctan2(-boxes[:, 1], boxes[:, 0])
                          + boxes[:, 6]),
                "dimensions": boxes[:, 3:6],
                "location": boxes[:, 0:3],
                "rotation_y": boxes[:, 6],
                "score": scores,
                "boxes_lidar": boxes,
                "bbox": boxes,
                "frame_id": batch_dict["frame_id"][i],
            })
        return annos

    @staticmethod
    def lidar_box_to_argo2(boxes):
        """(N, 7) -> (N, 10) av2 cuboid params (argo2_dataset.py:406-414)."""
        boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
        return np.concatenate([
            boxes[:, :3], boxes[:, 3:6], yaw_to_quat_batch(boxes[:, 6]),
        ], axis=1)

    def format_results(self, outputs, class_names, pklfile_prefix=None):
        """Predictions -> av2-format DataFrame (argo2_dataset.py:340-404)."""
        import pandas as pd

        assert len(self.argo2_infos) == len(outputs)
        frames = []
        for info, out in zip(self.argo2_infos, outputs):
            log_id, ts = info["uuid"].split("/")
            df = pd.DataFrame(
                self.lidar_box_to_argo2(out["bbox"]),
                columns=list(LABEL_ATTR))
            df["score"] = out["score"]
            df["log_id"] = log_id
            df["timestamp_ns"] = int(ts)
            df["category"] = [str(n).upper() for n in out["name"]]
            frames.append(df)
        dts = (pd.concat(frames)
               .sort_values("score", ascending=False)
               .reset_index(drop=True))
        if pklfile_prefix is not None:
            path = str(pklfile_prefix)
            if not path.endswith(".feather"):
                path += ".feather"
            dts.to_feather(path)
        return dts.set_index(["log_id", "timestamp_ns"]).sort_index()

    def evaluation(self, results, class_names, **kwargs):
        """Argo2 protocol on val_anno.feather via `eval/argo2_eval.py`
        (replaces the av2 evaluate() call, argo2_dataset.py:449-485)."""
        import pandas as pd

        from ..eval.argo2_eval import argo2_detection_eval

        dts = self.format_results(
            results, class_names, kwargs.get("pklfile_prefix"))
        gts = pd.read_feather(self.root_path / "val_anno.feather")

        def to_by_uuid_cat(df, with_score):
            out = {}
            quats = df[["qw", "qx", "qy", "qz"]].to_numpy()
            yaws = quat_to_yaw_batch(quats) if len(quats) else np.zeros(0)
            boxes = np.concatenate([
                df[["tx_m", "ty_m", "tz_m",
                    "length_m", "width_m", "height_m"]].to_numpy(),
                yaws[:, None],
            ] + ([df[["score"]].to_numpy()] if with_score else []), axis=1)
            cats = df["category"].to_numpy()
            uuids = list(zip(df["log_id"].to_numpy(),
                             df["timestamp_ns"].to_numpy()))
            for k in range(len(df)):
                out.setdefault(str(cats[k]), {}).setdefault(
                    uuids[k], []).append(boxes[k])
            return {
                cat: {u: np.stack(v) for u, v in m.items()}
                for cat, m in out.items()
            }

        gt_map = to_by_uuid_cat(gts.reset_index(), with_score=False)
        dt_map = to_by_uuid_cat(dts.reset_index(), with_score=True)
        categories = sorted(
            set(gt_map) & {c.upper() for c in class_names}
        ) or sorted(gt_map)
        return argo2_detection_eval(
            gt_map, dt_map, categories, max_range_m=self.evaluate_range)


# ---------------------------------------------------------------------------
# raw extraction (devkit-free; argo2_dataset.py:19-167)
# ---------------------------------------------------------------------------
def prepare(root):
    """Walk `<root=.../sensor>/{train,val}` and build the uuid -> bin-idx
    map (argo2_dataset.prepare:109-158)."""
    root = str(root)
    ts2idx, seg_path_list, seg_split_list = {}, [], []
    for split, prefix in (("train", 0), ("val", 1)):
        split_root = os.path.join(root, split)
        if not os.path.isdir(split_root):
            continue
        for seg_idx, seg_name in enumerate(sorted(os.listdir(split_root))):
            seg_path = os.path.join(split_root, seg_name)
            seg_path_list.append(seg_path)
            seg_split_list.append(split)
            assert seg_idx < 1000
            lidar_dir = os.path.join(seg_path, "sensors/lidar")
            for frame_idx, frame in enumerate(sorted(os.listdir(lidar_dir))):
                assert frame_idx < 1000
                bin_idx = f"{prefix}{seg_idx:03d}{frame_idx:03d}"
                ts2idx[f"{seg_name}/{frame.split('.')[0]}"] = bin_idx
    return ts2idx, seg_path_list, seg_split_list


def process_single_segment(segment_path, split, info_list, ts2idx,
                           output_dir, save_bin=True):
    """Feather frames -> velodyne bins + info dicts
    (argo2_dataset.py:19-100)."""
    import pandas as pd

    segment_path = str(segment_path)
    test_mode = "test" in split
    seg_anno = None
    if not test_mode:
        seg_anno = pd.read_feather(
            os.path.join(segment_path, "annotations.feather"))
    segname = segment_path.rstrip("/").split("/")[-1]
    lidar_dir = os.path.join(segment_path, "sensors/lidar")
    for frame_name in sorted(os.listdir(lidar_dir)):
        ts = int(frame_name.split(".")[0])
        uuid = f"{segname}/{ts}"
        sample_idx = ts2idx[uuid]
        info = {
            "uuid": uuid,
            "sample_idx": sample_idx,
            "image": {},
            "point_cloud": {"num_features": 4, "velodyne_path": None},
            "calib": {},
            "pose": {},
            "sweeps": [],
            "annos": {
                "name": None, "truncated": None, "occluded": None,
                "alpha": None, "bbox": None, "dimensions": None,
                "location": None, "rotation_y": None, "index": None,
                "group_ids": None, "camera_id": None, "difficulty": None,
                "num_points_in_gt": None,
            },
        }
        if seg_anno is not None:
            frame_anno = seg_anno[seg_anno["timestamp_ns"] == ts]
            frame_anno = frame_anno[frame_anno["num_interior_pts"] > 0]
            cuboid = frame_anno.loc[:, list(LABEL_ATTR)].to_numpy()
            names = np.asarray([
                c.lower().capitalize()
                for c in frame_anno["category"].to_numpy().tolist()])
            n = len(names)
            annos = info["annos"]
            annos["name"] = names
            annos["truncated"] = np.zeros(n, np.float64)
            annos["occluded"] = np.zeros(n, np.int64)
            annos["alpha"] = -10 * np.ones(n, np.float64)
            annos["dimensions"] = cuboid[:, 3:6].astype(np.float64)
            annos["location"] = cuboid[:, :3].astype(np.float64)
            annos["rotation_y"] = quat_to_yaw_batch(
                cuboid[:, 6:10]).astype(np.float64)
            annos["index"] = np.arange(n, dtype=np.int32)
            annos["num_points_in_gt"] = frame_anno[
                "num_interior_pts"].to_numpy().astype(np.int32)
        out_split = "training" if sample_idx[0] in "01" else "testing"
        rel_path = os.path.join(out_split, "velodyne", f"{sample_idx}.bin")
        info["point_cloud"]["velodyne_path"] = rel_path
        if save_bin:
            abs_path = os.path.join(str(output_dir), rel_path)
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            lidar = pd.read_feather(os.path.join(lidar_dir, frame_name))
            lidar.loc[:, ["x", "y", "z", "intensity"]].to_numpy().astype(
                np.float32).tofile(abs_path)
        info_list.append(info)


def create_argo2_infos(sensor_root, output_dir, save_bin=True):
    """End-to-end extraction: sensor tree -> {training,testing}/velodyne
    bins + argo2_infos_{train,val}.pkl (+ val_anno.feather concat)."""
    import pandas as pd

    ts2idx, seg_paths, seg_splits = prepare(sensor_root)
    infos = {"train": [], "val": []}
    for seg_path, split in zip(seg_paths, seg_splits):
        process_single_segment(
            seg_path, split, infos[split], ts2idx, output_dir,
            save_bin=save_bin)
    output_dir = Path(output_dir)
    for split in ("train", "val"):
        with open(output_dir / f"argo2_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos[split], f)
    # concat val annotations for the evaluator
    val_frames = []
    for seg_path, split in zip(seg_paths, seg_splits):
        if split != "val":
            continue
        df = pd.read_feather(
            os.path.join(str(seg_path), "annotations.feather"))
        df["log_id"] = str(seg_path).rstrip("/").split("/")[-1]
        val_frames.append(df)
    if val_frames:
        pd.concat(val_frames).reset_index(drop=True).to_feather(
            output_dir / "val_anno.feather")
    return infos
