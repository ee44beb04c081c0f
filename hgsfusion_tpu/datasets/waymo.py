"""Waymo Open Dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/waymo/waymo_dataset.py (+waymo_utils.py,
waymo_eval.py). Operates on the reference's *processed* format —
`<root>/<PROCESSED_DATA_TAG>/<sequence>/{<sequence>.pkl, %04d.npy}` — which
requires no TensorFlow. The raw tfrecord extraction
(waymo_utils.process_single_sequence) needs the external
`waymo_open_dataset` package and is gated behind an informative error;
evaluation runs either the KITTI protocol on axis-mapped boxes or the
numpy AP/APH estimator in `eval/waymo_eval.py` (the reference requires the
TF metrics estimator). The multi-frame accumulation
(get_sequence_data:250-338) and pred-box trajectory plumbing used by
MPPNet are replicated in numpy.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate

MAP_NAME_TO_KITTI = {
    "Vehicle": "Car", "Pedestrian": "Pedestrian", "Cyclist": "Cyclist",
    "Sign": "Sign", "Car": "Car",
}


def transform_annotations_to_kitti_format(annos, map_name_to_kitti=None):
    """In-place lidar->pseudo-camera anno conversion for the KITTI
    evaluator (pcdet/datasets/kitti/kitti_utils.py:5-60)."""
    for anno in annos:
        if "name" not in anno:
            anno["name"] = anno.pop("gt_names")
        if map_name_to_kitti is not None:
            anno["name"] = np.asarray([
                map_name_to_kitti.get(n, n) for n in anno["name"]])
        n = len(anno["name"])
        anno["bbox"] = np.zeros((n, 4))
        anno["bbox"][:, 2:4] = 50
        anno["truncated"] = np.zeros(n)
        anno["occluded"] = np.zeros(n)
        boxes = np.asarray(
            anno["boxes_lidar"] if "boxes_lidar" in anno
            else anno["gt_boxes_lidar"], np.float64,
        ).reshape(n, -1).copy()
        if n > 0:
            boxes[:, 2] -= boxes[:, 5] / 2
            anno["location"] = np.stack(
                [-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], axis=1)
            anno["dimensions"] = boxes[:, [3, 5, 4]]  # dxdydz -> lhw
            anno["rotation_y"] = -boxes[:, 6] - np.pi / 2.0
            anno["alpha"] = (
                -np.arctan2(-boxes[:, 1], boxes[:, 0]) + anno["rotation_y"])
        else:
            anno["location"] = np.zeros((0, 3))
            anno["dimensions"] = np.zeros((0, 3))
            anno["rotation_y"] = np.zeros(0)
            anno["alpha"] = np.zeros(0)
    return annos


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.data_path = self.root_path / dataset_cfg.PROCESSED_DATA_TAG
        self.split = dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_sequence_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.infos = []
        self.seq_name_to_infos = self.include_waymo_data(self.mode)
        self.pred_boxes_dict = (
            self.load_pred_boxes_to_dict(
                dataset_cfg.ROI_BOXES_PATH[self.mode])
            if dataset_cfg.get("USE_PREDBOX", False) else {}
        )

    def load_pred_boxes_to_dict(self, pred_boxes_path):
        """First-stage detections -> {seq: {sample_idx: (N, 11)}} boxes
        [x y z dx dy dz yaw vx vy score label] for trajectory refinement
        (waymo_dataset.py:94-112)."""
        with open(pred_boxes_path, "rb") as f:
            pred_dicts = pickle.load(f)
        out = {}
        for box_dict in pred_dicts:
            seq_name = box_dict["frame_id"][:-4].replace(
                "training_", "").replace("validation_", "")
            sample_idx = int(box_dict["frame_id"][-3:])
            labels = np.array([
                self.class_names.index(n) + 1 for n in box_dict["name"]])
            if len(labels) == 0:  # sparse frames: no first-stage boxes
                boxes = np.zeros((0, 11), np.float32)
            else:
                boxes = np.concatenate([
                    np.asarray(box_dict["boxes_lidar"], np.float32).reshape(
                        len(labels), -1),
                    np.asarray(box_dict["score"],
                               np.float32)[:, None],
                    labels[:, None].astype(np.float32),
                ], axis=-1)
            out.setdefault(seq_name, {})[sample_idx] = boxes
        return out

    def include_waymo_data(self, mode):
        infos = []
        seq_name_to_infos = {}
        skipped = 0
        for entry in self.sample_sequence_list:
            seq_name = Path(entry).stem
            info_path = self.data_path / seq_name / f"{seq_name}.pkl"
            if not info_path.exists():
                skipped += 1
                continue
            with open(info_path, "rb") as f:
                seq_infos = pickle.load(f)
            infos.extend(seq_infos)
            seq_name_to_infos[
                seq_infos[0]["point_cloud"]["lidar_sequence"]] = seq_infos
        self.infos.extend(infos)
        if self.logger:
            self.logger.info(
                f"Total samples for Waymo dataset: {len(infos)} "
                f"(skipped {skipped} sequences)")
        interval = self.dataset_cfg.get(
            "SAMPLED_INTERVAL", {}).get(mode, 1)
        if interval > 1:
            self.infos = self.infos[::interval]
        seq_cfg = self.dataset_cfg.get("SEQUENCE_CONFIG", None)
        if not (seq_cfg and seq_cfg.ENABLED):
            seq_name_to_infos = None
        return seq_name_to_infos

    # -- lidar IO -------------------------------------------------------
    def get_lidar(self, sequence_name, sample_idx):
        """(N, 6) [x, y, z, intensity, elongation, NLZ_flag] npy -> (N, 5)
        with no-label-zone points dropped and tanh'd intensity
        (waymo_dataset.py:196-209)."""
        path = self.data_path / sequence_name / ("%04d.npy" % sample_idx)
        feats = np.load(path)
        points, nlz = feats[:, 0:5], feats[:, 5]
        if not self.dataset_cfg.get("DISABLE_NLZ_FLAG_ON_POINTS", False):
            points = points[nlz == -1]
        tanh_dims = self.dataset_cfg.get("POINTS_TANH_DIM", None)
        points = points.copy()
        for dim in (tanh_dims if tanh_dims is not None else [3]):
            points[:, dim] = np.tanh(points[:, dim])
        return points

    @staticmethod
    def transform_prebox_to_current(pred_boxes3d, pose_pre, pose_cur):
        """Past-frame boxes -> current frame (waymo_dataset.py:211-239)."""
        assert pred_boxes3d.shape[-1] in (9, 11)
        out = pred_boxes3d.copy()
        hom = np.concatenate(
            [out[:, :3], np.ones((len(out), 1))], axis=-1)
        glob = hom @ pose_pre.T
        hom2 = np.concatenate(
            [glob[:, :3], np.ones((len(out), 1))], axis=-1)
        out[:, :3] = (hom2 @ np.linalg.inv(pose_cur.T))[:, :3]
        if out.shape[-1] == 11:
            vel3 = np.concatenate(
                [out[:, 7:9], np.zeros((len(out), 1))], axis=-1)
            velg = vel3 @ pose_pre[:3, :3].T
            out[:, 7:9] = (velg @ np.linalg.inv(pose_cur[:3, :3].T))[:, :2]
        out[:, 6] += np.arctan2(pose_pre[1, 0], pose_pre[0, 0])
        out[:, 6] -= np.arctan2(pose_cur[1, 0], pose_cur[0, 0])
        return out

    @staticmethod
    def reorder_rois_for_refining(pred_bboxes):
        num_max = max(1, max(len(b) for b in pred_bboxes))
        out = np.zeros(
            [len(pred_bboxes), num_max, pred_bboxes[0].shape[-1]],
            np.float32)
        for i, b in enumerate(pred_bboxes):
            out[i, :len(b)] = b
        return out

    def _load_pred_boxes(self, sequence_name, sample_idx):
        """(N, 11) first-stage boxes with speed converted to per-frame
        negative motion (waymo_dataset.py:265-274)."""
        seq = sequence_name.replace("training_", "").replace(
            "validation_", "")
        boxes = self.pred_boxes_dict[seq][int(sample_idx)].copy()
        assert boxes.shape[-1] == 11
        boxes[:, 7:9] = -0.1 * boxes[:, 7:9]
        return boxes

    def get_sequence_data(self, info, points, sequence_name, sample_idx,
                          sequence_cfg, load_pred_boxes=False):
        """Accumulate past sweeps into the current frame with a timestamp
        channel; optionally carry first-stage box trajectories for MPPNet
        refinement (waymo_dataset.py:250-338)."""

        def remove_ego(p, radius=1.0):
            return p[~((np.abs(p[:, 0]) < radius)
                       & (np.abs(p[:, 1]) < radius))]

        pose_cur = np.asarray(info["pose"]).reshape(4, 4)
        num_cur = len(points)
        offsets = np.clip(
            sample_idx + np.arange(*sequence_cfg.SAMPLE_OFFSET),
            0, 0x7FFFFFFF)[::-1]
        points = np.hstack(
            [points, np.zeros((len(points), 1), points.dtype)])
        seq_infos = self.seq_name_to_infos[sequence_name]
        pts_pre_all, num_pre, poses = [], [], [pose_cur]
        pred_boxes_all = (
            [self._load_pred_boxes(sequence_name, sample_idx)]
            if load_pred_boxes else []
        )
        for idx_pre in offsets:
            pts = self.get_lidar(sequence_name, int(idx_pre))
            pose_pre = np.asarray(seq_infos[int(idx_pre)]["pose"]).reshape(
                4, 4)
            hom = np.concatenate(
                [pts[:, :3], np.ones((len(pts), 1))], axis=-1)
            glob = hom @ pose_pre.T
            hom2 = np.concatenate(
                [glob[:, :3], np.ones((len(pts), 1))], axis=-1)
            cur = (hom2 @ np.linalg.inv(pose_cur.T))[:, :3]
            pts = np.concatenate([cur, pts[:, 3:]], axis=-1)
            pts = np.hstack([
                pts,
                0.1 * (sample_idx - idx_pre) * np.ones(
                    (len(pts), 1), pts.dtype),
            ])
            pts = remove_ego(pts)
            pts_pre_all.append(pts)
            num_pre.append(len(pts))
            poses.append(pose_pre)
            if load_pred_boxes:
                pred_boxes_all.append(self.transform_prebox_to_current(
                    self._load_pred_boxes(sequence_name, idx_pre),
                    pose_pre, pose_cur))
        points = np.concatenate(
            [points] + pts_pre_all, axis=0).astype(np.float32)
        num_all = np.asarray([num_cur] + num_pre, np.int32)
        poses = np.concatenate(poses, axis=0)
        if load_pred_boxes:
            ordered = self.reorder_rois_for_refining(pred_boxes_all)
            return (points, num_all, offsets, poses,
                    ordered[:, :, 0:9], ordered[:, :, 9], ordered[:, :, 10])
        return points, num_all, offsets, poses

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.infos))

    def _get_one(self, index):
        info = copy.deepcopy(self.infos[index])
        pc_info = info["point_cloud"]
        sequence_name = pc_info["lidar_sequence"]
        sample_idx = pc_info["sample_idx"]
        points = self.get_lidar(sequence_name, sample_idx)
        input_dict = {"sample_idx": sample_idx}
        seq_cfg = self.dataset_cfg.get("SEQUENCE_CONFIG", None)
        if seq_cfg and seq_cfg.ENABLED:
            use_predbox = self.dataset_cfg.get("USE_PREDBOX", False)
            seq_out = self.get_sequence_data(
                info, points, sequence_name, sample_idx, seq_cfg,
                load_pred_boxes=use_predbox)
            points, num_all, _, poses = seq_out[:4]
            input_dict["poses"] = poses
            if use_predbox:
                # per-frame clouds for the MPPNet contract: split the merged
                # cloud back at the frame boundaries, statically padded
                n_frame = int(self.dataset_cfg.get(
                    "MAX_POINTS_PER_FRAME", self.max_points))
                t = len(num_all)
                pm = np.zeros((t, n_frame, points.shape[-1]), np.float32)
                pv = np.zeros((t, n_frame), bool)
                off = 0
                for fi, cnt in enumerate(num_all):
                    cnt = int(cnt)
                    keep = min(cnt, n_frame)
                    pm[fi, :keep] = points[off:off + keep]
                    pv[fi, :keep] = True
                    off += cnt
                input_dict.update({
                    "points_multi": pm,
                    "points_multi_valid": pv,
                    "roi_boxes": seq_out[4],
                    "roi_scores": seq_out[5],
                    "roi_labels": seq_out[6],
                })
        input_dict.update({
            "points": points, "frame_id": info["frame_id"],
        })
        if "annos" in info:
            annos = info["annos"]
            keep = np.asarray(annos["name"]) != "unknown"
            gt_boxes = np.asarray(
                annos["gt_boxes_lidar"], np.float32).reshape(
                    len(annos["name"]), -1)[keep]
            names = np.asarray(annos["name"])[keep]
            num_pts = np.asarray(annos["num_points_in_gt"])[keep] \
                if "num_points_in_gt" in annos else None
            if not self.dataset_cfg.get("TRAIN_WITH_SPEED", False):
                gt_boxes = gt_boxes[:, 0:7]
            if (self.training and num_pts is not None
                    and self.dataset_cfg.get(
                        "FILTER_EMPTY_BOXES_FOR_TRAIN", False)):
                mask = num_pts > 0
                names, gt_boxes = names[mask], gt_boxes[mask]
            input_dict.update({
                "gt_names": names, "gt_boxes": gt_boxes,
            })
        data = self.prepare_data(input_dict)
        if data is not None:
            data["metadata"] = info.get("metadata", info["frame_id"])
            data.pop("num_points_in_gt", None)
        return data

    # -- predictions / eval ---------------------------------------------
    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
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
                "frame_id": batch_dict["frame_id"][i],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if "annos" not in self.infos[0]:
            return "No ground-truth boxes for evaluation", {}
        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.infos]
        metric = kwargs.get("eval_metric", "waymo")
        if metric == "kitti":
            from ..eval.kitti_official_eval import kitti_official_eval

            transform_annotations_to_kitti_format(
                eval_det, MAP_NAME_TO_KITTI)
            transform_annotations_to_kitti_format(
                eval_gt, MAP_NAME_TO_KITTI)
            classes = [MAP_NAME_TO_KITTI[c] for c in class_names]
            return kitti_official_eval(eval_gt, eval_det, classes)
        if metric == "waymo":
            from ..eval.waymo_eval import waymo_evaluation

            return waymo_evaluation(
                eval_det, eval_gt, class_names, distance_thresh=1000)
        raise NotImplementedError(metric)

    # -- gt database -----------------------------------------------------
    def create_groundtruth_database(self, info_path, save_path,
                                    used_classes=None, split="train",
                                    sampled_interval=10):
        """waymo_dataset.py:463-561 (single-process, no SharedArray)."""
        save_path = Path(save_path)
        db_path = save_path / (
            f"gt_database_{split}_sampled_{sampled_interval}")
        db_info_path = save_path / (
            f"waymo_dbinfos_{split}_sampled_{sampled_interval}.pkl")
        db_path.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        all_db_infos = {}
        for k in range(0, len(infos), sampled_interval):
            info = infos[k]
            if "annos" not in info:
                continue
            pc_info = info["point_cloud"]
            seq_name = pc_info["lidar_sequence"]
            sample_idx = pc_info["sample_idx"]
            points = self.get_lidar(seq_name, sample_idx)
            annos = info["annos"]
            names = np.asarray(annos["name"])
            gt_boxes = np.asarray(
                annos["gt_boxes_lidar"], np.float32).reshape(
                    len(names), -1)[:, :7]
            diff = (np.asarray(annos["difficulty"]).reshape(-1)
                    if "difficulty" in annos else np.zeros(len(names)))
            self.gt_db_add_frame(
                points, gt_boxes, names, db_path, save_path,
                lambda i, n: f"{seq_name}_{sample_idx}_{n}_{i}.bin",
                all_db_infos, used_classes,
                extra=lambda i: {
                    "sequence_name": seq_name, "sample_idx": sample_idx,
                    "difficulty": int(diff[i]),
                },
            )
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos


def create_waymo_infos(*args, **kwargs):
    """Raw tfrecord -> processed npy/pkl extraction requires the external
    `waymo_open_dataset` package (TF-based), which is not available in this
    environment. The WaymoDataset consumes the processed format directly;
    run the extraction where the devkit is installed
    (reference: waymo_utils.process_single_sequence)."""
    raise ImportError(
        "create_waymo_infos needs the external 'waymo_open_dataset' "
        "package (TensorFlow) to parse raw tfrecords; this framework "
        "consumes the processed <seq>.pkl/%04d.npy format directly."
    )
