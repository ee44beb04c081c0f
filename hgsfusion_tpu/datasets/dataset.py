"""Dataset template: prepare_data pipeline + static-shape batch collation.

Reference: pcdet/datasets/dataset.py:14-325. TPU-first differences:
- every batch has *static* shapes (points padded to MAX_POINTS with a
  validity mask, gt boxes padded to MAX_GT_BOXES, images padded to the
  configured IMAGE_SIZE) so the jitted graph compiles once;
- collation returns plain numpy dicts ready for device_put / sharding.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


from .augmentor import DataAugmentor
from .processor import DataProcessor, PointFeatureEncoder


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = Path(
            root_path if root_path is not None else dataset_cfg.DATA_PATH
        )
        if dataset_cfg is None or class_names is None:
            return

        self.point_cloud_range = np.asarray(
            dataset_cfg.POINT_CLOUD_RANGE, np.float32
        )
        self.max_points = int(dataset_cfg.get("MAX_POINTS", 16384))
        self.max_gt_boxes = int(dataset_cfg.get("MAX_GT_BOXES", 64))
        self.image_size = tuple(dataset_cfg.get("IMAGE_SIZE", (516, 1936)))

        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING,
            point_cloud_range=self.point_cloud_range,
        )
        self.data_augmentor = (
            DataAugmentor(
                self.root_path, dataset_cfg.DATA_AUGMENTOR, class_names, logger
            )
            if training
            else None
        )
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR,
            point_cloud_range=self.point_cloud_range,
            training=training,
            num_point_features=self.point_feature_encoder.num_point_features,
        )
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self._merge_all_iters_to_one_epoch = False
        self.total_epochs = 0

    @property
    def mode(self):
        return "train" if self.training else "test"

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def getitem_with_resample(self, index, get_one, num_infos):
        """Shared __getitem__ skeleton: prepare one sample, redraw a random
        index while training frames come back empty (the reference redraws
        on empty-gt, dataset.py:212-214), then pad to static shapes.

        get_one(index) -> prepared dict or None. Handles the
        _merge_all_iters_to_one_epoch index wrap for every family."""
        if self._merge_all_iters_to_one_epoch:
            index = index % num_infos
        for _ in range(num_infos + 1):
            data = get_one(index)
            if data is not None:
                return self.pad_to_static(data)
            index = np.random.randint(num_infos)
        # random redraws can miss sparse valid frames (the reference
        # redraws unboundedly, dataset.py:212-214); a deterministic scan
        # guarantees success iff ANY valid frame exists
        for i in range(num_infos):
            data = get_one(i)
            if data is not None:
                return self.pad_to_static(data)
        raise RuntimeError("no frame with gt boxes in the dataset")

    def merged_len(self, num_infos):
        """len() under the merge-all-iters-to-one-epoch flag."""
        if self._merge_all_iters_to_one_epoch:
            return num_infos * self.total_epochs
        return num_infos

    @staticmethod
    def gt_db_add_frame(points, gt_boxes, names, db_path, rel_root,
                        filename_fn, all_db_infos, used_classes=None,
                        extra=None):
        """Shared gt-database frame body: crop each box's points, recenter,
        write the bin, append the db_info row (the per-box loop every
        family's create_groundtruth_database repeats).

        filename_fn(i, name) -> bin filename; extra(i) -> dict of extra
        db_info fields (sequence ids, difficulty, ...)."""
        from ..ops.points_in_boxes import points_in_boxes

        gt_boxes = np.asarray(gt_boxes, np.float32)
        if len(gt_boxes) == 0:
            return
        inside = np.asarray(points_in_boxes(points[:, :3], gt_boxes[:, :7]))
        for i in range(len(gt_boxes)):
            name = str(names[i])
            if used_classes is not None and name not in used_classes:
                continue
            gt_points = points[inside[i]]
            gt_points[:, :3] -= gt_boxes[i, :3]
            filename = filename_fn(i, name)
            gt_points.astype(np.float32).tofile(db_path / filename)
            info = {
                "name": name,
                "path": str((db_path / filename).relative_to(rel_root)),
                "gt_idx": i,
                "box3d_lidar": gt_boxes[i],
                "num_points_in_gt": int(inside[i].sum()),
            }
            if extra is not None:
                info.update(extra(i))
            all_db_infos.setdefault(name, []).append(info)

    # ------------------------------------------------------------------
    @staticmethod
    def set_lidar_aug_matrix(data_dict):
        """Record the composed flip/rot/scale as a 4x4 (dataset.py:134-156),
        used to undo BEV augmentation in the frustum grid (BEV_AUG)."""
        m = np.eye(4, dtype=np.float32)
        # flips are recorded ONLY when 'flip_y' is present (dataset.py:138):
        # under the flagship recipe (world flip along x only +
        # random_image_flip_fusion) the x-flip is deliberately NOT in the
        # matrix — the image flip already restores camera-lidar
        # correspondence, and undoing the flip again in the frustum would
        # sample mirrored image columns on every flipped frame
        if "flip_y" in data_dict:
            if data_dict.get("flip_x", False):
                m[:3, :3] = (np.diag([1.0, -1.0, 1.0]).astype(np.float32)
                             @ m[:3, :3])
            if data_dict.get("flip_y", False):
                m[:3, :3] = (np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
                             @ m[:3, :3])
        if "noise_rot" in data_dict:
            # angle2matrix: active rotation taking original points to
            # augmented points (x toward y)
            a = data_dict["noise_rot"]
            rot = np.array(
                [
                    [np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0],
                    [0, 0, 1],
                ],
                dtype=np.float32,
            )
            m[:3, :3] = rot @ m[:3, :3]
        if "noise_scale" in data_dict:
            m[:3, :3] *= data_dict["noise_scale"]
        if "noise_translate" in data_dict:
            # dataset.py:152-154: the translation column must ride along or
            # the BEV-aug undo samples camera features offset by the noise
            m[:3, 3] = np.asarray(
                data_dict["noise_translate"], np.float32).reshape(3)
        data_dict["lidar_aug_matrix"] = m
        return data_dict

    def prepare_data(self, data_dict):
        """augment -> aug-matrix -> class filter -> encode -> process
        (dataset.py:158-218). Returns None for empty-gt training frames so the
        caller can resample (the reference re-draws a random index)."""
        if self.training:
            assert "gt_boxes" in data_dict
            gt_boxes_mask = np.array(
                [n in self.class_names for n in data_dict["gt_names"]], dtype=bool
            )
            calib = data_dict.get("calib")
            data_dict = self.data_augmentor.forward(
                {**data_dict, "gt_boxes_mask": gt_boxes_mask}
            )
            if calib is not None:
                data_dict["calib"] = calib

        # road_plane is consumed by gt_sampling (training path pops it in
        # the augmentor); drop it before collate on the eval path too
        data_dict.pop("road_plane", None)

        data_dict = self.set_lidar_aug_matrix(data_dict)

        if data_dict.get("gt_boxes", None) is not None:
            selected = [
                i for i, n in enumerate(data_dict["gt_names"])
                if n in self.class_names
            ]
            data_dict["gt_boxes"] = data_dict["gt_boxes"][selected]
            data_dict["gt_names"] = data_dict["gt_names"][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict["gt_names"]],
                dtype=np.float32,
            )
            data_dict["gt_boxes"] = np.concatenate(
                [data_dict["gt_boxes"], gt_classes.reshape(-1, 1)], axis=1
            ).astype(np.float32)
            if data_dict.get("gt_boxes2d", None) is not None:
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][selected]

        if data_dict.get("points", None) is not None:
            data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict)

        if self.training and len(data_dict.get("gt_boxes", [])) == 0:
            return None  # caller resamples (dataset.py:212-214)

        data_dict.pop("gt_names", None)
        return data_dict

    # ------------------------------------------------------------------
    def pad_to_static(self, data_dict):
        """Pad a prepared sample to the static shapes the TPU graph expects.

        Truncation past MAX_POINTS / MAX_GT_BOXES is LOUD (warn once per
        dataset): the reference collate pads to the batch max and never
        drops data, so a config whose static caps are undersized (e.g. the
        16384 default against ~170k-point Waymo clouds) would otherwise
        silently lose most of the cloud — and at eval time, with
        shuffle_points off, the kept head-of-array prefix follows sensor
        scan order, spatially biasing detections."""
        out = dict(data_dict)
        pts = data_dict["points"].astype(np.float32)
        n = min(len(pts), self.max_points)
        if len(pts) > self.max_points and not getattr(
                self, "_warned_point_truncation", False):
            self._warned_point_truncation = True
            (self.logger.warning if self.logger else print)(
                f"pad_to_static: frame has {len(pts)} points but "
                f"DATA_CONFIG.MAX_POINTS={self.max_points}; truncating "
                f"(raise MAX_POINTS to keep the full cloud)")
        points = np.zeros((self.max_points, pts.shape[1]), np.float32)
        points[:n] = pts[:n]
        valid = np.zeros((self.max_points,), bool)
        valid[:n] = True
        out["points"] = points
        out["points_valid"] = valid

        if data_dict.get("gt_boxes", None) is not None:
            gt = data_dict["gt_boxes"]
            m = min(len(gt), self.max_gt_boxes)
            if len(gt) > self.max_gt_boxes and not getattr(
                    self, "_warned_gt_truncation", False):
                self._warned_gt_truncation = True
                (self.logger.warning if self.logger else print)(
                    f"pad_to_static: frame has {len(gt)} gt boxes but "
                    f"DATA_CONFIG.MAX_GT_BOXES={self.max_gt_boxes}; "
                    f"truncating")
            boxes = np.zeros((self.max_gt_boxes, gt.shape[1]), np.float32)
            boxes[:m] = gt[:m]
            out["gt_boxes"] = boxes

        if data_dict.get("gt_boxes2d", None) is not None:
            b2 = np.asarray(data_dict["gt_boxes2d"], np.float32).reshape(-1, 4)
            m = min(len(b2), self.max_gt_boxes)
            boxes2d = np.zeros((self.max_gt_boxes, 4), np.float32)
            boxes2d[:m] = b2[:m]
            out["gt_boxes2d"] = boxes2d

        if data_dict.get("images", None) is not None:
            img = data_dict["images"]
            h, w = self.image_size
            # dtype-preserving: uint8 images stay uint8 through collate
            # and H2D (the model's preprocess_images normalizes on device)
            padded = np.zeros((h, w, 3), img.dtype
                              if img.dtype == np.uint8 else np.float32)
            ch, cw = min(img.shape[0], h), min(img.shape[1], w)
            padded[:ch, :cw] = img[:ch, :cw]
            out["images"] = padded

        if data_dict.get("depth_maps", None) is not None:
            # pad to the static (image_size / downsample) grid
            dm = np.asarray(data_dict["depth_maps"], np.float32)
            d = max(self.image_size[0] // max(dm.shape[0], 1), 1)
            th, tw = self.image_size[0] // d, self.image_size[1] // d
            padded_dm = np.zeros((th, tw), np.float32)
            ch, cw = min(dm.shape[0], th), min(dm.shape[1], tw)
            padded_dm[:ch, :cw] = dm[:ch, :cw]
            out["depth_maps"] = padded_dm

        if data_dict.get("roi_boxes", None) is not None:
            # first-stage trajectory proposals (T, P, 9): pad the ragged P
            # to MAX_ROI_BOXES so batches stack (MPPNet USE_PREDBOX)
            max_r = int(self.dataset_cfg.get("MAX_ROI_BOXES", 128))
            rb = np.asarray(data_dict["roi_boxes"], np.float32)
            t, p = rb.shape[0], min(rb.shape[1], max_r)
            roi_boxes = np.zeros((t, max_r, rb.shape[-1]), np.float32)
            roi_boxes[:, :p] = rb[:, :p]
            out["roi_boxes"] = roi_boxes
            for key in ("roi_scores", "roi_labels"):
                v = np.asarray(data_dict[key], np.float32)
                padded = np.zeros((t, max_r), np.float32)
                padded[:, :p] = v[:, :p]
                out[key] = padded

        if "lidar_aug_matrix" not in out:
            out["lidar_aug_matrix"] = np.eye(4, dtype=np.float32)
        return out

    @staticmethod
    def collate_batch(batch_list):
        """Stack static-shape samples into a batch dict of numpy arrays.

        Like the reference collate's default branch (dataset.py:319), any
        key whose per-sample values are same-shape numeric arrays stacks to
        (B, ...) — a whitelist would silently leave new array keys (e.g.
        the multicam camera_imgs / img_aug_matrix family) as Python lists
        that device_put cannot shard. Known host-side metadata stays a
        list."""
        meta_keys = {"frame_id", "calib", "metadata", "image_path",
                     "gt_names", "use_lead_xyz"}
        out = {}
        for key in batch_list[0]:
            vals = [s[key] for s in batch_list]
            stackable = key not in meta_keys and all(
                isinstance(v, np.ndarray)
                and v.dtype != object
                and v.dtype.kind in "biufc"
                and v.shape == vals[0].shape
                for v in vals
            )
            out[key] = np.stack(vals, axis=0) if stackable else vals
        out["batch_size"] = len(batch_list)
        return out
