"""Point feature encoding + data processing (numpy, CPU side).

Reference: pcdet/datasets/processor/point_feature_encoder.py:4-57 and
data_processor.py:64-301 (only the processors the HGS configs use:
mask_points_and_boxes_outside_range, calculate_grid_size, shuffle_points).
"""
from __future__ import annotations

import numpy as np

from ..utils import box_utils


class PointFeatureEncoder:
    """Selects used_feature_list columns from src_feature_list order."""

    def __init__(self, config, point_cloud_range=None):
        self.config = config
        assert list(config["src_feature_list"][0:3]) == ["x", "y", "z"]
        self.used = list(config["used_feature_list"])
        self.src = list(config["src_feature_list"])

    @property
    def num_point_features(self) -> int:
        return len(self.used)

    def forward(self, data_dict):
        cols = [self.src.index(f) for f in self.used]
        data_dict["points"] = data_dict["points"][:, cols]
        data_dict["use_lead_xyz"] = True
        return data_dict


class DataProcessor:
    """Ordered queue of processing steps driven by config NAMEs."""

    def __init__(self, processor_configs, point_cloud_range, training: bool,
                 num_point_features: int):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = None
        self.voxel_size = None
        self.steps = []
        for cfg in processor_configs:
            self.steps.append((getattr(self, cfg["NAME"]), cfg))

    def mask_points_and_boxes_outside_range(self, data_dict, config):
        pts = data_dict["points"]
        rng = self.point_cloud_range
        keep = (
            (pts[:, 0] >= rng[0]) & (pts[:, 0] <= rng[3])
            & (pts[:, 1] >= rng[1]) & (pts[:, 1] <= rng[4])
        )
        data_dict["points"] = pts[keep]
        if (
            data_dict.get("gt_boxes", None) is not None
            and config.get("REMOVE_OUTSIDE_BOXES", False)
            and self.training
        ):
            mask = box_utils.mask_boxes_outside_range_numpy(
                data_dict["gt_boxes"], rng,
                use_center_to_filter=config.get("USE_CENTER_TO_FILTER", True),
            )
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            if "gt_names" in data_dict:
                data_dict["gt_names"] = data_dict["gt_names"][mask]
            if data_dict.get("gt_boxes2d", None) is not None:
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][mask]
        return data_dict

    def calculate_grid_size(self, data_dict, config):
        if self.grid_size is None:
            voxel_size = np.asarray(config["VOXEL_SIZE"], np.float32)
            extent = self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
            self.grid_size = np.round(extent / voxel_size).astype(np.int64)
            self.voxel_size = voxel_size
        return data_dict

    def downsample_depth_map(self, data_dict, config):
        """Local-mean downscale of the gt depth map
        (data_processor.downsample_depth_map:225-234; skimage
        downscale_local_mean as a numpy block mean with edge padding)."""
        d = int(config["DOWNSAMPLE_FACTOR"])
        depth = data_dict.get("depth_maps")
        if depth is None or d <= 1:
            return data_dict
        h, w = depth.shape
        ph, pw = (-h) % d, (-w) % d
        if ph or pw:  # skimage pads with zeros (cval=0)
            depth = np.pad(depth, ((0, ph), (0, pw)))
        hh, ww = depth.shape
        data_dict["depth_maps"] = depth.reshape(
            hh // d, d, ww // d, d).mean(axis=(1, 3))
        return data_dict

    def shuffle_points(self, data_dict, config):
        if config["SHUFFLE_ENABLED"][self.mode]:
            pts = data_dict["points"]
            idx = np.random.permutation(pts.shape[0])
            data_dict["points"] = pts[idx]
        return data_dict

    def forward(self, data_dict):
        for fn, cfg in self.steps:
            data_dict = fn(data_dict, cfg)
        return data_dict
