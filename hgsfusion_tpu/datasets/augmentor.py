"""Training-time augmentations (numpy, CPU side).

Reference: pcdet/datasets/augmentor/data_augmentor.py:10-333 and
augmentor_utils.py (random_flip_along_x:8-26, global_rotation:50-71,
global_scaling:74-92, random_image_flip_horizontal:113-165). Only the
augmentations active in the HGS configs are implemented; gt_sampling is
registered as a no-op placeholder (DISABLE_AUG_LIST disables it in the
shipped configs) pending the gt-database sampler.
"""
from __future__ import annotations

import numpy as np

from ..utils.common import rotate_points_along_z


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        disable = set(augmentor_configs.get("DISABLE_AUG_LIST", []))
        self.queue = []
        for cfg in augmentor_configs["AUG_CONFIG_LIST"]:
            if cfg["NAME"] in disable:
                continue
            self.queue.append((getattr(self, cfg["NAME"]), cfg))

    # -- individual augmentations -------------------------------------------
    def gt_sampling(self, data_dict, config):
        """GT-database copy-paste (inactive in the shipped HGS configs via
        DISABLE_AUG_LIST, but available: database_sampler.DataBaseSampler)."""
        if not hasattr(self, "_db_sampler"):
            from .database_sampler import DataBaseSampler

            self._db_sampler = DataBaseSampler(
                self.root_path, config, self.class_names, self.logger
            )
        return self._db_sampler(data_dict)

    def random_world_flip(self, data_dict, config):
        for axis in config["ALONG_AXIS_LIST"]:
            assert axis in ("x", "y")
            enable = bool(np.random.choice([False, True]))
            if enable:
                gt, pts = data_dict["gt_boxes"], data_dict["points"]
                if axis == "x":  # reflect across the x axis: negate y
                    gt[:, 1] = -gt[:, 1]
                    gt[:, 6] = -gt[:, 6]
                    pts[:, 1] = -pts[:, 1]
                    if gt.shape[1] > 7:  # velocity vy (augmentor_utils:23)
                        gt[:, 8] = -gt[:, 8]
                else:  # reflect across the y axis: negate x
                    gt[:, 0] = -gt[:, 0]
                    gt[:, 6] = -(gt[:, 6] + np.pi)
                    pts[:, 0] = -pts[:, 0]
                    if gt.shape[1] > 7:  # velocity vx (augmentor_utils:44)
                        gt[:, 7] = -gt[:, 7]
            data_dict[f"flip_{axis}"] = enable
        return data_dict

    def random_world_rotation(self, data_dict, config):
        rot_range = config["WORLD_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        noise_rot = np.random.uniform(rot_range[0], rot_range[1])
        pts = data_dict["points"]
        data_dict["points"] = rotate_points_along_z(
            pts[None], np.array([noise_rot])
        )[0]
        gt = data_dict["gt_boxes"]
        gt[:, 0:3] = rotate_points_along_z(gt[None, :, 0:3], np.array([noise_rot]))[0]
        gt[:, 6] += noise_rot
        if gt.shape[1] > 7:  # velocity (vx, vy) rotates too (augmentor_utils:64-67)
            vel3 = np.concatenate(
                [gt[:, 7:9], np.zeros((len(gt), 1), gt.dtype)], axis=1)
            gt[:, 7:9] = rotate_points_along_z(
                vel3[None], np.array([noise_rot]))[0][:, 0:2]
        data_dict["noise_rot"] = noise_rot
        return data_dict

    def random_world_scaling(self, data_dict, config):
        lo, hi = config["WORLD_SCALE_RANGE"]
        if hi - lo < 1e-3:
            return data_dict
        scale = np.random.uniform(lo, hi)
        data_dict["points"][:, :3] *= scale
        gt = data_dict["gt_boxes"]
        gt[:, :6] *= scale
        if gt.shape[1] > 7:  # velocity scales too (augmentor_utils:88-89)
            gt[:, 7:] *= scale
        data_dict["noise_scale"] = scale
        return data_dict

    def random_image_flip_fusion(self, data_dict, config):
        """Flip the image iff the world was flipped (data_augmentor.py:116-123),
        keeping camera and lidar geometrically consistent."""
        if not data_dict.get("flip_x", False):
            return data_dict
        image = data_dict["images"]
        calib = data_dict["calib"]
        gt = data_dict["gt_boxes"]
        data_dict["images"] = np.ascontiguousarray(np.fliplr(image))
        w = image.shape[1]
        # flip 3D centroids in image space (augmentor_utils.py:137-146)
        img_pts, img_depth = calib.lidar_to_img(gt[:, :3])
        img_pts[:, 0] = w - img_pts[:, 0]
        pts_rect = calib.img_to_rect(
            u=img_pts[:, 0], v=img_pts[:, 1], depth_rect=img_depth
        )
        gt[:, :3] = calib.rect_to_lidar(pts_rect)
        gt[:, 6] = -gt[:, 6]
        if data_dict.get("gt_boxes2d", None) is not None and len(
            data_dict["gt_boxes2d"]
        ):
            b2d = data_dict["gt_boxes2d"]
            b2d[:, [0, 2]] = w - b2d[:, [2, 0]]
        return data_dict

    def forward(self, data_dict):
        for fn, cfg in self.queue:
            data_dict = fn(data_dict, cfg)
        # normalize heading into [-pi, pi) (data_augmentor.forward:318-320)
        gt = data_dict.get("gt_boxes")
        if gt is not None and len(gt):
            gt[:, 6] = gt[:, 6] - np.floor(gt[:, 6] / (2 * np.pi) + 0.5) * 2 * np.pi
        data_dict.pop("road_plane", None)
        # apply the in-class-names mask last (data_augmentor.forward:325-332)
        if "gt_boxes_mask" in data_dict:
            mask = data_dict.pop("gt_boxes_mask")
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            data_dict["gt_names"] = data_dict["gt_names"][mask]
            if "gt_boxes2d" in data_dict and data_dict["gt_boxes2d"] is not None:
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][mask]
        return data_dict
