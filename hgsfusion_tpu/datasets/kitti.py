"""Plain KITTI lidar dataset (inherited family; not used by the HGS path).

Reference: pcdet/datasets/kitti/kitti_dataset.py (4-channel lidar
x, y, z, intensity; png images; standard easy/moderate/hard evaluation).
Shares the KITTI-format machinery with the VoD/TJ4D loaders.
"""
from __future__ import annotations

from .kitti_base import KittiFormatDataset


class KittiDataset(KittiFormatDataset):
    NUM_POINT_FEATURES = 4
    IMAGE_EXT = ".png"

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..eval.kitti_official_eval import kitti_official_eval

        gt_annos = [info["annos"] for info in self.infos]
        return kitti_official_eval(gt_annos, det_annos, class_names)
