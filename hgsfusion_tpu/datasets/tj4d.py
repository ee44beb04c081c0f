"""TJ4DRadSet 4D-radar dataset.

Reference: pcdet/datasets/kitti/tj4d_dataset.py (8-channel radar .bin:
x, y, z, V_r, Range, Power, Alpha, Beta; png images; AP_R40 at IoU .5/.25
with the Overall mAP mixing tiers — Ped/Cyc @0.25, Car/Truck @0.5 — and
per-weather splits, tj4d_dataset.py:477-516 / tj4d_utils.py:846-994).
"""
from __future__ import annotations

import numpy as np

from .kitti_base import KittiFormatDataset


class TJ4DDataset(KittiFormatDataset):
    NUM_POINT_FEATURES = 8
    IMAGE_EXT = ".png"

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..eval.tj4d_eval import tj4d_official_eval

        gt_annos = [info["annos"] for info in self.infos]
        result_str, result_dict = tj4d_official_eval(
            gt_annos, det_annos, class_names
        )
        return result_str, result_dict
