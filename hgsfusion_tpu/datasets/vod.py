"""View-of-Delft 4D-radar dataset.

Reference: pcdet/datasets/kitti/vod_dataset.py (7-channel radar .bin:
x, y, z, rcs, v_r, v_r_comp, time; jpg images; VoD entire-area + driving-
corridor evaluation at vod_dataset.evaluation:402-426).
"""
from __future__ import annotations


from .kitti_base import KittiFormatDataset


class VODDataset(KittiFormatDataset):
    NUM_POINT_FEATURES = 7
    IMAGE_EXT = ".jpg"

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official VoD protocol: 11-point AP (the reference's headline; R40 under *_R40 keys) IoU .5/.25/.25, entire annotated area
        plus the driving-corridor ROI (camera coords |x|<4 m, z<25 m).

        vod_dataset.evaluation:402-426 / utils/vod_utils.py.
        """
        from ..eval.vod_eval import vod_official_eval

        gt_annos = [info["annos"] for info in self.infos]
        result_str, result_dict = vod_official_eval(
            gt_annos, det_annos, class_names
        )
        return result_str, result_dict
