"""Ground-truth-only visualization over a whole split.

Reference: tools/visual_tj4d.py:1-57 — iterate kitti_infos_trainval.pkl,
load image/points/calib per frame, convert the camera-frame annos to lidar
boxes, and render the gt overlay (plot_points_gt). Same loop here via the
shared renderer helpers (utils/visual.py); works for any KITTI-format
dataset (VoD 7-dim radar, TJ4D 8-dim radar).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .visual import (
    GT_COLOR,
    REAL_POINT_COLOR,
    _camera_annos_to_lidar,
    clean_gt_annos,
    draw_boxes_bev,
    draw_boxes_image,
    draw_points_bev,
    load_kitti_frame,
)


def render_gt(data_root, save_path, class_names, infos_name,
              image_ext=".jpg", radar_dims=8, bev_xlim=(0, 70),
              bev_ylim=(-30, 30), frame_stride=1, max_frames=None):
    """Render <id>_gt.png (image overlay) + <id>_gt_bev.png per frame.

    Returns the number of frames rendered."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    data_root = Path(data_root)
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    infos = np.load(data_root / infos_name, allow_pickle=True)

    idxes = list(range(0, len(infos), frame_stride))
    if max_frames:
        idxes = idxes[:max_frames]
    for idx in idxes:
        info = infos[idx]
        frame_id = info["image"]["image_idx"]
        img, pts, calib, l2c, c2i = load_kitti_frame(
            data_root, frame_id, image_ext, radar_dims)
        ann = clean_gt_annos(info["annos"])
        boxes, names, _, _ = _camera_annos_to_lidar(ann, calib, class_names)

        fig, ax = plt.subplots(dpi=200)
        # gt boxes draw in the uniform gt color (plot_gt_3d passes no
        # per-class colors in the reference sweep, tj4d_utils.py:142)
        colors = [GT_COLOR] * len(boxes)
        draw_boxes_image(ax, boxes, l2c, c2i, colors)
        ax.imshow(img)
        ax.axis("off")
        fig.savefig(save_path / f"{frame_id}_gt.png",
                    bbox_inches="tight", pad_inches=0)
        plt.close(fig)

        fig, ax = plt.subplots(dpi=200)
        ax.set_xlim(*bev_xlim)
        ax.set_ylim(*bev_ylim)
        draw_points_bev(ax, pts, REAL_POINT_COLOR)
        draw_boxes_bev(ax, boxes)
        ax.axis("off")
        fig.savefig(save_path / f"{frame_id}_gt_bev.png")
        plt.close(fig)
    return len(idxes)
