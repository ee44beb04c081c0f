"""Ground-truth visualization sweep for TJ4D (reference:
tools/visual_tj4d.py — plot_points_gt over kitti_infos_trainval.pkl)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from hgsfusion_tpu.utils.visual_gt import render_gt

    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./data/tj4d")
    p.add_argument("--save_path", default="./visual_gt/tj4d")
    p.add_argument("--infos", default="kitti_infos_trainval.pkl")
    p.add_argument("--image_ext", default=".png")
    p.add_argument("--radar_dims", type=int, default=8)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=None)
    a = p.parse_args()
    n = render_gt(a.data_root, a.save_path,
                  class_names=("Car", "Pedestrian", "Cyclist", "Truck"),
                  infos_name=a.infos, image_ext=a.image_ext,
                  radar_dims=a.radar_dims, frame_stride=a.frame_stride,
                  max_frames=a.max_frames)
    print(f"rendered {n} frames -> {a.save_path}")


if __name__ == "__main__":
    main()
