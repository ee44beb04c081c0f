"""TJ4D result renderer with the RHGM virtual-point overlay (reference:
tools/visual_tools/visual_result_tj4d_graps.py — same outputs from a shared
renderer, hgsfusion_tpu/utils/visual.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hgsfusion_tpu.utils.visual import render_results  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--data_root", default="./data/tj4d")
p.add_argument("--result_pkl", required=True)
p.add_argument("--save_path", default="./visual_result/tj4d_graps")
p.add_argument("--virtual_prefix",
               default="mask_maskformer_with_label_k_1_gauss_k_4_uniform")
p.add_argument("--score_thresh", type=float, default=0.4)
p.add_argument("--frame_stride", type=int, default=10)
p.add_argument("--max_frames", type=int, default=None)
a = p.parse_args()
n = render_results(a.data_root, a.result_pkl, a.save_path,
                   ("Car", "Pedestrian", "Cyclist", "Truck"),
                   image_ext=".png", radar_dims=8,
                   virtual_prefix=a.virtual_prefix,
                   bev_xlim=(0, 70), bev_ylim=(-35, 35),
                   image_crop_rows=810, score_thresh=a.score_thresh,
                   frame_stride=a.frame_stride, max_frames=a.max_frames)
print(f"rendered {n} frames -> {a.save_path}")
