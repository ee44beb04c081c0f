"""Generate the structured synthetic datasets for the round-5
detection-level polar-vs-gather equivalence study.

Builds flagship-scale LEARNABLE scenes (datasets/synthetic.py
structured=True: radar/virtual clusters inside gt boxes with
class-signature features, class-colored image blobs) with DISJOINT
train/val splits, then writes the info pkls with the official
tools/create_infos.py flow. A detector trained on the train split
produces meaningful held-out detections — the resolution the polar/gather
post-NMS comparison and the official-protocol AP-proxy need, which
white-noise fixtures cannot give (AP pins to ~0 there).

Usage:
    python tools/make_study_data.py --root /tmp/r5 [--datasets vod tj4d]

Produces <root>/vod and <root>/tj4d trees; point the flagship configs at
them with
    --set DATA_CONFIG.DATA_PATH <root>/vod
(the virtual points are written under the configs' shipped
VIRTUAL_POINT_PREFIX, so no prefix override is needed).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the shipped configs' RHGM prefix (hgsfusion_vod.yaml DATA_CONFIG)
PREFIX = "mask_maskformer_with_label_k_1_gauss_k_4_uniform"

SPECS = {
    # flagship VoD: 516x1936 frames (vod_fusion.yaml IMAGE_SIZE), 7-ch
    # radar, 3 classes; 4096 radar + 2048 virtual points/frame stays
    # under the MAX_POINTS=16384 static pad after the hybrid merge
    "vod": dict(
        num_points=4096, num_virtual=2048, num_boxes=6,
        image_hw=(516, 1936), radar_channels=7, image_ext=".jpg",
        classes=("Car", "Pedestrian", "Cyclist"), seed=50,
        cfg="configs/hgsfusion_vod.yaml",
    ),
    # flagship TJ4D: 810x1280 png frames (tj4d_fusion.yaml IMAGE_SIZE),
    # 8-ch 4D radar, 4 classes incl. Truck
    "tj4d": dict(
        num_points=4096, num_virtual=2048, num_boxes=6,
        image_hw=(810, 1280), radar_channels=8, image_ext=".png",
        classes=("Car", "Pedestrian", "Cyclist", "Truck"), seed=51,
        cfg="configs/hgsfusion_tj4d.yaml",
    ),
}


def build(name: str, root: Path, num_frames: int, val_frames: int,
          hard_val: bool = False) -> Path:
    """hard_val=True builds an EVAL-ONLY variant (<root>/<name>_hardval):
    every frame in val.txt, per-box point support log-uniform in
    [0.02, 1.0] so trained-model recall sits in the PR-curve interior
    for every class. On the uniformly easy default scenes the model
    reaches recall 1.0, where the 11-point AP quantizes path deltas to
    0-or-9.09 (the r=1.0 cliff) — useless against the 0.5-AP criterion;
    the support gradient restores sub-point ΔAP resolution."""
    from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti

    spec = dict(SPECS[name])
    cfg = spec.pop("cfg")
    out = root / (f"{name}_hardval" if hard_val else name)
    if hard_val:
        spec["seed"] += 100
        make_synthetic_kitti(out, num_frames=num_frames, structured=True,
                             virtual_prefix=PREFIX,
                             support_range=(0.02, 1.0), **spec)
        # all frames are val; train.txt stays as written (never trained on)
    else:
        make_synthetic_kitti(out, num_frames=num_frames, structured=True,
                             virtual_prefix=PREFIX, **spec)
        # disjoint splits (the generator writes identical train/val lists)
        ids = [f"{i:05d}" for i in range(num_frames)]
        n_train = num_frames - val_frames
        (out / "ImageSets" / "train.txt").write_text(
            "\n".join(ids[:n_train]) + "\n")
        (out / "ImageSets" / "val.txt").write_text(
            "\n".join(ids[n_train:]) + "\n")

    # official info-generation flow, forced onto the CPU platform (the
    # ambient env may point jax at the TPU tunnel; infos are numpy-only)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    repo = Path(__file__).resolve().parent.parent
    subprocess.run(
        [sys.executable, "tools/create_infos.py", "--cfg_file", cfg,
         "--set", "DATA_CONFIG.DATA_PATH", str(out)],
        cwd=repo, env=env, check=True,
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/r5")
    p.add_argument("--datasets", nargs="+", default=["vod", "tj4d"],
                   choices=list(SPECS))
    p.add_argument("--num_frames", type=int, default=96)
    p.add_argument("--val_frames", type=int, default=32)
    p.add_argument("--hard_val", action="store_true",
                   help="build the eval-only graded-difficulty variant "
                        "(<root>/<name>_hardval) instead")
    args = p.parse_args()
    root = Path(args.root)
    for name in args.datasets:
        out = build(name, root, args.num_frames, args.val_frames,
                    hard_val=args.hard_val)
        print(f"{name}: {out}")


if __name__ == "__main__":
    main()
