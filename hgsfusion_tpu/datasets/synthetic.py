"""Synthetic KITTI-format dataset generator (tests, benchmarks, demos).

Creates a tiny on-disk tree with the exact layout VoD/TJ4D loaders expect
(velodyne/*.bin, image_2/*, calib/*.txt, label_2/*.txt, ImageSets/*.txt,
RHGM virtual-point .pkl.npy files), so the full data pipeline — including
hybrid-point merge, FOV filtering, augmentation, and info generation — is
exercisable without the real datasets. This replaces the reference's
untestable data layer (SURVEY.md §4: the reference has no fixtures at all).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def make_calib(image_hw):
    """Intrinsics scaled to the synthetic image size; KITTI-like extrinsics
    (lidar x->cam z, lidar -y->cam x, lidar -z->cam y)."""
    h, w = image_hw
    f = 0.8 * w
    return {
        "P2": np.array(
            [[f, 0.0, w / 2, 0.02 * f], [0.0, f, h / 2, -0.01 * f],
             [0.0, 0.0, 1.0, 0.005]],
            np.float32,
        ),
        "R0": np.eye(3, dtype=np.float32),
        "Tr": np.array(
            [[0.0, -1.0, 0.0, 0.1], [0.0, 0.0, -1.0, -0.2], [1.0, 0.0, 0.0, 0.3]],
            np.float32,
        ),
    }


def _write_calib(path: Path, calib):
    def fmt(mat):
        return " ".join(f"{v:.6e}" for v in np.asarray(mat).reshape(-1))

    lines = [
        "P0: " + fmt(np.zeros((3, 4))),
        "P1: " + fmt(np.zeros((3, 4))),
        "P2: " + fmt(calib["P2"]),
        "P3: " + fmt(np.zeros((3, 4))),
        "R0_rect: " + fmt(calib["R0"]),
        "Tr_velo_to_cam: " + fmt(calib["Tr"]),
        "Tr_imu_to_velo: " + fmt(np.zeros((3, 4))),
    ]
    path.write_text("\n".join(lines) + "\n")


def make_synthetic_kitti(root, num_frames: int = 4, num_points: int = 256,
                         num_boxes: int = 3, num_virtual: int = 64,
                         image_hw=(128, 256), radar_channels: int = 7,
                         image_ext: str = ".jpg",
                         virtual_prefix: str = "virtual_points",
                         seed: int = 0):
    """Build the tree and return the root path."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    root = Path(root)
    training = root / "training"
    for sub in ("velodyne", "image_2", "depth_2", "calib", "label_2",
                virtual_prefix):
        (training / sub).mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(parents=True, exist_ok=True)

    ids = [f"{i:05d}" for i in range(num_frames)]
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids) + "\n")

    h, w = image_hw
    calib = make_calib(image_hw)
    fx, cu = calib["P2"][0, 0], calib["P2"][0, 2]
    fy, cv = calib["P2"][1, 1], calib["P2"][1, 2]
    # horizontal half-FOV in lidar terms: |cam_x/cam_z| < cu/fx
    half_tan = 0.8 * cu / fx
    classes = ["Car", "Pedestrian", "Cyclist"]
    for sid in ids:
        # radar points in front of the sensor, inside the camera FOV
        pts = np.zeros((num_points, radar_channels), np.float32)
        pts[:, 0] = rng.uniform(3, 40, num_points)
        pts[:, 1] = rng.uniform(-half_tan, half_tan, num_points) * pts[:, 0]
        pts[:, 2] = rng.uniform(-1.5, 0.5, num_points)
        pts[:, 3:] = rng.randn(num_points, radar_channels - 3)
        pts.tofile(training / "velodyne" / f"{sid}.bin")

        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(training / "image_2" / f"{sid}{image_ext}")

        # gt depth map: uint16 png at 1/256 m (vod get_depth_map convention)
        depth = rng.uniform(1.0, 50.0, (h, w)).astype(np.float32)
        Image.fromarray((depth * 256.0).astype(np.uint16)).save(
            training / "depth_2" / f"{sid}.png")

        _write_calib(training / "calib" / f"{sid}.txt", calib)

        # labels: put boxes near some points so targets exist
        lines = []
        for b in range(num_boxes):
            cls = classes[b % len(classes)]
            cx = rng.uniform(8, 30)
            cy = rng.uniform(-0.5, 0.5) * half_tan * cx
            cz = rng.uniform(-1.2, -0.4)
            if cls == "Car":
                dims_lhw = (3.9, 1.56, 1.6)
            else:
                dims_lhw = (0.8, 1.73, 0.6)
            ry = rng.uniform(-np.pi, np.pi)
            # lidar -> camera: cam x = -y + .1, cam y = -z - .2, cam z = x + .3
            cam_x, cam_y, cam_z = -cy + 0.1, -cz - 0.2, cx + 0.3
            cam_y += dims_lhw[1] / 2  # label y is the box bottom in camera
            u = fx * cam_x / cam_z + cu
            v = fy * cam_y / cam_z + cv
            bb = (
                max(u - 20, 0), max(v - 20, 0),
                min(u + 20, w - 1), min(v + 20, h - 1),
            )
            lines.append(
                f"{cls} 0.00 0 0.0 {bb[0]:.2f} {bb[1]:.2f} {bb[2]:.2f} "
                f"{bb[3]:.2f} {dims_lhw[1]:.2f} {dims_lhw[2]:.2f} "
                f"{dims_lhw[0]:.2f} {cam_x:.2f} {cam_y:.2f} {cam_z:.2f} {ry:.2f}"
            )
        (training / "label_2" / f"{sid}.txt").write_text("\n".join(lines) + "\n")

        # RHGM-style virtual point file: (N, base+8) with one-hot labels
        d = radar_channels + 8
        virtual = np.zeros((num_virtual, d), np.float32)
        virtual[:, 0] = rng.uniform(3, 40, num_virtual)
        virtual[:, 1] = rng.uniform(-half_tan, half_tan, num_virtual) * virtual[:, 0]
        virtual[:, 2] = rng.uniform(-1.5, 0.5, num_virtual)
        virtual[:, 3:radar_channels] = rng.randn(num_virtual, radar_channels - 3)
        onehot = rng.randint(0, 8, num_virtual)
        virtual[np.arange(num_virtual), radar_channels + onehot] = 1.0
        n_gt_real = max(num_virtual // 8, 1)
        gt_real = virtual[:n_gt_real].copy()
        np.save(
            training / virtual_prefix / f"{sid}.pkl",
            {"virtual_points": virtual, "real_points": gt_real},
            allow_pickle=True,
        )
    return root
