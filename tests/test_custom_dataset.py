"""Custom (bring-your-own-data) dataset family: IO, infos, pipeline, eval."""
import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.custom import (
    CustomDataset,
    lidar_box_to_pseudo_camera,
)


def _make_tree(root, n_frames=3, boxes_per_frame=1):
    (root / "points").mkdir(parents=True)
    (root / "labels").mkdir()
    (root / "ImageSets").mkdir()
    rng = np.random.RandomState(0)
    ids = [f"{i:06d}" for i in range(n_frames)]
    for i, idx in enumerate(ids):
        pts = np.zeros((200, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 16, 200)
        pts[:, 1] = rng.uniform(-8, 8, 200)
        pts[:, 2] = rng.uniform(-2, 1, 200)
        np.save(root / "points" / f"{idx}.npy", pts)
        with open(root / "labels" / f"{idx}.txt", "w") as f:
            for b in range(boxes_per_frame):
                f.write(
                    f"{4 + (i + 3 * b) % 40} {-20 + b} -0.5"
                    " 3.9 1.6 1.56 0.3 Vehicle\n"
                )
                f.write(
                    f"{10 + (i + 2 * b) % 30} {20 - b} -0.8"
                    " 0.8 0.6 1.73 -0.5 Human\n"
                )
    for split, sel in (("train", ids[:2]), ("val", ids)):
        with open(root / "ImageSets" / f"{split}.txt", "w") as f:
            f.write("\n".join(sel) + "\n")


def _cfg(root):
    return ConfigDict({
        "DATASET": "CustomDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "POINT_CLOUD_RANGE": [0, -25.6, -3, 51.2, 25.6, 2],
        "MAX_POINTS": 256,
        "MAX_GT_BOXES": 64,
        "NUM_POINT_FEATURES": 4,
        "MAP_CLASS_TO_KITTI": {"Vehicle": "Car", "Human": "Pedestrian"},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.16, 0.16, 0.16]},
        ],
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["gt_sampling"],
            "AUG_CONFIG_LIST": [
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            ],
        },
    })


class TestCustomDataset:
    def test_pseudo_camera_roundtrip_geometry(self):
        boxes = np.array([[5.0, -2.0, -0.5, 3.9, 1.6, 1.56, 0.3]], np.float32)
        loc, dims, ry = lidar_box_to_pseudo_camera(boxes)
        # bottom center: z_bottom = -0.5 - 1.56/2
        np.testing.assert_allclose(loc[0], [2.0, 0.5 + 0.78, 5.0], atol=1e-5)
        np.testing.assert_allclose(dims[0], [3.9, 1.56, 1.6], atol=1e-6)
        np.testing.assert_allclose(ry[0], -0.3 - np.pi / 2, atol=1e-6)

    def test_infos_pipeline_eval(self, tmp_path):
        _make_tree(tmp_path, n_frames=3, boxes_per_frame=15)
        cfg = _cfg(tmp_path)
        ds = CustomDataset(cfg, ["Vehicle", "Human"], training=True)
        assert len(ds) == 0  # no infos yet
        ds.create_infos(splits=("train", "val"))
        ds.load_infos()
        assert len(ds) == 2

        sample = ds[0]
        assert sample["points"].shape == (256, 4)
        assert sample["points_valid"].sum() > 0
        assert sample["gt_boxes"].shape == (64, 8)
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 30

        # eval: detections == gt -> AP saturates for both mapped classes
        # (the official threshold sampler needs >= ~41 gts and distinct
        # scores for AP to reach 100; tiny sets cap below that by design)
        val = CustomDataset(cfg, ["Vehicle", "Human"], training=False)
        val.load_infos()
        assert len(val) == 3
        det_annos = []
        score = 0.99
        for info in val.infos:
            a = dict(info["annos"])
            det = {k: np.copy(v) for k, v in a.items()}
            det["score"] = score - 0.001 * np.arange(len(a["name"]))
            score -= 0.05
            det["boxes_lidar"] = a["gt_boxes_lidar"]
            det_annos.append(det)
        result_str, result_dict = val.evaluation(
            det_annos, ["Vehicle", "Human"]
        )
        assert result_dict["Car_3d/moderate_R40"] == pytest.approx(100.0, abs=6)
        assert result_dict["Pedestrian_3d/moderate_R40"] == pytest.approx(
            100.0, abs=6
        )
        assert "Car" in result_str and "Pedestrian" in result_str
