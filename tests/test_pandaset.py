"""PandaSet family: devkit-free pose geometry, raw reads, pipeline."""
import json
import pickle

import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.pandaset import (
    PandasetDataset,
    create_pandaset_infos,
    ego_to_lidar_points,
    lidar_points_to_ego,
    pose_dict_to_numpy,
    pose_numpy_to_dict,
)

SEQ = "001"


def _pose(x=0.0, y=0.0, z=0.0, yaw=0.0):
    return {
        "position": {"x": x, "y": y, "z": z},
        "heading": {
            "w": float(np.cos(yaw / 2)), "x": 0.0, "y": 0.0,
            "z": float(np.sin(yaw / 2)),
        },
    }


def _make_raw_tree(root, n_frames=2):
    import pandas as pd

    rng = np.random.RandomState(0)
    lidar_dir = root / "dataset" / SEQ / "lidar"
    cub_dir = root / "dataset" / SEQ / "annotations" / "cuboids"
    lidar_dir.mkdir(parents=True)
    cub_dir.mkdir(parents=True)
    poses = [_pose(x=2.0 * i, yaw=0.0) for i in range(n_frames)]
    with open(lidar_dir / "poses.json", "w") as f:
        json.dump(poses, f)
    for i in range(n_frames):
        # world-frame points around the ego
        n = 300
        pts = pd.DataFrame({
            "x": rng.uniform(-30, 30, n) + 2.0 * i,
            "y": rng.uniform(-30, 30, n),
            "z": rng.uniform(-2, 1, n),
            "i": rng.uniform(0, 255, n),
            "t": np.zeros(n),
            "d": np.zeros(n, np.int64),
        })
        pts.to_pickle(lidar_dir / f"{i:02d}.pkl.gz")
        cub = pd.DataFrame({
            # world frame: pandaset x right / y front
            "position.x": [3.0 + 2.0 * i, -5.0],
            "position.y": [10.0, 8.0],
            "position.z": [0.5, 0.4],
            "dimensions.x": [1.9, 0.7],   # pandaset x-dim -> normative dy
            "dimensions.y": [4.5, 0.8],
            "dimensions.z": [1.7, 1.8],
            "yaw": [0.3, 0.0],
            "label": ["Car", "Pedestrian"],
            "cuboids.sensor_id": [0, 0],
        })
        cub.to_pickle(cub_dir / f"{i:02d}.pkl.gz")


def _cfg(root):
    return ConfigDict({
        "DATASET": "PandasetDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SEQUENCES": {"train": [SEQ], "val": [SEQ], "test": []},
        "INFO_PATH": {
            "train": ["pandaset_infos_train.pkl"],
            "test": ["pandaset_infos_val.pkl"],
        },
        "LIDAR_DEVICE": 0,
        "TRAINING_CATEGORIES": {"Car": "Car", "Pedestrian": "Pedestrian"},
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "MAX_POINTS": 512,
        "MAX_GT_BOXES": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.1, 0.1, 0.2]},
        ],
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["gt_sampling"],
            "AUG_CONFIG_LIST": [
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            ],
        },
    })


class TestPoseGeometry:
    def test_world_ego_roundtrip(self):
        pose = _pose(x=3.0, y=-1.0, z=0.2, yaw=0.7)
        pts = np.array([[1.0, 2.0, 0.0], [-4.0, 0.5, 1.0]])
        ego = lidar_points_to_ego(pts, pose)
        back = ego_to_lidar_points(ego, pose)
        np.testing.assert_allclose(back, pts, atol=1e-12)

    def test_pose_numpy_roundtrip(self):
        pose = _pose(x=1, y=2, z=3, yaw=0.5)
        again = pose_numpy_to_dict(pose_dict_to_numpy(pose))
        assert again["position"]["x"] == 1
        assert again["heading"]["w"] == pytest.approx(np.cos(0.25))


class TestPandasetDataset:
    def test_infos_pipeline(self, tmp_path):
        _make_raw_tree(tmp_path)
        cfg = _cfg(tmp_path)
        create_pandaset_infos(cfg, ["Car", "Pedestrian"], tmp_path,
                              tmp_path, splits=("train", "val"))
        ds = PandasetDataset(cfg, ["Car", "Pedestrian"], training=True)
        assert len(ds) == 2
        sample = ds[1]
        assert sample["points"].shape == (512, 4)
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 2
        # frame 1 pose is x=+2 in pandaset-world (x right); normative
        # coords swap to y, negated: the car at world (5, 10) with ego at
        # (2, 0) -> ego (3, 10) -> normative (x=10, y=-3)
        info = ds.pandaset_infos[1]
        boxes, labels, zrot = ds._get_annotations(
            info, ds._get_pose(info))
        np.testing.assert_allclose(boxes[0, :3], [10.0, -3.0, 0.5],
                                   atol=1e-6)
        # dims swap: pandaset (dx=1.9, dy=4.5) -> normative (4.5, 1.9)
        np.testing.assert_allclose(boxes[0, 3:6], [4.5, 1.9, 1.7])
        assert zrot == pytest.approx(0.0)

    def test_prediction_roundtrip_and_eval(self, tmp_path):
        _make_raw_tree(tmp_path)
        cfg = _cfg(tmp_path)
        create_pandaset_infos(cfg, ["Car", "Pedestrian"], tmp_path,
                              tmp_path, splits=("train", "val"))
        ds = PandasetDataset(cfg, ["Car", "Pedestrian"], training=False)
        info = ds.pandaset_infos[0]
        pose = ds._get_pose(info)
        boxes, names, zrot = ds._get_annotations(info, pose)
        batch_dict = {
            "sequence": [1], "frame_idx": [0],
            "zrot_world_to_ego": [zrot],
            "pose": [np.asarray(pose_dict_to_numpy(pose))],
        }
        pred_dicts = [{
            "pred_boxes": boxes, "pred_scores": np.array([0.9, 0.8]),
            "pred_labels": np.array([1, 2]),
        }]
        annos = ds.generate_prediction_dicts(
            batch_dict, pred_dicts, ["Car", "Pedestrian"],
            output_path=tmp_path / "out")
        df = annos[0]["preds"]
        # world positions recovered (frame 0 pose = identity):
        # normative (x=10, y=-3)... -> pandaset world (3, 10)
        np.testing.assert_allclose(
            df["position.x"].to_numpy()[0], 3.0, atol=1e-5)
        np.testing.assert_allclose(
            df["position.y"].to_numpy()[0], 10.0, atol=1e-5)
        assert (tmp_path / "out" / "001" / "predictions" / "cuboids"
                / "00.pkl.gz").exists()

        # default eval = empty (reference parity); kitti protocol opt-in
        res, d = ds.evaluation(annos, ["Car", "Pedestrian"])
        assert res == "" and d == {}
        det_annos = []
        for info in ds.pandaset_infos:
            b, n, _ = ds._get_annotations(info, ds._get_pose(info))
            det_annos.append({
                "name": n, "boxes_lidar": b,
                "score": np.array([0.9, 0.8]),
            })
        res2, d2 = ds.evaluation(
            det_annos, ["Car", "Pedestrian"], eval_metric="kitti")
        assert "Car" in res2

    def test_gt_database(self, tmp_path):
        _make_raw_tree(tmp_path)
        cfg = _cfg(tmp_path)
        create_pandaset_infos(cfg, ["Car", "Pedestrian"], tmp_path,
                              tmp_path, splits=("train",))
        ds = PandasetDataset(cfg, ["Car", "Pedestrian"], training=True)
        db = ds.create_groundtruth_database(
            info_path=tmp_path / "pandaset_infos_train.pkl", split="train")
        assert set(db) <= {"Car", "Pedestrian"}
        assert (tmp_path / "pandaset_dbinfos_train.pkl").exists()
