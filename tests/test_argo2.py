"""Argo2 family: feather extraction, pipeline, devkit-free CDS eval."""
import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.argo2 import (
    Argo2Dataset,
    create_argo2_infos,
    quat_to_yaw_batch,
    yaw_to_quat_batch,
)
from hgsfusion_tpu.eval.argo2_eval import argo2_detection_eval

LOG_TRAIN = "log-aaaa"
LOG_VAL = "log-bbbb"


def _make_sensor_tree(root, frames_per_log=2):
    import pandas as pd

    rng = np.random.RandomState(0)
    for split, log in (("train", LOG_TRAIN), ("val", LOG_VAL)):
        seg = root / "sensor" / split / log
        (seg / "sensors" / "lidar").mkdir(parents=True)
        anno_rows = []
        for i in range(frames_per_log):
            ts = 1_000_000_000_000 + i * 100_000_000
            n = 400
            df = pd.DataFrame({
                "x": rng.uniform(-50, 50, n).astype(np.float32),
                "y": rng.uniform(-50, 50, n).astype(np.float32),
                "z": rng.uniform(-2, 3, n).astype(np.float32),
                "intensity": rng.uniform(0, 255, n).astype(np.float32),
            })
            df.to_feather(seg / "sensors" / "lidar" / f"{ts}.feather")
            for j, (cat, dims) in enumerate((
                ("REGULAR_VEHICLE", (4.6, 1.9, 1.6)),
                ("PEDESTRIAN", (0.8, 0.7, 1.8)),
            )):
                q = yaw_to_quat_batch([0.2 * j])[0]
                anno_rows.append({
                    "timestamp_ns": ts, "track_uuid": f"t-{j}",
                    "category": cat,
                    "length_m": dims[0], "width_m": dims[1],
                    "height_m": dims[2],
                    "qw": q[0], "qx": q[1], "qy": q[2], "qz": q[3],
                    "tx_m": 10.0 + 5 * j + i, "ty_m": 3.0 - 6 * j,
                    "tz_m": 0.5,
                    "num_interior_pts": 12,
                })
        pd.DataFrame(anno_rows).to_feather(seg / "annotations.feather")


def _cfg(root):
    return ConfigDict({
        "DATASET": "Argo2Dataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {
            "train": ["argo2_infos_train.pkl"],
            "test": ["argo2_infos_val.pkl"],
        },
        "EVALUATE_RANGE": 200.0,
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
        "MAX_POINTS": 1024,
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


class TestArgo2EvalCore:
    def test_quat_yaw_roundtrip(self):
        yaws = np.array([-2.0, 0.0, 0.4, 2.9])
        np.testing.assert_allclose(
            quat_to_yaw_batch(yaw_to_quat_batch(yaws)), yaws, atol=1e-12)

    def test_perfect_predictions(self):
        box = np.array([[10, 0, 0.5, 4.6, 1.9, 1.6, 0.3]])
        gt = {"REGULAR_VEHICLE": {("log", 1): box}}
        dt = {"REGULAR_VEHICLE": {
            ("log", 1): np.concatenate([box, [[0.9]]], axis=1)}}
        _, d = argo2_detection_eval(gt, dt, ["REGULAR_VEHICLE"])
        assert d["REGULAR_VEHICLE/AP"] == pytest.approx(1.0)
        assert d["REGULAR_VEHICLE/ATE"] == pytest.approx(0.0)
        assert d["REGULAR_VEHICLE/CDS"] == pytest.approx(1.0)
        assert d["AVERAGE_METRICS/CDS"] == pytest.approx(1.0)

    def test_cds_penalizes_errors(self):
        gt_box = np.array([[10, 0, 0.5, 4.6, 1.9, 1.6, 0.0]])
        # 1 m off, yaw off by pi/2 -> ATE 1.0, AOE pi/2
        dt_box = np.array([[11, 0, 0.5, 4.6, 1.9, 1.6, np.pi / 2, 0.9]])
        gt = {"REGULAR_VEHICLE": {("log", 1): gt_box}}
        dt = {"REGULAR_VEHICLE": {("log", 1): dt_box}}
        _, d = argo2_detection_eval(gt, dt, ["REGULAR_VEHICLE"])
        # matched at thresholds 2 and 4 only -> AP 0.5
        assert d["REGULAR_VEHICLE/AP"] == pytest.approx(0.5)
        assert d["REGULAR_VEHICLE/ATE"] == pytest.approx(1.0)
        assert d["REGULAR_VEHICLE/AOE"] == pytest.approx(np.pi / 2)
        expected_cds = 0.5 * np.mean([1 - 0.5, 1 - 0.0, 1 - 0.5])
        assert d["REGULAR_VEHICLE/CDS"] == pytest.approx(expected_cds)


    def test_no_greedy_fallback_to_second_gt(self):
        """av2 assigns each detection to its ARGMAX (nearest) gt only; a
        detection whose nearest gt is already claimed by a higher-scored
        detection is an FP — it must not fall back to the next-nearest
        unclaimed gt (av2 utils.assign, np.unique(idx_gts))."""
        gts = np.array([[0.0, 0, 0, 4.6, 1.9, 1.6, 0.0],
                        [1.9, 0, 0, 4.6, 1.9, 1.6, 0.0]])
        dts = np.array([[0.1, 0, 0, 4.6, 1.9, 1.6, 0.0, 0.9],
                        [0.3, 0, 0, 4.6, 1.9, 1.6, 0.0, 0.8]])
        gt = {"REGULAR_VEHICLE": {("log", 1): gts}}
        dt = {"REGULAR_VEHICLE": {("log", 1): dts}}
        _, d = argo2_detection_eval(gt, dt, ["REGULAR_VEHICLE"])
        # both dets' nearest gt is gts[0]; det2 is FP at EVERY tier, so
        # each tier has 1 TP / 1 FP / 2 gts: interpolated AP = 0.5
        assert d["REGULAR_VEHICLE/AP"] == pytest.approx(0.5, abs=0.01)

    def test_range_filter(self):
        near = np.array([[10, 0, 0.5, 4.6, 1.9, 1.6, 0.0]])
        far = np.array([[500, 0, 0.5, 4.6, 1.9, 1.6, 0.0]])
        gt = {"REGULAR_VEHICLE": {
            ("log", 1): np.concatenate([near, far], axis=0)}}
        dt = {"REGULAR_VEHICLE": {
            ("log", 1): np.concatenate([near, [[0.9]]], axis=1)}}
        _, d = argo2_detection_eval(gt, dt, ["REGULAR_VEHICLE"],
                                    max_range_m=200.0)
        assert d["REGULAR_VEHICLE/AP"] == pytest.approx(1.0)


class TestArgo2Dataset:
    def test_extraction_pipeline_eval(self, tmp_path):
        _make_sensor_tree(tmp_path)
        infos = create_argo2_infos(
            tmp_path / "sensor", tmp_path, save_bin=True)
        assert len(infos["train"]) == 2 and len(infos["val"]) == 2
        info = infos["train"][0]
        assert info["uuid"].startswith(LOG_TRAIN)
        assert info["annos"]["name"][0] == "Regular_vehicle"
        assert (tmp_path / "training" / "velodyne").exists()
        assert (tmp_path / "val_anno.feather").exists()

        cfg = _cfg(tmp_path)
        ds = Argo2Dataset(cfg, ["Regular_vehicle", "Pedestrian"],
                          training=True)
        assert len(ds) == 2
        sample = ds[0]
        assert sample["points"].shape == (1024, 4)
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 2

        val = Argo2Dataset(cfg, ["Regular_vehicle", "Pedestrian"],
                           training=False)
        # predictions == gt -> AP/CDS saturate
        results = []
        for info in val.argo2_infos:
            annos = info["annos"]
            boxes = np.concatenate([
                annos["location"], annos["dimensions"],
                annos["rotation_y"][..., None]], axis=1)
            results.append({
                "name": annos["name"],
                "score": np.array([0.9, 0.8]),
                "bbox": boxes,
                "boxes_lidar": boxes,
            })
        res_str, d = val.evaluation(
            results, ["Regular_vehicle", "Pedestrian"],
            pklfile_prefix=str(tmp_path / "dts"))
        assert d["REGULAR_VEHICLE/AP"] == pytest.approx(1.0)
        assert d["PEDESTRIAN/CDS"] == pytest.approx(1.0)
        assert d["AVERAGE_METRICS/AP"] == pytest.approx(1.0)
        assert (tmp_path / "dts.feather").exists()
        assert "AVERAGE_METRICS" in res_str
