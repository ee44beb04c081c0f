"""Lyft family: table-based infos, sweeps, mAP + kitti eval."""
import json

import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.lyft import LyftDataset, create_lyft_info
from hgsfusion_tpu.eval.lyft_eval import (
    get_ap,
    get_average_precisions,
    recall_precision,
)

VERSION = "trainval"


def _quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _make_raw_tree(root, n_scenes=2, samples_per_scene=2):
    """Lyft layout: `<root>/<version>/{data/*.json, lidar/*.bin}`."""
    rng = np.random.RandomState(0)
    root = root / VERSION
    tdir = root / "data"
    tdir.mkdir(parents=True)
    (root / "lidar").mkdir()

    categories = [
        {"token": "cat-car", "name": "car"},
        {"token": "cat-ped", "name": "pedestrian"},
    ]
    attributes = [{"token": "attr-0", "name": "object_action_parked"}]
    sensors = [
        {"token": "sens-lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    calib = [{
        "token": "cs-lidar", "sensor_token": "sens-lidar",
        "translation": [1.2, 0.0, 1.9], "rotation": _quat(0.0),
        "camera_intrinsic": [],
    }]
    logs = [{"token": "log-0", "logfile": "", "vehicle": "", "location": ""}]
    scenes, samples, sample_datas, ego_poses = [], [], [], []
    annotations, instances = [], []
    t0 = 1_000_000_000.0
    for s in range(n_scenes):
        scene_token = f"scene-tok-{s}"
        toks = [f"samp-{s}-{i}" for i in range(samples_per_scene)]
        scenes.append({
            "token": scene_token, "name": f"lyft-{s}", "log_token": "log-0",
            "nbr_samples": samples_per_scene,
            "first_sample_token": toks[0], "last_sample_token": toks[-1],
        })
        inst_tokens = [f"inst-{s}-0", f"inst-{s}-1"]
        instances.append({"token": inst_tokens[0],
                          "category_token": "cat-car",
                          "nbr_annotations": samples_per_scene})
        instances.append({"token": inst_tokens[1],
                          "category_token": "cat-ped",
                          "nbr_annotations": samples_per_scene})
        prev_sd = ""
        for i, tok in enumerate(toks):
            ts = int((t0 + s * 100 + i * 0.2) * 1e6)
            samples.append({
                "token": tok, "timestamp": ts, "scene_token": scene_token,
                "prev": toks[i - 1] if i > 0 else "",
                "next": toks[i + 1] if i + 1 < samples_per_scene else "",
            })
            ego_t = [5.0 * i, 0.0, 0.0]
            sd_tok = f"sd-{s}-{i}"
            ego_poses.append({
                "token": f"ep-{sd_tok}", "translation": ego_t,
                "rotation": _quat(0.0), "timestamp": ts,
            })
            fname = f"lidar/{sd_tok}.bin"
            pts = np.zeros((200, 5), np.float32)
            pts[:, 0] = rng.uniform(-40, 40, 200)
            pts[:, 1] = rng.uniform(-40, 40, 200)
            pts[:, 2] = rng.uniform(-2, 1, 200)
            raw = pts.reshape(-1)
            # exercise the truncated-file quirk on the first bin
            if s == 0 and i == 0:
                raw = np.concatenate([raw, np.zeros(3, np.float32)])
            raw.tofile(root / fname)
            sample_datas.append({
                "token": sd_tok, "sample_token": tok,
                "ego_pose_token": f"ep-{sd_tok}",
                "calibrated_sensor_token": "cs-lidar",
                "timestamp": ts, "filename": fname,
                "is_key_frame": True, "fileformat": "bin",
                "prev": prev_sd, "next": "",
            })
            prev_sd = sd_tok
            for j, (inst, wlh) in enumerate((
                (inst_tokens[0], [1.9, 4.5, 1.7]),
                (inst_tokens[1], [0.7, 0.8, 1.8]),
            )):
                annotations.append({
                    "token": f"ann-{s}-{i}-{j}", "sample_token": tok,
                    "instance_token": inst, "attribute_tokens": [],
                    "translation": [ego_t[0] + 10.0 + 3 * j, 4.0 - 8 * j,
                                    0.9],
                    "size": wlh, "rotation": _quat(0.2 * j),
                    "prev": f"ann-{s}-{i - 1}-{j}" if i > 0 else "",
                    "next": (f"ann-{s}-{i + 1}-{j}"
                             if i + 1 < samples_per_scene else ""),
                    "visibility_token": "",
                })
    tables = {
        "category": categories, "attribute": attributes, "sensor": sensors,
        "calibrated_sensor": calib, "ego_pose": ego_poses, "log": logs,
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "sample_annotation": annotations, "instance": instances,
    }
    for name, rows in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)


def _cfg(root):
    return ConfigDict({
        "DATASET": "LyftDataset",
        "DATA_PATH": str(root),
        "VERSION": VERSION,
        "MAX_SWEEPS": 1,
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {
            "train": ["lyft_infos_train.pkl"],
            "test": ["lyft_infos_val.pkl"],
        },
        "EVAL_LYFT_IOU_LIST": [0.5, 0.75],
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "MAX_POINTS": 512,
        "MAX_GT_BOXES": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
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


class TestLyftEvalCore:
    def test_voc_ap_rectangle(self):
        # precision 1.0 up to recall 0.5, then 0 -> AP 0.5
        ap = get_ap(np.array([0.25, 0.5]), np.array([1.0, 1.0]))
        assert ap == pytest.approx(0.5)

    def test_recall_precision_thresholds(self):
        box = np.array([0, 0, 0, 4, 2, 1.6, 0.0])
        near = box.copy()
        near[0] += 2.0  # IoU = 2/6 = 0.33: passes 0.25, fails 0.5
        gt = [{"sample_token": "a", "name": "car", "box": box}]
        preds = [{"sample_token": "a", "name": "car", "box": near,
                  "score": 0.9}]
        _, _, aps = recall_precision(gt, preds, [0.25, 0.5])
        assert aps[0] == pytest.approx(1.0)
        assert aps[1] == pytest.approx(0.0)

    def test_average_precisions_classwise(self):
        box = np.array([5, 0, 0, 4, 2, 1.6, 0.0])
        gt = [
            {"sample_token": "a", "name": "car", "box": box},
            {"sample_token": "a", "name": "pedestrian",
             "box": np.array([0, 5, 0, 0.7, 0.8, 1.8, 0.0])},
        ]
        preds = [dict(gt[0], score=0.9)]  # only the car predicted
        aps = get_average_precisions(gt, preds, ["car", "pedestrian"], [0.5])
        np.testing.assert_allclose(aps, [1.0, 0.0])


class TestLyftDataset:
    def test_infos_pipeline_eval(self, tmp_path):
        _make_raw_tree(tmp_path)
        train_infos, val_infos = create_lyft_info(
            tmp_path, tmp_path / VERSION, version=VERSION,
            train_scenes=["lyft-0"], val_scenes=["lyft-1"], max_sweeps=2,
        )
        assert len(train_infos) == 2 and len(val_infos) == 2
        info = train_infos[0]
        # identity rotations: lidar box = global - ego_t - cs_t
        np.testing.assert_allclose(
            info["gt_boxes"][0, :3], [10.0 - 1.2, 4.0, 0.9 - 1.9],
            atol=1e-9)
        np.testing.assert_allclose(
            info["gt_boxes"][0, 3:6], [4.5, 1.9, 1.7], atol=1e-9)
        assert info["gt_names"][0] == "car"
        assert len(info["sweeps"]) == 1

        cfg = _cfg(tmp_path)
        ds = LyftDataset(cfg, ["car", "pedestrian"], training=True)
        assert len(ds) == 2
        sample = ds[0]
        assert sample["points"].shape == (512, 5)
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 2

        val = LyftDataset(cfg, ["car", "pedestrian"], training=False)
        det_annos = []
        for info in val.infos:
            det_annos.append({
                "name": np.asarray(info["gt_names"]),
                "score": np.array([0.9, 0.8]),
                "boxes_lidar": np.asarray(info["gt_boxes"], np.float32),
                "pred_labels": np.array([1, 2]),
                "frame_id": "x",
                "metadata": {"token": info["token"]},
            })
        res_str, ret = val.evaluation(
            det_annos, ["car", "pedestrian"], eval_metric="lyft")
        assert ret["mAP"] == pytest.approx(1.0)
        assert ret["AP_car"] == pytest.approx(1.0)

        res_str2, ret2 = val.evaluation(
            det_annos, ["car", "pedestrian"], eval_metric="kitti")
        assert "Car" in res_str2

    def test_gt_database(self, tmp_path):
        _make_raw_tree(tmp_path)
        create_lyft_info(
            tmp_path, tmp_path / VERSION, version=VERSION,
            train_scenes=["lyft-0"], val_scenes=["lyft-1"], max_sweeps=1,
        )
        ds = LyftDataset(_cfg(tmp_path), ["car", "pedestrian"],
                         training=True)
        db = ds.create_groundtruth_database(max_sweeps=1)
        assert set(db) <= {"car", "pedestrian"}
