"""NuScenes family: raw-table reader, info creation, pipeline, NDS eval."""
import json

import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.nuscenes import (
    NuScenesDataset,
    create_nuscenes_info,
    quat_to_rotmat,
    quaternion_yaw,
    rotmat_to_quat,
    transform_matrix,
    yaw_to_quat,
)
from hgsfusion_tpu.eval.nuscenes_eval import (
    accumulate,
    nuscenes_detection_eval,
)

VERSION = "v1.0-synth"


def _quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _make_raw_tree(root, n_scenes=2, samples_per_scene=2):
    """Minimal raw nuScenes table tree: LIDAR_TOP keyframes + one
    intermediate sweep each, two instances with annotations per sample."""
    rng = np.random.RandomState(0)
    root = root / VERSION  # reference layout: tables + data under version
    tdir = root / VERSION
    tdir.mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)

    categories = [
        {"token": "cat-car", "name": "vehicle.car"},
        {"token": "cat-ped", "name": "human.pedestrian.adult"},
    ]
    attributes = [
        {"token": "attr-park", "name": "vehicle.parked"},
        {"token": "attr-vmove", "name": "vehicle.moving"},
        {"token": "attr-move", "name": "pedestrian.moving"},
    ]
    sensors = [
        {"token": "sens-lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    calib = [{
        "token": "cs-lidar", "sensor_token": "sens-lidar",
        "translation": [0.9, 0.0, 1.8], "rotation": _quat(0.0),
        "camera_intrinsic": [],
    }]
    logs = [{"token": "log-0", "logfile": "", "vehicle": "", "location": ""}]

    scenes, samples, sample_datas, ego_poses = [], [], [], []
    annotations, instances = [], []
    t0 = 1_000_000_000.0

    for s in range(n_scenes):
        scene_token = f"scene-tok-{s}"
        sample_tokens = [
            f"samp-{s}-{i}" for i in range(samples_per_scene)
        ]
        scenes.append({
            "token": scene_token, "name": f"synth-{s}",
            "log_token": "log-0", "nbr_samples": samples_per_scene,
            "first_sample_token": sample_tokens[0],
            "last_sample_token": sample_tokens[-1],
        })
        # two instances per scene
        inst_tokens = [f"inst-{s}-0", f"inst-{s}-1"]
        instances.append({
            "token": inst_tokens[0], "category_token": "cat-car",
            "nbr_annotations": samples_per_scene,
        })
        instances.append({
            "token": inst_tokens[1], "category_token": "cat-ped",
            "nbr_annotations": samples_per_scene,
        })
        prev_sd = ""
        for i, tok in enumerate(sample_tokens):
            ts = int((t0 + s * 100 + i * 0.5) * 1e6)
            samples.append({
                "token": tok, "timestamp": ts, "scene_token": scene_token,
                "prev": sample_tokens[i - 1] if i > 0 else "",
                "next": (sample_tokens[i + 1]
                         if i + 1 < samples_per_scene else ""),
            })
            ego_t = [10.0 * i + 100.0 * s, 2.0 * i, 0.0]
            # one intermediate (non-key) sweep before each keyframe
            if i > 0:
                sw_tok = f"sd-sweep-{s}-{i}"
                ego_poses.append({
                    "token": f"ep-{sw_tok}",
                    "translation": [ego_t[0] - 5.0, ego_t[1] - 1.0, 0.0],
                    "rotation": _quat(0.0),
                    "timestamp": ts - int(0.25e6),
                })
                fname = f"sweeps/LIDAR_TOP/{sw_tok}.bin"
                pts = rng.randn(64, 5).astype(np.float32)
                pts.tofile(root / fname)
                sample_datas.append({
                    "token": sw_tok, "sample_token": tok,
                    "ego_pose_token": f"ep-{sw_tok}",
                    "calibrated_sensor_token": "cs-lidar",
                    "timestamp": ts - int(0.25e6), "filename": fname,
                    "is_key_frame": False, "fileformat": "bin",
                    "prev": prev_sd, "next": "",
                })
                prev_sd = sw_tok
            sd_tok = f"sd-key-{s}-{i}"
            ego_poses.append({
                "token": f"ep-{sd_tok}", "translation": ego_t,
                "rotation": _quat(0.0), "timestamp": ts,
            })
            fname = f"samples/LIDAR_TOP/{sd_tok}.bin"
            pts = np.zeros((256, 5), np.float32)
            pts[:, 0] = rng.uniform(-30, 30, 256)
            pts[:, 1] = rng.uniform(-30, 30, 256)
            pts[:, 2] = rng.uniform(-2, 1, 256)
            pts[:, 3] = rng.uniform(0, 255, 256)
            pts.tofile(root / fname)
            sample_datas.append({
                "token": sd_tok, "sample_token": tok,
                "ego_pose_token": f"ep-{sd_tok}",
                "calibrated_sensor_token": "cs-lidar",
                "timestamp": ts, "filename": fname,
                "is_key_frame": True, "fileformat": "bin",
                "prev": prev_sd, "next": "",
            })
            prev_sd = sd_tok
            # annotations: car moving with ego, ped stationary
            for j, (inst, cat_sz, attr) in enumerate((
                # the car moves with the ego -> 'vehicle.moving' matches the
                # submission attribute heuristic for fast boxes
                (inst_tokens[0], [1.95, 4.6, 1.7], "attr-vmove"),
                (inst_tokens[1], [0.6, 0.7, 1.8], "attr-move"),
            )):
                ann_tok = f"ann-{s}-{i}-{j}"
                gx = ego_t[0] + 8.0 + 2.0 * j + (1.0 * i if j == 0 else 0.0)
                gy = ego_t[1] + 3.0 - 6.0 * j
                annotations.append({
                    "token": ann_tok, "sample_token": tok,
                    "instance_token": inst,
                    "attribute_tokens": [attr],
                    "translation": [gx, gy, 0.9],
                    "size": cat_sz,  # w, l, h
                    "rotation": _quat(0.3 * j),
                    "prev": f"ann-{s}-{i - 1}-{j}" if i > 0 else "",
                    "next": (f"ann-{s}-{i + 1}-{j}"
                             if i + 1 < samples_per_scene else ""),
                    "num_lidar_pts": 10, "num_radar_pts": 2,
                    "visibility_token": "4",
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
        "DATASET": "NuScenesDataset",
        "DATA_PATH": str(root),
        "VERSION": VERSION,
        "MAX_SWEEPS": 2,
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {
            "train": ["nuscenes_infos_2sweeps_train.pkl"],
            "test": ["nuscenes_infos_2sweeps_val.pkl"],
        },
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "BALANCED_RESAMPLING": False,
        "PRED_VELOCITY": True,
        "SET_NAN_VELOCITY_TO_ZEROS": True,
        "FILTER_MIN_POINTS_IN_GT": 1,
        "MAX_POINTS": 1024,
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


class TestQuaternions:
    def test_quat_rotmat_roundtrip(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            r = quat_to_rotmat(q)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(rotmat_to_quat(r), q, atol=1e-9)

    def test_yaw_quat(self):
        for yaw in (-2.5, -0.3, 0.0, 1.2, 3.0):
            assert quaternion_yaw(yaw_to_quat(yaw)) == pytest.approx(yaw)

    def test_transform_matrix_inverse(self):
        q = yaw_to_quat(0.7)
        t = [1.0, -2.0, 0.5]
        fwd = transform_matrix(t, q, inverse=False)
        inv = transform_matrix(t, q, inverse=True)
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)


class TestNuScenesEval:
    def _boxes(self, centers, name, score=None, yaw=0.0,
               size=(2.0, 4.5, 1.7), vel=(0.0, 0.0), attr="vehicle.parked"):
        out = []
        for c in centers:
            b = {
                "translation": np.asarray(c, np.float64),
                "size": np.asarray(size, np.float64),
                "yaw": yaw, "velocity": np.asarray(vel, np.float64),
                "detection_name": name, "attribute_name": attr,
            }
            if score is not None:
                b["detection_score"] = score
            out.append(b)
        return out

    def test_perfect_predictions_saturate(self):
        gt = {"s0": self._boxes([[5, 0, 1], [10, 3, 1]], "car")}
        pred = {"s0": self._boxes([[5, 0, 1], [10, 3, 1]], "car", score=0.9)}
        res, details = nuscenes_detection_eval(gt, pred, ["car"])
        assert details["mAP"] == pytest.approx(1.0)
        assert details["mATE"] == pytest.approx(0.0)
        assert details["mASE"] == pytest.approx(0.0)
        assert details["mAOE"] == pytest.approx(0.0)
        assert details["NDS"] == pytest.approx(1.0)

    def test_distance_thresholds_gate_matching(self):
        gt = {"s0": self._boxes([[0, 0, 1]], "car")}
        # pred 1.5 m off: misses 0.5/1.0 thresholds, hits 2.0/4.0
        pred = {"s0": self._boxes([[1.5, 0, 1]], "car", score=0.9)}
        _, details = nuscenes_detection_eval(gt, pred, ["car"])
        assert details["mAP"] == pytest.approx(0.5)
        assert details["mATE"] == pytest.approx(1.5)

    def test_tp_error_components(self):
        gt = {"s0": self._boxes(
            [[0, 0, 1]], "car", yaw=0.0, size=(2.0, 4.0, 2.0),
            vel=(1.0, 0.0), attr="vehicle.moving")}
        pred = {"s0": self._boxes(
            [[0, 1, 1]], "car", score=0.9, yaw=0.5, size=(2.0, 2.0, 2.0),
            vel=(3.0, 0.0), attr="vehicle.parked")}
        md = accumulate(gt, pred, "car", 2.0)
        assert md["trans_err"][-1] == pytest.approx(1.0)
        assert md["orient_err"][-1] == pytest.approx(0.5)
        assert md["scale_err"][-1] == pytest.approx(0.5)  # 1 - 8/16
        assert md["vel_err"][-1] == pytest.approx(2.0)
        assert md["attr_err"][-1] == pytest.approx(1.0)

    def test_barrier_period_and_skips(self):
        gt = {"s0": self._boxes([[0, 0, 1]], "barrier", attr="")}
        pred = {"s0": self._boxes(
            [[0, 0, 1]], "barrier", score=0.9, yaw=np.pi)}
        _, details = nuscenes_detection_eval(gt, pred, ["barrier"])
        # yaw off by pi == equivalent barrier orientation
        assert details["mAOE"] == pytest.approx(0.0)
        assert np.isnan(details["mAVE"])  # undefined for barrier
        assert np.isnan(details["mAAE"])

    def test_cummean_prefix_before_first_valid_is_zero(self):
        from hgsfusion_tpu.eval.nuscenes_eval import _cummean

        # devkit cummean: positions before the first non-NaN entry are 0.0
        out = _cummean(np.array([np.nan, np.nan, 2.0, 4.0]))
        np.testing.assert_allclose(out, [0.0, 0.0, 2.0, 3.0])
        # all-NaN special case -> ones
        np.testing.assert_allclose(
            _cummean(np.array([np.nan, np.nan])), [1.0, 1.0])

    def test_nan_gt_velocity_skipped_in_mave(self):
        # two gts: one with NaN velocity (single-annotation instance), one
        # with a real velocity error of 2.0; devkit semantics: the NaN match
        # is skipped by cummean, so the final vel_err is 2.0 — not biased
        # by |pred_vel| of the NaN match.
        gt = {"s0": (
            self._boxes([[0, 0, 1]], "car", vel=(np.nan, np.nan))
            + self._boxes([[20, 0, 1]], "car", vel=(1.0, 0.0)))}
        pred = {"s0": (
            self._boxes([[0, 0, 1]], "car", score=0.9, vel=(5.0, 0.0))
            + self._boxes([[20, 0, 1]], "car", score=0.8, vel=(3.0, 0.0)))}
        md = accumulate(gt, pred, "car", 2.0)
        assert md["vel_err"][-1] == pytest.approx(2.0)

    def test_range_filter_drops_far_boxes(self):
        gt = {"s0": self._boxes([[5, 0, 1], [100, 0, 1]], "car")}
        pred = {"s0": self._boxes([[5, 0, 1]], "car", score=0.9)}
        _, details = nuscenes_detection_eval(gt, pred, ["car"])
        assert details["mAP"] == pytest.approx(1.0)  # far gt filtered


class TestNuScenesDataset:
    def test_create_infos_and_pipeline(self, tmp_path):
        _make_raw_tree(tmp_path)
        train_infos, val_infos = create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"],
        )
        assert len(train_infos) == 2 and len(val_infos) == 2

        info = train_infos[0]
        # identity rotations: lidar box = global - ego_t - cs_t
        np.testing.assert_allclose(
            info["gt_boxes"][0, :3], [8.0 - 0.9, 3.0, 0.9 - 1.8], atol=1e-9)
        # wlh (1.95, 4.6, 1.7) -> dxdydz (l, w, h)
        np.testing.assert_allclose(
            info["gt_boxes"][0, 3:6], [4.6, 1.95, 1.7], atol=1e-9)
        # car global motion = ego (+10, +2) plus own +1 in x per 0.5 s
        np.testing.assert_allclose(
            info["gt_boxes"][0, 7:9], [22.0, 4.0], atol=1e-6)
        assert info["gt_names"][0] == "car"
        assert info["gt_attributes"][1] == "pedestrian.moving"
        # sweeps recorded with transform to the keyframe
        assert len(info["sweeps"]) == 1

        cfg = _cfg(tmp_path)
        ds = NuScenesDataset(cfg, ["car", "pedestrian"], training=True)
        assert len(ds) == 2
        sample = ds[0]
        assert sample["points"].shape == (1024, 5)
        assert sample["gt_boxes"].shape == (16, 10)  # 7 + vx vy + class
        n_valid = int((sample["gt_boxes"][:, -1] > 0).sum())
        assert n_valid == 2

    def test_eval_roundtrip_and_submission(self, tmp_path):
        _make_raw_tree(tmp_path)
        create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"],
        )
        cfg = _cfg(tmp_path)
        val = NuScenesDataset(cfg, ["car", "pedestrian"], training=False)
        assert len(val) == 2
        det_annos = []
        for info in val.infos:
            det_annos.append({
                "name": np.asarray(info["gt_names"]),
                "score": 0.9 - 0.01 * np.arange(len(info["gt_names"])),
                "boxes_lidar": np.asarray(info["gt_boxes"], np.float32),
                "pred_labels": np.asarray(
                    [1 if n == "car" else 2 for n in info["gt_names"]]),
                "frame_id": info["token"],
                "metadata": {"token": info["token"]},
            })
        result_str, details = val.evaluation(
            det_annos, ["car", "pedestrian"],
            output_path=tmp_path / "out")
        assert details["mAP"] == pytest.approx(1.0)
        assert details["NDS"] == pytest.approx(1.0, abs=1e-6)
        assert "NDS" in result_str

        # submission file: global-frame boxes must round-trip the info
        # matrices (identity rotations: global = lidar + ego_t + cs_t)
        sub = json.load(open(tmp_path / "out" / "results_nusc.json"))
        tok = val.infos[0]["token"]
        first = sub["results"][tok][0]
        lidar_box = np.asarray(val.infos[0]["gt_boxes"][0])
        ego_t = np.array([0.0, 0.0, 0.0])  # scene-1 sample-0: i=0, s=1
        np.testing.assert_allclose(
            first["translation"],
            lidar_box[:3] + np.array([100.0, 0.0, 0.0])
            + np.array([0.9, 0.0, 1.8]),
            atol=1e-6,
        )
        assert first["detection_name"] == "car"

    def test_gt_database(self, tmp_path):
        _make_raw_tree(tmp_path)
        create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"],
        )
        cfg = _cfg(tmp_path)
        ds = NuScenesDataset(cfg, ["car", "pedestrian"], training=True)
        db = ds.create_groundtruth_database(max_sweeps=2)
        assert set(db) <= {"car", "pedestrian"}
        assert (tmp_path / VERSION /
                "nuscenes_dbinfos_2sweeps_withvelo.pkl").exists()


class TestNuScenesCenterPointIntegration:
    def test_config_dataset_model_forward(self, tmp_path):
        """centerpoint_nuscenes.yaml end-to-end on a synthetic raw tree:
        create infos -> dataset batch -> CenterPointModel forward."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from hgsfusion_tpu.config import load_config, model_config_from_yaml
        from hgsfusion_tpu.datasets import build_dataset
        from hgsfusion_tpu.datasets.dataset import DatasetTemplate
        from hgsfusion_tpu.models.registry import build_network

        _make_raw_tree(tmp_path)
        create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"],
        )
        cfg = load_config("configs/centerpoint_nuscenes.yaml")
        # shrink to test scale: small grid, synthetic tree, 2-sweep infos
        cfg.DATA_CONFIG.DATA_PATH = str(tmp_path)
        cfg.DATA_CONFIG.VERSION = VERSION
        cfg.DATA_CONFIG.MAX_SWEEPS = 2
        cfg.DATA_CONFIG.BALANCED_RESAMPLING = False
        cfg.DATA_CONFIG.FILTER_MIN_POINTS_IN_GT = 1
        cfg.DATA_CONFIG.MAX_POINTS = 512
        cfg.DATA_CONFIG.MAX_GT_BOXES = 16
        cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [
            -32.0, -32.0, -5.0, 32.0, 32.0, 3.0]
        cfg.DATA_CONFIG.INFO_PATH = {
            "train": ["nuscenes_infos_2sweeps_train.pkl"],
            "test": ["nuscenes_infos_2sweeps_val.pkl"],
        }
        for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
            if p["NAME"] == "calculate_grid_size":
                p["VOXEL_SIZE"] = [1.0, 1.0, 8.0]
        cfg.MODEL.FusionVFE.RadarBackbone.READER.PILLAR_SIZE = 1.0

        mc = model_config_from_yaml(cfg)
        mc = dataclasses.replace(
            mc, pc_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE))
        assert mc.num_class == 10
        ds = build_dataset(
            cfg.DATA_CONFIG, list(cfg.CLASS_NAMES), training=True)
        assert len(ds) == 2
        batch = DatasetTemplate.collate_batch([ds[0]])
        batch = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k in ("points", "points_valid", "gt_boxes")
        }
        model = build_network(cfg, mc)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        preds = model.apply(variables, batch, False)
        # center head emits a 10-class heatmap on the stride-2 BEV grid
        assert preds["hm"].shape[0] == 1
        assert preds["hm"].shape[-1] == 10


class TestNuScenesMultiCam:
    def test_with_cam_infos_and_loading(self, tmp_path):
        """with_cam=True records per-camera sensor2lidar transforms and
        load_camera_info yields stacked crops + matrices
        (nuscenes_utils.obtain_sensor2top + nuscenes_dataset.py:155-212)."""
        from PIL import Image

        _make_raw_tree(tmp_path)
        root = tmp_path / VERSION
        # extend the tables with one camera per sample
        tdir = root / VERSION
        for name in ("sensor", "calibrated_sensor", "sample_data"):
            pass
        sensors = json.load(open(tdir / "sensor.json"))
        sensors.append({"token": "sens-cam", "channel": "CAM_FRONT",
                        "modality": "camera"})
        json.dump(sensors, open(tdir / "sensor.json", "w"))
        calib = json.load(open(tdir / "calibrated_sensor.json"))
        calib.append({
            "token": "cs-cam", "sensor_token": "sens-cam",
            "translation": [1.5, 0.0, 1.5], "rotation": _quat(0.0),
            "camera_intrinsic": [[800, 0, 400], [0, 800, 225], [0, 0, 1]],
        })
        json.dump(calib, open(tdir / "calibrated_sensor.json", "w"))
        sds = json.load(open(tdir / "sample_data.json"))
        (root / "samples" / "CAM_FRONT").mkdir(parents=True)
        new_sds = []
        for sd in sds:
            if sd["is_key_frame"]:
                cam_tok = "cam-" + sd["token"]
                fname = f"samples/CAM_FRONT/{cam_tok}.jpg"
                Image.new("RGB", (800, 450), (90, 120, 150)).save(
                    root / fname)
                new_sds.append({
                    "token": cam_tok, "sample_token": sd["sample_token"],
                    "ego_pose_token": sd["ego_pose_token"],
                    "calibrated_sensor_token": "cs-cam",
                    "timestamp": sd["timestamp"], "filename": fname,
                    "is_key_frame": True, "fileformat": "jpg",
                    "prev": "", "next": "",
                })
        json.dump(sds + new_sds, open(tdir / "sample_data.json", "w"))

        train_infos, _ = create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"], with_cam=True,
        )
        info = train_infos[0]
        assert "cams" in info and "CAM_FRONT" in info["cams"]
        cam = info["cams"]["CAM_FRONT"]
        # identity rotations: sensor2lidar translation = cs_cam - cs_lidar
        np.testing.assert_allclose(
            cam["sensor2lidar_translation"], [0.6, 0.0, -0.3], atol=1e-9)
        np.testing.assert_allclose(
            cam["sensor2lidar_rotation"], np.eye(3), atol=1e-12)

        cfg = _cfg(tmp_path)
        cfg["CAMERA_CONFIG"] = {
            "USE_CAMERA": True,
            "IMAGE": {
                "FINAL_DIM": [128, 352],
                "RESIZE_LIM_TRAIN": [0.4, 0.5],
                "RESIZE_LIM_TEST": [0.45, 0.45],
            },
        }
        ds = NuScenesDataset(cfg, ["car", "pedestrian"], training=False)
        input_dict = ds.load_camera_info(
            {"points": np.zeros((1, 5), np.float32)}, ds.infos[0])
        assert input_dict["camera_imgs"].shape == (1, 128, 352, 3)
        assert input_dict["lidar2camera"].shape == (1, 4, 4)
        assert input_dict["camera_intrinsics"].shape == (1, 4, 4)
        # lidar2camera is the inverse of camera2lidar
        np.testing.assert_allclose(
            input_dict["lidar2camera"][0] @ input_dict["camera2lidar"][0],
            np.eye(4), atol=1e-5)


class TestNuScenesExport:
    def test_centerpoint_export_roundtrip(self, tmp_path):
        """The serving export handles the anchor-free CenterHead decode
        path: export the nuScenes CenterPoint model and call the
        deserialized artifact."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        from hgsfusion_tpu.config import load_config, model_config_from_yaml
        from hgsfusion_tpu.datasets import build_dataset
        from hgsfusion_tpu.datasets.dataset import DatasetTemplate
        from hgsfusion_tpu.models.registry import build_network
        from hgsfusion_tpu.train.trainer import device_batch, model_inputs

        _make_raw_tree(tmp_path)
        create_nuscenes_info(
            VERSION, tmp_path, tmp_path / VERSION, max_sweeps=2,
            train_scenes=["synth-0"], val_scenes=["synth-1"],
        )
        cfg = load_config("configs/centerpoint_nuscenes.yaml")
        cfg.DATA_CONFIG.DATA_PATH = str(tmp_path)
        cfg.DATA_CONFIG.VERSION = VERSION
        cfg.DATA_CONFIG.MAX_SWEEPS = 2
        cfg.DATA_CONFIG.BALANCED_RESAMPLING = False
        cfg.DATA_CONFIG.MAX_POINTS = 512
        cfg.DATA_CONFIG.MAX_GT_BOXES = 16
        cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-32.0, -32.0, -5.0, 32.0,
                                             32.0, 3.0]
        cfg.DATA_CONFIG.INFO_PATH = {
            "train": ["nuscenes_infos_2sweeps_train.pkl"],
            "test": ["nuscenes_infos_2sweeps_val.pkl"],
        }
        for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
            if p["NAME"] == "calculate_grid_size":
                p["VOXEL_SIZE"] = [1.0, 1.0, 8.0]
        cfg.MODEL.FusionVFE.RadarBackbone.READER.PILLAR_SIZE = 1.0

        mc = model_config_from_yaml(cfg)
        mc = dataclasses.replace(
            mc, pc_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE))
        ds = build_dataset(cfg.DATA_CONFIG, list(cfg.CLASS_NAMES),
                           training=False)
        batch = DatasetTemplate.collate_batch([ds[0]])
        example = {k: jnp.asarray(v)
                   for k, v in device_batch(batch).items()}
        model = build_network(cfg, mc)
        variables = model.init(jax.random.PRNGKey(0),
                               model_inputs(example), False)

        import pathlib
        import sys as _sys
        _sys.path.insert(
            0, str(pathlib.Path(__file__).resolve().parent.parent))
        from tools.export import export_model

        exported = export_model(
            cfg, mc, variables["params"],
            variables.get("batch_stats", {}), example)
        blob = exported.serialize()
        again = jexport.deserialize(blob)
        dets = again.call(model_inputs(example))
        assert set(dets) >= {"boxes", "scores", "labels", "valid"}
        assert "vels" in dets  # velocity head decoded in the artifact
