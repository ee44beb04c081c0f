"""Waymo family: processed-format loading, sequence merge, AP/APH eval."""
import pickle

import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.waymo import (
    WaymoDataset,
    transform_annotations_to_kitti_format,
)
from hgsfusion_tpu.eval.waymo_eval import (
    _heading_accuracy,
    _promote_difficulty,
    waymo_evaluation,
)

SEQ = "segment-0000"


def _make_processed_tree(root, n_frames=3):
    rng = np.random.RandomState(0)
    seq_dir = root / "waymo_processed_data" / SEQ
    seq_dir.mkdir(parents=True)
    (root / "ImageSets").mkdir()
    for split in ("train", "val"):
        with open(root / "ImageSets" / f"{split}.txt", "w") as f:
            f.write(SEQ + ".tfrecord\n")
    infos = []
    for i in range(n_frames):
        pts = np.zeros((512, 6), np.float32)
        pts[:, 0] = rng.uniform(-60, 60, 512)
        pts[:, 1] = rng.uniform(-60, 60, 512)
        pts[:, 2] = rng.uniform(-2, 3, 512)
        pts[:, 3] = rng.uniform(0, 2, 512)     # intensity (tanh'd on load)
        pts[:, 5] = -1                          # NLZ flag: keep
        pts[:64, 5] = 1                         # in no-label zone: dropped
        np.save(seq_dir / ("%04d.npy" % i), pts)
        pose = np.eye(4)
        pose[0, 3] = 2.0 * i  # ego advances 2 m per frame
        boxes = np.array([
            [12.0, 1.0, 0.5, 4.6, 1.9, 1.6, 0.2, 1.0, 0.0],
            [-8.0, -4.0, 0.2, 0.8, 0.8, 1.7, 0.0, 0.0, 0.0],
        ], np.float32)
        infos.append({
            "point_cloud": {
                "num_features": 5, "lidar_sequence": SEQ, "sample_idx": i,
            },
            "frame_id": f"{SEQ}_{i:03d}",
            "metadata": {"token": i},
            "pose": pose,
            "annos": {
                "name": np.array(["Vehicle", "Pedestrian"]),
                "difficulty": np.array([0, 0]),
                "num_points_in_gt": np.array([20, 3]),
                "gt_boxes_lidar": boxes,
            },
        })
    with open(seq_dir / f"{SEQ}.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def _cfg(root, sequence=False):
    cfg = {
        "DATASET": "WaymoDataset",
        "DATA_PATH": str(root),
        "PROCESSED_DATA_TAG": "waymo_processed_data",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "FILTER_EMPTY_BOXES_FOR_TRAIN": True,
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
        "MAX_POINTS": 2048,
        "MAX_GT_BOXES": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.1, 0.1, 0.15]},
        ],
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["gt_sampling"],
            "AUG_CONFIG_LIST": [
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            ],
        },
    }
    if sequence:
        cfg["SEQUENCE_CONFIG"] = {
            "ENABLED": True, "SAMPLE_OFFSET": [-1, 0],
        }
        cfg["POINT_FEATURE_ENCODING"]["used_feature_list"].append("time")
        cfg["POINT_FEATURE_ENCODING"]["src_feature_list"].append("time")
    return ConfigDict(cfg)


class TestWaymoEval:
    def test_difficulty_promotion(self):
        d = _promote_difficulty(np.array([0, 0, 2]), np.array([10, 3, 99]))
        np.testing.assert_array_equal(d, [1, 2, 2])

    def test_heading_accuracy(self):
        assert _heading_accuracy(0.0, 0.0) == pytest.approx(1.0)
        assert _heading_accuracy(0.0, np.pi) == pytest.approx(0.0)
        assert _heading_accuracy(0.0, np.pi / 2) == pytest.approx(0.5)
        # wrap-around: 2pi == 0
        assert _heading_accuracy(0.1, 0.1 + 2 * np.pi) == pytest.approx(1.0)

    def _frame(self, boxes, names, diff=None, npts=None, score=None):
        out = {
            "name": np.asarray(names),
        }
        if score is None:
            out["gt_boxes_lidar"] = np.asarray(boxes, np.float64)
            out["difficulty"] = (np.asarray(diff) if diff is not None
                                 else np.zeros(len(names)))
            out["num_points_in_gt"] = (np.asarray(npts) if npts is not None
                                       else 10 * np.ones(len(names)))
        else:
            out["boxes_lidar"] = np.asarray(boxes, np.float64)
            out["score"] = np.asarray(score, np.float64)
        return out

    def test_perfect_predictions(self):
        box = [[10, 0, 0, 4.6, 1.9, 1.6, 0.3]]
        gt = [self._frame(box, ["Vehicle"])]
        det = [self._frame(box, ["Vehicle"], score=[0.9])]
        _, ap = waymo_evaluation(det, gt, ["Vehicle", "Pedestrian"])
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(1.0)
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
        assert np.isnan(ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1/AP"])

    def test_aph_penalizes_heading(self):
        gt = [self._frame([[10, 0, 0, 4.6, 1.9, 1.6, 0.0]], ["Vehicle"])]
        pred_box = [[10, 0, 0, 4.6, 1.9, 1.6, np.pi]]  # flipped heading
        det = [self._frame(pred_box, ["Vehicle"], score=[0.9])]
        _, ap = waymo_evaluation(det, gt, ["Vehicle"])
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(
            0.0, abs=1e-6)

    def test_false_positive_reduces_ap(self):
        # 1 TP + 1 higher-scored FP: precision at full recall is 0.5, so
        # max-interpolated AP must be 0.5 (a regression here means AP
        # weights degenerated to all-ones and FPs stopped counting).
        gt = [self._frame([[10, 0, 0, 4.6, 1.9, 1.6, 0.0]], ["Vehicle"])]
        det = [self._frame(
            [[10, 0, 0, 4.6, 1.9, 1.6, 0.0],
             [40, 20, 0, 4.6, 1.9, 1.6, 0.0]],
            ["Vehicle", "Vehicle"], score=[0.9, 0.95])]
        _, ap = waymo_evaluation(det, gt, ["Vehicle"])
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(
            0.5, abs=0.01)
        # APH at the FP is zero-weighted either way
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(
            0.5, abs=0.01)


    def test_aph_heading_weights_recall_axis(self):
        # Waymo heading-weights BOTH axes (detection_metrics.cc:
        # precision_ha = sum_ha/(tp+fp), recall_ha = sum_ha/(tp+fn)); a
        # single TP with ha=0.8 caps recall at 0.8, so APH is
        # 0.8 * 81/101 (grid points up to recall 0.8), NOT 0.8 at full
        # recall (the unweighted-recall bug this guards against).
        import numpy as np
        th = 0.2 * np.pi  # heading error -> ha = 1 - 0.2 = 0.8
        # square pedestrian box: a 36-degree rotation keeps BEV IoU ~0.73,
        # above the 0.5 pedestrian threshold, so the match survives
        gt = [self._frame([[10, 0, 0, 0.9, 0.9, 1.7, 0.0]], ["Pedestrian"])]
        det = [self._frame([[10, 0, 0, 0.9, 0.9, 1.7, th]], ["Pedestrian"],
                           score=[0.9])]
        _, ap = waymo_evaluation(det, gt, ["Pedestrian"])
        assert ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1/AP"] == \
            pytest.approx(1.0)
        assert ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1/APH"] == \
            pytest.approx(0.8 * 81 / 101, abs=1e-6)

    def test_level1_ignores_hard_gts(self):
        boxes = [[10, 0, 0, 4.6, 1.9, 1.6, 0.0],
                 [30, 0, 0, 4.6, 1.9, 1.6, 0.0]]
        gt = [self._frame(boxes, ["Vehicle", "Vehicle"],
                          npts=[20, 2])]  # second box -> LEVEL_2
        det = [self._frame([boxes[0]], ["Vehicle"], score=[0.9])]
        _, ap = waymo_evaluation(det, gt, ["Vehicle"])
        # L1: the hard gt is ignored -> perfect; L2: one of two found
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(
            0.5, abs=0.01)


class TestWaymoDataset:
    def test_pipeline(self, tmp_path):
        _make_processed_tree(tmp_path)
        ds = WaymoDataset(
            _cfg(tmp_path), ["Vehicle", "Pedestrian", "Cyclist"],
            training=True)
        assert len(ds) == 3
        sample = ds[0]
        assert sample["points"].shape == (2048, 5)
        # NLZ-flagged points dropped on load
        assert sample["points_valid"].sum() <= 448
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 2

    def test_sequence_accumulation(self, tmp_path):
        _make_processed_tree(tmp_path)
        ds = WaymoDataset(
            _cfg(tmp_path, sequence=True),
            ["Vehicle", "Pedestrian", "Cyclist"], training=False)
        info = ds.infos[1]
        pts = ds.get_lidar(SEQ, 1)
        merged, num_all, offsets, poses = ds.get_sequence_data(
            info, pts, SEQ, 1, ds.dataset_cfg.SEQUENCE_CONFIG)
        assert merged.shape[1] == 6  # + time channel
        assert num_all[0] == len(pts)
        assert len(num_all) == 2
        # past frame shifted by ego motion: its points move -2 m in x
        past = merged[num_all[0]:]
        assert past[:, 5] == pytest.approx(0.1)
        prev_pts = ds.get_lidar(SEQ, 0)
        keep = ~((np.abs(prev_pts[:, 0] - 2.0) < 1.0)
                 & (np.abs(prev_pts[:, 1]) < 1.0))
        np.testing.assert_allclose(
            past[:, 0], prev_pts[keep][:, 0] - 2.0, atol=1e-5)

    def test_eval_roundtrip_both_metrics(self, tmp_path):
        _make_processed_tree(tmp_path)
        ds = WaymoDataset(
            _cfg(tmp_path), ["Vehicle", "Pedestrian", "Cyclist"],
            training=False)
        det_annos = []
        for info in ds.infos:
            det_annos.append({
                "name": np.asarray(info["annos"]["name"]),
                "score": np.array([0.9, 0.8]),
                "boxes_lidar": np.asarray(
                    info["annos"]["gt_boxes_lidar"])[:, :7],
                "frame_id": info["frame_id"],
            })
        _, ap = ds.evaluation(
            det_annos, ["Vehicle", "Pedestrian"], eval_metric="waymo")
        assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
        # pedestrian has <=5 points -> only LEVEL_2 has gt
        assert ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == pytest.approx(
            1.0)
        res_str, ap_kitti = ds.evaluation(
            det_annos, ["Vehicle", "Pedestrian"], eval_metric="kitti")
        assert "Car" in res_str

    def test_kitti_transform_geometry(self):
        annos = [{
            "name": np.array(["Vehicle"]),
            "boxes_lidar": np.array(
                [[5.0, -2.0, 0.0, 4.0, 2.0, 1.6, 0.3]]),
            "score": np.array([0.9]),
        }]
        transform_annotations_to_kitti_format(
            annos, {"Vehicle": "Car"})
        a = annos[0]
        assert a["name"][0] == "Car"
        np.testing.assert_allclose(
            a["location"][0], [2.0, 0.8, 5.0], atol=1e-6)
        np.testing.assert_allclose(a["dimensions"][0], [4.0, 1.6, 2.0])
        assert a["rotation_y"][0] == pytest.approx(-0.3 - np.pi / 2)

    def test_gt_database(self, tmp_path):
        _make_processed_tree(tmp_path)
        ds = WaymoDataset(
            _cfg(tmp_path), ["Vehicle", "Pedestrian", "Cyclist"],
            training=True)
        db = ds.create_groundtruth_database(
            tmp_path / "waymo_processed_data" / SEQ / f"{SEQ}.pkl",
            tmp_path, split="train", sampled_interval=1)
        assert "Vehicle" in db


class TestWaymoPredBoxTrajectories:
    def test_use_predbox_roi_plumbing(self, tmp_path):
        """USE_PREDBOX: first-stage boxes load per frame, past-frame boxes
        transform into the current frame, and roi_boxes/scores/labels reach
        the prepared sample (waymo_dataset.py:94-112,265-338)."""
        import pickle

        _make_processed_tree(tmp_path)
        # first-stage predictions for all 3 frames
        pred_dicts = []
        for i in range(3):
            pred_dicts.append({
                "frame_id": f"{SEQ}_{i:03d}",
                "name": np.array(["Vehicle"]),
                "score": np.array([0.9], np.float32),
                "boxes_lidar": np.array(
                    [[12.0 + i, 1.0, 0.5, 4.6, 1.9, 1.6, 0.2, 1.0, 0.0]],
                    np.float32),
            })
        roi_path = tmp_path / "pred_boxes.pkl"
        with open(roi_path, "wb") as f:
            pickle.dump(pred_dicts, f)

        cfg = _cfg(tmp_path, sequence=True)
        cfg["USE_PREDBOX"] = True
        cfg["ROI_BOXES_PATH"] = {"train": str(roi_path),
                                 "test": str(roi_path)}
        ds = WaymoDataset(cfg, ["Vehicle", "Pedestrian", "Cyclist"],
                          training=False)
        assert SEQ in ds.pred_boxes_dict
        # speed converted to negative per-frame motion on load
        np.testing.assert_allclose(
            ds._load_pred_boxes(SEQ, 0)[0, 7:9], [-0.1, 0.0], atol=1e-6)

        sample = ds[1]
        assert "roi_boxes" in sample
        # frames = [current, prev]; ragged P padded to MAX_ROI_BOXES
        max_r = int(cfg.get("MAX_ROI_BOXES", 128))
        assert sample["roi_boxes"].shape == (2, max_r, 9)
        assert sample["roi_scores"].shape == (2, max_r)
        assert sample["roi_labels"][0, 0] == 1
        # past frame's box shifted by ego motion (-2 m in x; identity rot)
        cur_box = sample["roi_boxes"][0, 0]
        past_box = sample["roi_boxes"][1, 0]
        assert cur_box[0] == pytest.approx(13.0)
        assert past_box[0] == pytest.approx(12.0 - 2.0)

        # batches stack and survive the device/model filters (the MPPNet
        # (B, T, P, 9) contract)
        from hgsfusion_tpu.datasets.dataset import DatasetTemplate
        from hgsfusion_tpu.train.trainer import device_batch, model_inputs

        batch = DatasetTemplate.collate_batch([ds[1], ds[2]])
        assert batch["roi_boxes"].shape == (2, 2, max_r, 9)
        kept = model_inputs(device_batch(batch))
        assert "roi_boxes" in kept and "roi_scores" in kept
        assert "roi_labels" in kept


class TestEmptyPredBoxFrames:
    def test_zero_box_frames_load(self, tmp_path):
        import pickle

        _make_processed_tree(tmp_path)
        pred_dicts = [{
            "frame_id": f"{SEQ}_000",
            "name": np.zeros(0, dtype="<U10"),
            "score": np.zeros(0, np.float32),
            "boxes_lidar": np.zeros((0, 9), np.float32),
        }]
        roi_path = tmp_path / "pred_boxes.pkl"
        with open(roi_path, "wb") as f:
            pickle.dump(pred_dicts, f)
        cfg = _cfg(tmp_path)
        cfg["USE_PREDBOX"] = True
        cfg["ROI_BOXES_PATH"] = {"train": str(roi_path),
                                 "test": str(roi_path)}
        ds = WaymoDataset(cfg, ["Vehicle"], training=False)
        assert ds.pred_boxes_dict[SEQ][0].shape == (0, 11)


class TestWaymoToMPPNetIntegration:
    def test_dataset_feeds_mppnet_forward(self, tmp_path):
        """Waymo USE_PREDBOX batches satisfy the MPPNet batch contract end
        to end: per-frame points_multi + padded roi trajectories -> model
        forward."""
        import pickle

        import jax
        import jax.numpy as jnp

        from hgsfusion_tpu.datasets.dataset import DatasetTemplate
        from hgsfusion_tpu.models.detector import (
            HGSFusionConfig,
            MPPNetModel,
        )
        from hgsfusion_tpu.train.trainer import device_batch, model_inputs

        _make_processed_tree(tmp_path)
        pred_dicts = []
        for i in range(3):
            pred_dicts.append({
                "frame_id": f"{SEQ}_{i:03d}",
                "name": np.array(["Vehicle"]),
                "score": np.array([0.9], np.float32),
                "boxes_lidar": np.array(
                    [[12.0 + i, 1.0, 0.5, 4.6, 1.9, 1.6, 0.2, 1.0, 0.0]],
                    np.float32),
            })
        roi_path = tmp_path / "pred_boxes.pkl"
        with open(roi_path, "wb") as f:
            pickle.dump(pred_dicts, f)
        cfg = _cfg(tmp_path, sequence=True)
        cfg["USE_PREDBOX"] = True
        cfg["ROI_BOXES_PATH"] = {"train": str(roi_path),
                                 "test": str(roi_path)}
        cfg["MAX_ROI_BOXES"] = 8
        cfg["MAX_POINTS_PER_FRAME"] = 512
        ds = WaymoDataset(cfg, ["Vehicle"], training=False)

        batch = DatasetTemplate.collate_batch([ds[1]])
        assert batch["points_multi"].shape == (1, 2, 512, 6)
        assert batch["points_multi_valid"].shape == (1, 2, 512)
        inputs = {k: jnp.asarray(v)
                  for k, v in model_inputs(device_batch(batch)).items()}
        assert set(inputs) >= {"points_multi", "points_multi_valid",
                               "roi_boxes", "roi_scores", "roi_labels"}

        model = MPPNetModel(cfg=HGSFusionConfig(pv_num_rois=4))
        variables = model.init(jax.random.PRNGKey(0), inputs, False)
        preds = model.apply(variables, inputs, False)
        assert preds["rois"].shape == (1, 4, 7)
        assert preds["trajectory"].shape == (1, 2, 4, 7)
