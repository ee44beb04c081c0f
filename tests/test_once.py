"""ONCE family: raw-json infos, pipeline, devkit-free AP protocol."""
import json
import pickle

import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.once import ONCEDataset, create_once_infos
from hgsfusion_tpu.eval.once_eval import (
    get_evaluation_results,
    get_thresholds,
    iou3d_with_heading,
)


def _make_raw_tree(root, n_seq=1, frames_per_seq=3):
    rng = np.random.RandomState(0)
    (root / "ImageSets").mkdir(parents=True)
    seq_ids = [f"{s:06d}" for s in range(n_seq)]
    for split in ("train", "val"):
        with open(root / "ImageSets" / f"{split}.txt", "w") as f:
            f.write("\n".join(seq_ids) + "\n")
    for seq in seq_ids:
        seq_path = root / "data" / seq
        (seq_path / "lidar_roof").mkdir(parents=True)
        frames = []
        for i in range(frames_per_seq):
            frame_id = str(1616100000000 + i * 500)
            pts = np.zeros((512, 4), np.float32)
            pts[:, 0] = rng.uniform(-60, 60, 512)
            pts[:, 1] = rng.uniform(-60, 60, 512)
            pts[:, 2] = rng.uniform(-2, 3, 512)
            pts.tofile(seq_path / "lidar_roof" / f"{frame_id}.bin")
            boxes = [
                [10.0 + i, 2.0, 0.5, 4.5, 1.9, 1.6, 0.1],    # Car, 0-30m
                [40.0, 5.0, 0.5, 10.0, 2.9, 3.2, -0.2],      # Bus, 30-50m
                [55.0, -3.0, 0.0, 0.7, 0.7, 1.7, 0.0],       # Ped, 50m+
            ]
            frames.append({
                "frame_id": frame_id,
                "pose": [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
                "annos": {
                    "names": ["Car", "Bus", "Pedestrian"],
                    "boxes_3d": boxes,
                    "boxes_2d": {"cam01": [[0, 0, 10, 10]] * 3},
                },
            })
        seq_json = {
            "meta_info": {"weather": "sunny", "period": "morning"},
            "calib": {
                "cam01": {
                    "cam_to_velo": np.eye(4).tolist(),
                    "cam_intrinsic": [[500, 0, 480], [0, 500, 270],
                                      [0, 0, 1]],
                    "distortion": [0] * 5,
                },
            },
            "frames": frames,
        }
        with open(seq_path / f"{seq}.json", "w") as f:
            json.dump(seq_json, f)


def _cfg(root):
    return ConfigDict({
        "DATASET": "ONCEDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {
            "train": ["once_infos_train.pkl"],
            "val": ["once_infos_val.pkl"],
        },
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


CLASSES = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]


class TestOnceEvalCore:
    def test_iou3d_identity_and_heading_gate(self):
        box = np.array([[0, 0, 0, 4, 2, 1.6, 0.3]])
        np.testing.assert_allclose(
            iou3d_with_heading(box, box), [[1.0]], atol=1e-9)
        flipped = box.copy()
        flipped[0, 6] += np.pi  # same footprint, opposite heading
        assert iou3d_with_heading(box, flipped)[0, 0] == 0.0
        assert iou3d_with_heading(
            box, flipped, with_heading=False)[0, 0] == pytest.approx(
                1.0, abs=1e-9)

    def test_get_thresholds_recall_spacing(self):
        scores = np.linspace(0.9, 0.1, 9)
        ths = get_thresholds(scores.copy(), num_gt=9, num_pr_points=50)
        # every score lands >= 1 threshold; recall step 1/50 with 9 gts
        # duplicates thresholds at each recall crossing
        assert ths[0] == pytest.approx(0.9)
        assert len(ths) >= 9

    def test_perfect_predictions(self):
        gt = [{
            "name": np.array(["Car", "Pedestrian"]),
            "boxes_3d": np.array([
                [10, 0, 0, 4.5, 1.9, 1.6, 0.0],
                [5, 5, 0, 0.7, 0.7, 1.7, 0.0],
            ]),
        }]
        pred = [dict(gt[0], score=np.array([0.9, 0.8]))]
        ret_str, ret = get_evaluation_results(gt, pred, CLASSES)
        assert ret["AP_Vehicle/overall"] == pytest.approx(100.0)
        assert ret["AP_Pedestrian/overall"] == pytest.approx(100.0)
        assert ret["AP_Vehicle/0-30m"] == pytest.approx(100.0)
        assert "mAP" in ret_str

    def test_superclass_merges_vehicle(self):
        # a Car gt detected as Truck still scores under Vehicle
        gt = [{
            "name": np.array(["Car"]),
            "boxes_3d": np.array([[10, 0, 0, 4.5, 1.9, 1.6, 0.0]]),
        }]
        pred = [{
            "name": np.array(["Truck"]),
            "boxes_3d": np.array([[10, 0, 0, 4.5, 1.9, 1.6, 0.0]]),
            "score": np.array([0.9]),
        }]
        _, ret = get_evaluation_results(gt, pred, CLASSES)
        assert ret["AP_Vehicle/overall"] == pytest.approx(100.0)
        _, ret_plain = get_evaluation_results(
            gt, pred, CLASSES, use_superclass=False)
        assert ret_plain["AP_Car/overall"] == pytest.approx(0.0)

    def test_distance_rings_partition(self):
        gt = [{
            "name": np.array(["Car", "Car"]),
            "boxes_3d": np.array([
                [10, 0, 0, 4.5, 1.9, 1.6, 0.0],   # 0-30m
                [40, 0, 0, 4.5, 1.9, 1.6, 0.0],   # 30-50m
            ]),
        }]
        # only the near box predicted
        pred = [{
            "name": np.array(["Car"]),
            "boxes_3d": np.array([[10, 0, 0, 4.5, 1.9, 1.6, 0.0]]),
            "score": np.array([0.9]),
        }]
        _, ret = get_evaluation_results(gt, pred, CLASSES)
        assert ret["AP_Vehicle/0-30m"] == pytest.approx(100.0)
        assert ret["AP_Vehicle/30-50m"] == pytest.approx(0.0)
        assert ret["AP_Vehicle/overall"] < 100.0


class TestOnceDataset:
    def test_infos_pipeline_eval(self, tmp_path):
        _make_raw_tree(tmp_path)
        cfg = _cfg(tmp_path)
        infos = create_once_infos(
            cfg, CLASSES, tmp_path, tmp_path, splits=("train", "val"))
        assert len(infos["train"]) == 3
        info = infos["train"][0]
        assert info["annos"]["boxes_3d"].shape == (3, 7)
        assert info["annos"]["num_points_in_gt"].shape == (3,)
        assert (tmp_path / "once_infos_val.pkl").exists()

        ds = ONCEDataset(cfg, CLASSES, training=True)
        assert len(ds) == 3
        sample = ds[0]
        assert sample["points"].shape == (1024, 4)
        assert (sample["gt_boxes"][:, -1] > 0).sum() == 3

        # eval roundtrip: detections == gt saturate every difficulty cell
        # that has boxes
        val = ONCEDataset(cfg, CLASSES, training=False)
        det_annos = []
        for info in val.once_infos:
            det_annos.append({
                "name": np.asarray(info["annos"]["name"]),
                "boxes_3d": np.asarray(info["annos"]["boxes_3d"]),
                "score": 0.9 - 0.05 * np.arange(3),
                "frame_id": info["frame_id"],
            })
        ret_str, ret = val.evaluation(det_annos, CLASSES)
        assert ret["AP_Vehicle/overall"] == pytest.approx(100.0)
        assert ret["AP_Pedestrian/50m-inf"] == pytest.approx(100.0)
        assert ret["AP_mean/overall"] == pytest.approx(
            (100.0 + 100.0 + 0.0) / 3)  # no Cyclist gt -> 0 row

    def test_gt_database(self, tmp_path):
        _make_raw_tree(tmp_path)
        cfg = _cfg(tmp_path)
        create_once_infos(cfg, CLASSES, tmp_path, tmp_path,
                          splits=("train",))
        ds = ONCEDataset(cfg, CLASSES, training=True)
        db = ds.create_groundtruth_database(
            info_path=tmp_path / "once_infos_train.pkl", split="train")
        assert set(db) <= {"Car", "Bus", "Pedestrian"}
        with open(tmp_path / "once_dbinfos_train.pkl", "rb") as f:
            saved = pickle.load(f)
        assert set(saved) == set(db)


def _compute_statistics_loop(iou, pred_scores, gt_flag, pred_flag,
                             score_threshold, iou_threshold):
    """Direct transcription of the reference numba kernel
    (once_eval/evaluation.py:211-257) as a fuzz oracle."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    under = pred_scores < score_threshold
    tp = fp = fn = 0
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        det_idx = -1
        detected = False
        best_iou = 0.0
        to_ignore = False
        for j in range(num_pred):
            if pred_flag[j] == -1 or assigned[j] or under[j]:
                continue
            iou_ij = iou[i, j]
            if (iou_ij > iou_threshold
                    and (iou_ij > best_iou or to_ignore)
                    and pred_flag[j] == 0):
                best_iou, det_idx, detected, to_ignore = \
                    iou_ij, j, True, False
            elif (iou_ij > iou_threshold and not detected
                  and pred_flag[j] == 1):
                det_idx, detected, to_ignore = j, True, True
        if not detected and gt_flag[i] == 0:
            fn += 1
        elif detected and (gt_flag[i] == 1 or pred_flag[det_idx] == 1):
            assigned[det_idx] = True
        elif detected:
            tp += 1
            assigned[det_idx] = True
    for j in range(num_pred):
        if not (assigned[j] or pred_flag[j] == -1 or pred_flag[j] == 1
                or under[j]):
            fp += 1
    return tp, fp, fn


def _accumulate_scores_loop(iou, pred_scores, gt_flag, pred_flag,
                            iou_threshold):
    """Reference accumulate_scores transcription (evaluation.py:177-208)."""
    num_gt, num_pred = iou.shape
    assigned = np.zeros(num_pred, bool)
    accum = []
    for i in range(num_gt):
        if gt_flag[i] == -1:
            continue
        det_idx, det_score = -1, -1.0
        for j in range(num_pred):
            if pred_flag[j] == -1 or assigned[j]:
                continue
            if iou[i, j] > iou_threshold and pred_scores[j] > det_score:
                det_idx, det_score = j, pred_scores[j]
        if det_score == -1.0:
            continue
        if gt_flag[i] == 1 or pred_flag[det_idx] == 1:
            assigned[det_idx] = True
        else:
            accum.append(pred_scores[det_idx])
            assigned[det_idx] = True
    return np.asarray(accum, np.float64)


class TestOnceMatcherFuzz:
    def test_vectorized_matches_reference_loops(self):
        from hgsfusion_tpu.eval.once_eval import (
            accumulate_scores,
            compute_statistics,
        )

        rng = np.random.RandomState(7)
        for trial in range(200):
            ng = rng.randint(0, 8)
            npd = rng.randint(0, 10)
            iou = rng.rand(ng, npd)
            # quantize IoUs to force plenty of exact ties
            iou = np.round(iou * 4) / 4
            scores = np.round(rng.rand(npd) * 4) / 4
            gt_flag = rng.choice([-1, 0, 1], ng)
            pred_flag = rng.choice([-1, 0, 1], npd)
            th = rng.choice([0.2, 0.5])
            s_th = rng.choice([0.0, 0.4])
            assert compute_statistics(
                iou, scores, gt_flag, pred_flag, s_th, th
            ) == _compute_statistics_loop(
                iou, scores, gt_flag, pred_flag, s_th, th), trial
            np.testing.assert_array_equal(
                accumulate_scores(iou, scores, gt_flag, pred_flag, th),
                _accumulate_scores_loop(iou, scores, gt_flag, pred_flag,
                                        th), err_msg=str(trial))
