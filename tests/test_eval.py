import numpy as np

from hgsfusion_tpu.eval.kitti_ap import (
    get_thresholds,
    image_box_overlap,
    d3_box_overlap,
)
from hgsfusion_tpu.eval.rotated_iou_np import rotate_iou_eval
from hgsfusion_tpu.eval.vod_eval import vod_official_eval
from hgsfusion_tpu.eval.tj4d_eval import tj4d_official_eval


def _make_anno(names, locs, dims, rots, bboxes, scores=None):
    n = len(names)
    anno = {
        "name": np.array(names),
        "location": np.asarray(locs, np.float64).reshape(n, 3),
        "dimensions": np.asarray(dims, np.float64).reshape(n, 3),
        "rotation_y": np.asarray(rots, np.float64).reshape(n),
        "bbox": np.asarray(bboxes, np.float64).reshape(n, 4),
        "alpha": np.zeros(n),
        "occluded": np.zeros(n),
        "truncated": np.zeros(n),
        "difficulty": np.zeros(n, np.int32),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    return anno


def _perfect_frames(num_frames=15, cls="Car"):
    # >= 41 gts in total so all 41 recall sample points are reachable
    # (with fewer gts the reference leaves trailing precision slots at 0,
    # capping AP_R40 below 100 even for perfect predictions)
    gt, dt = [], []
    rng = np.random.RandomState(0)
    for _ in range(num_frames):
        n = 3
        locs = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(1.0, 1.8, n), rng.uniform(5, 20, n)],
            axis=1,
        )
        dims = np.tile([3.9, 1.56, 1.6], (n, 1))  # camera (l, h, w)
        rots = rng.uniform(-np.pi, np.pi, n)
        bboxes = np.stack(
            [100 * np.arange(n), np.zeros(n), 100 * np.arange(n) + 90,
             np.full(n, 90.0)], axis=1,
        )
        gt.append(_make_anno([cls] * n, locs, dims, rots, bboxes))
        dt.append(
            _make_anno([cls] * n, locs, dims, rots, bboxes, scores=np.full(n, 0.9))
        )
    return gt, dt


class TestPrimitives:
    def test_rotate_iou_identity(self):
        b = np.array([[0.0, 0.0, 2.0, 1.0, 0.5]])
        np.testing.assert_allclose(rotate_iou_eval(b, b), [[1.0]], atol=1e-6)

    def test_rotate_iou_criterion(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        np.testing.assert_allclose(rotate_iou_eval(a, b, -1), [[2 / 6]], atol=1e-6)
        np.testing.assert_allclose(rotate_iou_eval(a, b, 0), [[0.5]], atol=1e-6)
        np.testing.assert_allclose(rotate_iou_eval(a, b, 2), [[2.0]], atol=1e-6)

    def test_d3_overlap_height(self):
        # camera coords: y downward, box spans [y-h, y]
        a = np.array([[0.0, 1.0, 10.0, 2.0, 2.0, 2.0, 0.0]])
        b = np.array([[0.0, 2.0, 10.0, 2.0, 2.0, 2.0, 0.0]])
        # bev inter = 4; height overlap = min(1,2)-max(-1,0) = 1; vol 8+8-4
        np.testing.assert_allclose(d3_box_overlap(a, b), [[4 / 12]], atol=1e-5)

    def test_get_thresholds_count(self):
        scores = np.linspace(0.9, 0.1, 50)
        th = get_thresholds(scores.copy(), num_gt=50)
        assert 30 <= len(th) <= 41
        assert np.all(np.diff(th) <= 0)

    def test_image_overlap(self):
        a = np.array([[0, 0, 10, 10.0]])
        b = np.array([[5, 0, 15, 10.0]])
        np.testing.assert_allclose(image_box_overlap(a, b), [[50 / 150]], atol=1e-6)


class TestVoDEval:
    def test_perfect_predictions_ap100(self):
        gt, dt = _perfect_frames()
        _, res = vod_official_eval(gt, dt)
        assert res["entire_area/Car_3d_all"] > 99.0
        assert res["entire_area/Car_bev_all"] > 99.0
        # ROI only counts |x|<4, z<25 which our boxes satisfy
        assert res["roi/Car_3d_all"] > 99.0

    def test_no_detections_ap0(self):
        gt, _ = _perfect_frames()
        dt = [
            _make_anno([], np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0),
                       np.zeros((0, 4)), scores=np.zeros(0))
            for _ in gt
        ]
        _, res = vod_official_eval(gt, dt)
        assert res["entire_area/Car_3d_all"] == 0.0

    def test_shifted_predictions_lower_ap(self):
        gt, dt = _perfect_frames()
        for d in dt:
            d["location"] = d["location"] + np.array([0.8, 0.0, 0.8])
        _, res = vod_official_eval(gt, dt)
        assert res["entire_area/Car_3d_all"] < 99.0

    def test_roi_filters_far_objects(self):
        # all gts at z=40 (outside the 25 m corridor): counted in the entire
        # area, ignored in the ROI -> ROI AP undefined/0
        gt, dt = _perfect_frames()
        for g, d in zip(gt, dt):
            g["location"][:, 2] = 40.0
            d["location"][:, 2] = 40.0
        _, res = vod_official_eval(gt, dt)
        assert res["entire_area/Car_3d_all"] > 99.0
        assert res["roi/Car_3d_all"] == 0.0  # no valid gt in corridor


class TestTJ4DEval:
    def test_perfect_predictions(self):
        gt, dt = _perfect_frames(cls="Truck")
        _, res = tj4d_official_eval(gt, dt)
        assert res["KITTI/Truck_3D_hard_strict"] > 99.0
        assert res["KITTI/Overall_3D_hard"] > 24.0  # 1 of 4 classes present

    def test_range_difficulty_split(self):
        # per frame: one near gt (easy bucket) + one far gt (50-70m bucket);
        # detections only find the near ones. 45 frames so the 41 recall
        # sample points are reachable in the easy bucket.
        gt = [
            _make_anno(
                ["Car", "Car"],
                [[0, 1.5, 20.0], [0, 1.5, 60.0]],
                [[3.9, 1.56, 1.6]] * 2, [0.0, 0.0],
                [[0, 0, 90, 90], [100, 0, 190, 90]],
            )
            for _ in range(45)
        ]
        dt = [
            _make_anno(["Car"], [[0, 1.5, 20.0]], [[3.9, 1.56, 1.6]], [0.0],
                       [[0, 0, 90, 90]], scores=[0.9])
            for _ in range(45)
        ]
        _, res = tj4d_official_eval(gt, dt)
        # easy: only the near gts count -> perfect
        assert res["KITTI/Car_3D_easy_strict"] > 99.0
        # hard: far gts all missed -> recall capped at 0.5
        assert res["KITTI/Car_3D_hard_strict"] < 60.0


class TestTJ4DWeatherSplits:
    def test_weather_split_eval(self, tmp_path):
        """Weather-split evaluation partitions frames by sequence id."""
        from hgsfusion_tpu.datasets.tj4d import TJ4DDataset, WEATHER_FILTER
        from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti
        import sys
        sys.path.insert(0, "tests")
        from test_datasets import _small_vod_cfg

        root = tmp_path / "tj4d"
        make_synthetic_kitti(root, num_frames=3, radar_channels=8,
                             image_ext=".png")
        cfg = _small_vod_cfg(root, with_images=False)
        cfg["DATASET"] = "TJ4DDataset"
        cfg["USE_VIRTUAL_POINTS"] = False
        cfg["FILTER_BY_WEATHER"] = True
        feats = ["x", "y", "z", "V_r", "Range", "Power", "Alpha", "Beta"]
        cfg["POINT_FEATURE_ENCODING"] = {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": feats, "src_feature_list": feats,
        }
        ds = TJ4DDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist",
                                           "Truck"], training=False)
        ds.create_infos(splits=("train", "val"))
        ds.load_infos()
        gt_annos = [info["annos"] for info in ds.infos]
        det_annos = []
        for g in gt_annos:
            d = {k: np.asarray(v).copy() for k, v in g.items()}
            d["score"] = np.ones(len(g["name"]))
            det_annos.append(d)
        s, res = ds.evaluation(det_annos, ds.class_names)
        # frames are 000xx -> sequence 0 -> the 'dark' group
        assert any(k.startswith("dark/") for k in res)
        assert "== weather: dark ==" in s
