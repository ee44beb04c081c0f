import numpy as np
import pytest

from hgsfusion_tpu.datasets.database_sampler import (
    DataBaseSampler,
    create_groundtruth_database,
)
from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti
from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.datasets.vod import VODDataset
import sys

sys.path.insert(0, "tests")
from test_datasets import _small_vod_cfg


@pytest.fixture(scope="module")
def db_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vod_db")
    make_synthetic_kitti(root, num_frames=3, num_points=512)
    cfg = _small_vod_cfg(root, with_images=False)
    ds = VODDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist"],
                    training=False)
    ds.create_infos(splits=("train", "val"))
    ds.load_infos()
    create_groundtruth_database(ds, split="train")
    return root, ds


class TestGtDatabase:
    def test_database_created(self, db_root):
        root, ds = db_root
        assert (root / "kitti_dbinfos_train.pkl").exists()
        import pickle

        with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
            infos = pickle.load(f)
        assert len(infos) > 0
        some = next(iter(infos.values()))[0]
        assert (root / some["path"]).exists()
        assert some["box3d_lidar"].shape == (7,)

    def test_sampler_adds_boxes(self, db_root):
        root, ds = db_root
        sampler = DataBaseSampler(
            root,
            {
                "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                "PREPARE": {"filter_by_min_points": ["Car:1"]},
                "SAMPLE_GROUPS": ["Car:10", "Pedestrian:10"],
                "NUM_POINT_FEATURES": 7,
                "LIMIT_WHOLE_SCENE": True,
            },
            class_names=["Car", "Pedestrian", "Cyclist"],
        )
        np.random.seed(0)
        pts = np.zeros((100, 7), np.float32)
        pts[:, 0] = np.linspace(5, 40, 100)
        data = {
            "points": pts,
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U16"),
            "gt_boxes_mask": np.zeros(0, bool),
        }
        out = sampler(data)
        assert len(out["gt_boxes"]) > 0
        assert out["points"].shape[1] == 7
        assert len(out["gt_names"]) == len(out["gt_boxes"])
        # sampled boxes should not overlap each other in BEV
        from hgsfusion_tpu.utils.box_utils import boxes3d_nearest_bev_iou

        iou = boxes3d_nearest_bev_iou(out["gt_boxes"], out["gt_boxes"])
        off_diag = np.asarray(iou) - np.eye(len(out["gt_boxes"]))
        assert off_diag.max() <= 1e-6

    def test_sampler_keeps_boxes2d_aligned(self, db_root):
        """When the frame carries gt_boxes2d, sampling must pad it in step
        with gt_boxes so the augmentor's final mask application doesn't
        desync (sampled db objects have no 2D boxes -> zero rows)."""
        root, ds = db_root
        sampler = DataBaseSampler(
            root,
            {
                "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                "PREPARE": {"filter_by_min_points": ["Car:1"]},
                "SAMPLE_GROUPS": ["Car:10"],
                "NUM_POINT_FEATURES": 7,
                "LIMIT_WHOLE_SCENE": True,
            },
            class_names=["Car", "Pedestrian", "Cyclist"],
        )
        np.random.seed(0)
        pts = np.zeros((100, 7), np.float32)
        pts[:, 0] = np.linspace(5, 40, 100)
        gt = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0]], np.float32)
        out = sampler({
            "points": pts,
            "gt_boxes": gt,
            "gt_names": np.array(["Car"], dtype="<U16"),
            "gt_boxes_mask": np.ones(1, bool),
            "gt_boxes2d": np.array([[1.0, 2.0, 3.0, 4.0]], np.float32),
        })
        assert len(out["gt_boxes2d"]) == len(out["gt_boxes"])
        assert len(out["gt_boxes_mask"]) == len(out["gt_boxes"])
        np.testing.assert_allclose(out["gt_boxes2d"][0], [1, 2, 3, 4])
        np.testing.assert_allclose(out["gt_boxes2d"][1:], 0.0)


class TestRoadPlaneSampling:
    def test_sampled_boxes_lifted_onto_plane(self, tmp_path):
        """USE_ROAD_PLANE drops sampled boxes (and their point crops) onto
        the road plane (database_sampler.put_boxes_on_road_planes:150-168)."""
        import pickle

        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.datasets.database_sampler import DataBaseSampler
        from hgsfusion_tpu.utils.calibration import Calibration

        db_dir = tmp_path / "gt_database"
        db_dir.mkdir()
        box = np.array([10.0, 0.0, 1.0, 4.0, 2.0, 1.6, 0.0], np.float32)
        crop = np.array([[0.2, 0.1, 0.3, 1.0]], np.float32)
        crop.tofile(db_dir / "0_Car_0.bin")
        with open(tmp_path / "dbinfos.pkl", "wb") as f:
            pickle.dump({"Car": [{
                "name": "Car", "path": "gt_database/0_Car_0.bin",
                "box3d_lidar": box, "num_points_in_gt": 1,
            }]}, f)

        sampler = DataBaseSampler(
            tmp_path,
            ConfigDict({
                "DB_INFO_PATH": ["dbinfos.pkl"],
                "SAMPLE_GROUPS": ["Car:1"],
                "NUM_POINT_FEATURES": 4,
                "USE_ROAD_PLANE": True,
                "LIMIT_WHOLE_SCENE": False,
            }),
            ["Car"],
        )
        calib = Calibration({
            "P2": np.array([[700.0, 0, 480, 0], [0, 700, 250, 0],
                            [0, 0, 1, 0]]),
            "R0": np.eye(3),
            "Tr_velo2cam": np.array(
                [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64),
        })
        # camera-frame plane y = 2  <=>  lidar z = -2 (y_cam = -z_lidar)
        d = sampler({
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.zeros(0, dtype="<U8"),
            "points": np.zeros((0, 4), np.float32),
            "road_plane": [0.0, 1.0, 0.0, -2.0],
            "calib": calib,
        })
        # bottom of the sampled box sits on z = -2: center z = -2 + 0.8
        assert d["gt_boxes"][0, 2] == pytest.approx(-1.2, abs=1e-5)
        # the crop moved by the same height
        mv = 1.0 - 1.6 / 2 - (-2.0)
        assert d["points"][0, 2] == pytest.approx(
            box[2] + crop[0, 2] - mv, abs=1e-5)
