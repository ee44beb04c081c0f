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
