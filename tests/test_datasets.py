import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict, load_config, model_config_from_yaml
from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti
from hgsfusion_tpu.datasets.vod import VODDataset
from hgsfusion_tpu.datasets.dataset import DatasetTemplate


def _small_vod_cfg(root, with_images=True):
    items = ["points"]
    if with_images:
        items += ["images", "calib_matricies", "gt_boxes2d"]
    feats = ["x", "y", "z", "rcs", "v_r", "v_r_comp", "time"] + [
        f"label{i}" for i in range(1, 9)
    ] + ["idf1", "idf2"]
    return ConfigDict(
        {
            "DATASET": "VODDataset",
            "DATA_PATH": str(root),
            "POINT_CLOUD_RANGE": [0, -25.6, -3, 51.2, 25.6, 2],
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {
                "train": ["kitti_infos_train.pkl"],
                "test": ["kitti_infos_val.pkl"],
            },
            "GET_ITEM_LIST": items,
            "FOV_POINTS_ONLY": True,
            "USE_VIRTUAL_POINTS": True,
            "VIRTUAL_POINT_PREFIX": "virtual_points",
            "MAX_POINTS": 1024,
            "MAX_GT_BOXES": 16,
            "IMAGE_SIZE": [128, 256],
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": feats,
                "src_feature_list": feats,
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
                {"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.16, 0.16, 0.16]},
                {"NAME": "shuffle_points",
                 "SHUFFLE_ENABLED": {"train": True, "test": False}},
            ],
            "DATA_AUGMENTOR": {
                "DISABLE_AUG_LIST": ["gt_sampling"],
                "AUG_CONFIG_LIST": [
                    {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                    {"NAME": "random_image_flip_fusion",
                     "ALONG_AXIS_LIST": ["horizontal"]},
                    {"NAME": "random_world_rotation",
                     "WORLD_ROT_ANGLE": [-0.3926, 0.3926]},
                    {"NAME": "random_world_scaling",
                     "WORLD_SCALE_RANGE": [0.95, 1.05]},
                ],
            },
        }
    )


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vod_synth")
    make_synthetic_kitti(root, num_frames=3)
    return root


def _make_dataset(root, training, with_images=True):
    cfg = _small_vod_cfg(root, with_images)
    ds = VODDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist"],
                    training=training)
    if not ds.infos:
        ds.create_infos(splits=("train", "val"))
        ds.load_infos()
    return ds


class TestSyntheticPipeline:
    def test_infos_and_getitem_train(self, synthetic_root):
        np.random.seed(0)
        ds = _make_dataset(synthetic_root, training=True)
        assert len(ds) == 3
        item = ds[0]
        assert item["points"].shape == (1024, 17)
        assert item["points_valid"].shape == (1024,)
        assert item["points_valid"].sum() > 0
        assert item["gt_boxes"].shape == (16, 8)
        assert item["gt_boxes"][:, -1].max() >= 1
        assert item["images"].shape == (128, 256, 3)
        assert item["trans_lidar_to_cam"].shape == (4, 4)
        assert item["trans_cam_to_img"].shape == (3, 4)
        assert item["lidar_aug_matrix"].shape == (4, 4)
        # indicator flags present: both raw-real (1) and virtual (0) idf1
        valid_pts = item["points"][item["points_valid"]]
        assert set(np.unique(valid_pts[:, 15])) <= {0.0, 1.0}

    def test_getitem_eval_and_collate(self, synthetic_root):
        ds = _make_dataset(synthetic_root, training=False)
        batch = DatasetTemplate.collate_batch([ds[0], ds[1]])
        assert batch["points"].shape == (2, 1024, 17)
        assert batch["images"].shape == (2, 128, 256, 3)
        assert batch["batch_size"] == 2
        assert len(batch["frame_id"]) == 2

    def test_aug_matrix_consistency_no_flip(self, synthetic_root):
        """Without a flip, lidar_aug_matrix maps un-augmented gt centers to
        the augmented ones (this is what BEV_AUG inverts in the frustum grid).
        With a flip, the reference additionally re-maps boxes through image
        space (random_image_flip_fusion), intentionally breaking this
        invariant — see test_flip_image_remap_quirk."""
        ds = _make_dataset(synthetic_root, training=True)
        for seed in range(20):
            np.random.seed(seed)
            raw = ds.compose_input_dict(0)
            raw_centers = raw["gt_boxes"][:, :3].copy()
            np.random.seed(seed)
            item_dict = ds.prepare_data(ds.compose_input_dict(0))
            if item_dict is None or item_dict.get("flip_x", False):
                continue
            m = item_dict["lidar_aug_matrix"]
            aug_centers = item_dict["gt_boxes"][:, :3]
            if len(aug_centers) != len(raw_centers):
                continue  # a box was dropped by the range mask
            mapped = (m[:3, :3] @ raw_centers.T).T + m[:3, 3]
            np.testing.assert_allclose(mapped, aug_centers, atol=1e-4)
            return
        raise AssertionError("no flip-free augmentation draw in 20 seeds")

    def test_flip_image_remap_quirk(self, synthetic_root):
        """Reference parity: when flip_x fires, random_image_flip_fusion maps
        the already-flipped boxes through image space, landing them ~back at
        their ORIGINAL y (verified against the reference's own calibration
        code; augmentor_utils.py:137-146). Points stay flipped."""
        ds = _make_dataset(synthetic_root, training=True)
        raw = ds.compose_input_dict(0)
        raw_y = raw["gt_boxes"][:, 1].copy()
        for seed in range(20):
            np.random.seed(seed)
            d = ds.compose_input_dict(0)
            mask = np.ones(len(d["gt_boxes"]), bool)
            out = ds.data_augmentor.queue[0][0](d, ds.data_augmentor.queue[0][1])
            if not out["flip_x"]:
                continue
            out = ds.data_augmentor.queue[1][0](out, ds.data_augmentor.queue[1][1])
            # boxes ~back at original y (small offset from camera extrinsics)
            np.testing.assert_allclose(out["gt_boxes"][:, 1], raw_y, atol=0.8)
            return
        raise AssertionError("flip never fired in 20 seeds")

    def test_support_range_unity_is_byte_identical(self, tmp_path):
        """support_range=(1,1) must reproduce the default structured tree
        byte-for-byte (the knob's rng is a separate stream and a factor of
        1.0 keeps every per-box index set / blob value intact), so enabling
        the hard-val machinery can never perturb existing fixtures."""
        kw = dict(num_frames=2, num_points=128, num_virtual=32,
                  structured=True, seed=3)
        a = make_synthetic_kitti(tmp_path / "a", **kw)
        b = make_synthetic_kitti(tmp_path / "b", support_range=(1.0, 1.0),
                                 **kw)
        for rel in ("velodyne/00000.bin", "velodyne/00001.bin",
                    "image_2/00000.jpg", "virtual_points/00000.pkl.npy",
                    "label_2/00001.txt"):
            pa = (a / "training" / rel).read_bytes()
            pb = (b / "training" / rel).read_bytes()
            assert pa == pb, rel

    def test_support_range_low_cuts_in_box_points(self, tmp_path):
        """A tiny support factor must strip most in-box returns (the rcs
        signature col 3 >= 3.0 marks object points) while leaving labels,
        i.e. produce hard positives rather than fewer gts."""
        kw = dict(num_frames=4, num_points=256, num_virtual=64,
                  structured=True, seed=5)
        full = make_synthetic_kitti(tmp_path / "full", **kw)
        weak = make_synthetic_kitti(tmp_path / "weak",
                                    support_range=(0.02, 0.05), **kw)

        def n_obj_points(root):
            n = 0
            for f in sorted((root / "training" / "velodyne").glob("*.bin")):
                pts = np.fromfile(f, np.float32).reshape(-1, 7)
                n += int((pts[:, 3] >= 3.0).sum())
            return n

        assert n_obj_points(weak) < 0.2 * n_obj_points(full)
        la = (full / "training" / "label_2" / "00000.txt").read_text()
        lb = (weak / "training" / "label_2" / "00000.txt").read_text()
        assert len(la.splitlines()) == len(lb.splitlines())


class TestConfig:
    def test_load_vod_yaml(self):
        cfg = load_config("/root/repo/configs/hgsfusion_vod.yaml")
        assert cfg.CLASS_NAMES == ["Car", "Pedestrian", "Cyclist"]
        assert cfg.DATA_CONFIG.DATASET == "VODDataset"  # from base config
        assert cfg.MODEL.DENSE_HEAD.NAME == "AnchorHeadSingle"
        mc = model_config_from_yaml(cfg)
        assert mc.grid_size == (320, 320, 31)
        assert mc.num_anchors_per_location == 6
        assert mc.reader_num_input == 29
        assert mc.aspp_dilation == 6

    def test_load_tj4d_yaml(self):
        cfg = load_config("/root/repo/configs/hgsfusion_tj4d.yaml")
        mc = model_config_from_yaml(cfg)
        assert mc.grid_size == (216, 248, 19)
        assert mc.reader_num_input == 31
        assert mc.aspp_dilation == 3
        assert mc.num_class == 4
        assert mc.num_anchors_per_location == 8


class TestKittiFamily:
    def test_kitti_dataset_and_eval(self, tmp_path):
        from hgsfusion_tpu.datasets.kitti import KittiDataset
        from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti

        root = tmp_path / "kitti"
        make_synthetic_kitti(root, num_frames=2, radar_channels=4,
                             image_ext=".png", num_points=256)
        cfg = _small_vod_cfg(root, with_images=False)
        cfg["DATASET"] = "KittiDataset"
        cfg["USE_VIRTUAL_POINTS"] = False
        feats = ["x", "y", "z", "intensity"]
        cfg["POINT_FEATURE_ENCODING"] = {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": feats, "src_feature_list": feats,
        }
        ds = KittiDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist"],
                          training=False)
        ds.create_infos(splits=("train", "val"))
        ds.load_infos()
        assert len(ds) == 2
        item = ds[0]
        assert item["points"].shape[1] == 4
        # eval smoke: use gt as perfect detections
        gt_annos = [info["annos"] for info in ds.infos]
        det_annos = []
        for g in gt_annos:
            d = {k: np.asarray(v).copy() for k, v in g.items()}
            d["score"] = np.ones(len(g["name"]))
            det_annos.append(d)
        s, res = ds.evaluation(det_annos, ds.class_names)
        assert "Car_3d/moderate_R40" in res


class TestRegistry:
    def test_build_network(self):
        from hgsfusion_tpu.config import ConfigDict
        from hgsfusion_tpu.models.detector import HGSFusionConfig
        from hgsfusion_tpu.models.registry import build_network, DETECTORS

        cfg = ConfigDict({"MODEL": {"NAME": "CaDDN"}})
        model = build_network(cfg, HGSFusionConfig())
        assert type(model).__name__ == "HGSFusionModel"
        assert "PillarNet" in DETECTORS


class TestVelocityAugmentation:
    """9-dim gt boxes (with vx, vy): flip/rotation/scaling must transform
    the velocity columns (augmentor_utils.py:23,44,64-67,88-89)."""

    def _aug(self, name, **cfg_kw):
        from hgsfusion_tpu.datasets.augmentor import DataAugmentor

        cfg = ConfigDict({
            "DISABLE_AUG_LIST": [],
            "AUG_CONFIG_LIST": [dict(NAME=name, **cfg_kw)],
        })
        return DataAugmentor(None, cfg, ["car"])

    def test_flip_x_negates_vy(self):
        aug = self._aug("random_world_flip", ALONG_AXIS_LIST=["x"])
        gt = np.array([[5, 2, 0, 4, 2, 1.6, 0.3, 1.5, -2.5]], np.float32)
        pts = np.zeros((4, 3), np.float32)
        np.random.seed(0)
        for _ in range(20):
            d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                             "gt_names": np.array(["car"])})
            if d["flip_x"]:
                np.testing.assert_allclose(d["gt_boxes"][0, 7:9],
                                           [1.5, 2.5])
                break
        else:
            raise AssertionError("flip never enabled in 20 draws")

    def test_rotation_rotates_velocity(self):
        aug = self._aug("random_world_rotation",
                        WORLD_ROT_ANGLE=[0.5, 0.5])
        gt = np.array([[5, 2, 0, 4, 2, 1.6, 0.0, 2.0, 0.0]], np.float32)
        pts = np.zeros((4, 3), np.float32)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        c, s = np.cos(0.5), np.sin(0.5)
        np.testing.assert_allclose(
            d["gt_boxes"][0, 7:9], [2 * c, 2 * s], atol=1e-5)

    def test_scaling_scales_velocity(self):
        aug = self._aug("random_world_scaling",
                        WORLD_SCALE_RANGE=[1.1, 1.1 + 2e-3])
        gt = np.array([[5, 2, 0, 4, 2, 1.6, 0.0, 2.0, -1.0]], np.float32)
        pts = np.zeros((4, 4), np.float32)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        np.testing.assert_allclose(
            d["gt_boxes"][0, 7:9], [2.0 * 1.1, -1.0 * 1.1], rtol=2e-3)

    def test_7dof_boxes_untouched(self):
        aug = self._aug("random_world_flip", ALONG_AXIS_LIST=["x"])
        gt = np.array([[5, 2, 0, 4, 2, 1.6, 0.3]], np.float32)
        pts = np.zeros((4, 3), np.float32)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        assert d["gt_boxes"].shape == (1, 7)


class TestDepthMapPipeline:
    def test_depth_maps_load_downsample_collate(self, tmp_path):
        """USE_DEPTH supervision path: depth_2 png -> /256 scale ->
        local-mean downsample -> static pad -> stacked batch
        (vod_dataset.get_depth_map:142-155 +
        data_processor.downsample_depth_map:225-234)."""
        from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti
        from hgsfusion_tpu.datasets.vod import VODDataset

        root = tmp_path / "vod_depth"
        make_synthetic_kitti(root, num_frames=2, image_hw=(128, 256))
        cfg = _small_vod_cfg(root, with_images=True)
        cfg["GET_ITEM_LIST"] = [
            "points", "images", "depth_maps", "calib_matricies",
            "gt_boxes2d",
        ]
        cfg["DATA_PROCESSOR"].append(
            {"NAME": "downsample_depth_map", "DOWNSAMPLE_FACTOR": 4})
        ds = VODDataset(cfg, ["Car", "Pedestrian", "Cyclist"],
                        training=False)
        ds.create_infos(splits=("train", "val"))
        ds.load_infos()
        sample = ds[0]
        assert sample["depth_maps"].shape == (128 // 4, 256 // 4)
        # depth values preserved through png roundtrip + block mean
        assert 0.5 < sample["depth_maps"].mean() < 60.0

        batch = DatasetTemplate.collate_batch([ds[0], ds[1]])
        assert batch["depth_maps"].shape == (2, 32, 64)

        # raw loader parity: /256 png scale
        raw = ds.get_depth_map(ds.infos[0]["point_cloud"]["lidar_idx"])
        assert raw.shape == (128, 256)
        assert 1.0 <= raw.mean() <= 50.0


class TestProcessorSteps:
    def test_transform_points_to_voxels(self):
        from hgsfusion_tpu.datasets.processor import DataProcessor

        cfg = [{"NAME": "transform_points_to_voxels",
                "VOXEL_SIZE": [1.0, 1.0, 1.0],
                "MAX_POINTS_PER_VOXEL": 3,
                "MAX_NUMBER_OF_VOXELS": {"train": 100, "test": 100}}]
        proc = DataProcessor(cfg, [0, 0, 0, 4, 4, 4], training=True,
                             num_point_features=4)
        pts = np.array([
            [0.5, 0.5, 0.5, 1.0],   # voxel (0,0,0)
            [0.6, 0.4, 0.2, 2.0],   # same voxel
            [1.5, 0.5, 0.5, 3.0],   # voxel (0,0,1)
            [0.7, 0.3, 0.1, 4.0],   # voxel (0,0,0) again
            [0.8, 0.2, 0.3, 5.0],   # voxel (0,0,0): exceeds max 3 -> dropped
            [9.0, 9.0, 9.0, 6.0],   # out of range -> dropped
        ], np.float32)
        d = proc.forward({"points": pts, "use_lead_xyz": True})
        assert d["voxels"].shape == (2, 3, 4)
        # voxel 0 = first-appearance (0,0,0) with 3 of its 4 points kept
        np.testing.assert_array_equal(d["voxel_num_points"], [3, 1])
        np.testing.assert_array_equal(d["voxel_coords"][0], [0, 0, 0])
        np.testing.assert_array_equal(d["voxel_coords"][1], [0, 0, 1])
        np.testing.assert_allclose(
            d["voxels"][0, :, 3], [1.0, 2.0, 4.0])
        np.testing.assert_allclose(d["voxels"][1, 0, 3], 3.0)
        # zero-padding beyond num_points
        np.testing.assert_allclose(d["voxels"][1, 1:], 0.0)

    def test_image_normalize_and_calibrate(self):
        from hgsfusion_tpu.datasets.processor import DataProcessor

        cfg = [
            {"NAME": "image_normalize",
             "mean": [0.2, 0.2, 0.2], "std": [0.25, 0.25, 0.25]},
            {"NAME": "image_calibrate"},
        ]
        proc = DataProcessor(cfg, [0, 0, 0, 4, 4, 4], training=False,
                             num_point_features=4)
        imgs = np.full((2, 8, 10, 3), 51, np.uint8)  # 51/255 == mean 0.2
        d = proc.forward({
            "points": np.zeros((1, 4), np.float32),
            "camera_imgs": imgs,
            "img_process_infos": [
                [0.5, (4, 2, 20, 10), False, 0],
                [1.0, (0, 0, 16, 8), True, 0],
            ],
        })
        np.testing.assert_allclose(d["camera_imgs"], 0.0, atol=1e-6)
        m = d["img_aug_matrix"]
        assert m.shape == (2, 4, 4)
        # first cam: scale 0.5 then crop translate (-4, -2)
        np.testing.assert_allclose(m[0, :2, :2], 0.5 * np.eye(2))
        np.testing.assert_allclose(m[0, :2, 3], [-4, -2])
        # second cam: horizontal flip about the crop width
        np.testing.assert_allclose(m[1, 0, 0], -1.0)
        np.testing.assert_allclose(m[1, 0, 3], 16.0)


class TestExtendedAugmentors:
    def _aug(self, name, **cfg_kw):
        from hgsfusion_tpu.datasets.augmentor import DataAugmentor

        cfg = ConfigDict({"DISABLE_AUG_LIST": [],
                          "AUG_CONFIG_LIST": [dict(NAME=name, **cfg_kw)]})
        return DataAugmentor(None, cfg, ["car"])

    def _data(self):
        gt = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0]], np.float32)
        pts = np.array([
            [5.0, 0.0, 0.0, 1.0],    # inside the box
            [20.0, 5.0, 0.5, 2.0],   # outside
        ], np.float32)
        return gt, pts

    def test_world_translation_shifts_everything(self):
        aug = self._aug("random_world_translation",
                        NOISE_TRANSLATE_STD=[1.0, 1.0, 0.1])
        gt, pts = self._data()
        np.random.seed(3)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        noise = d["noise_translate"]
        np.testing.assert_allclose(d["gt_boxes"][0, :3], gt[0, :3] + noise,
                                   atol=1e-6)
        np.testing.assert_allclose(d["points"][:, :3], pts[:, :3] + noise,
                                   atol=1e-6)

    def test_local_translation_only_moves_box_points(self):
        aug = self._aug("random_local_translation",
                        LOCAL_TRANSLATION_RANGE=[1.0, 1.0],
                        ALONG_AXIS_LIST=["x"])
        gt, pts = self._data()
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        assert d["gt_boxes"][0, 0] == pytest.approx(6.0)
        assert d["points"][0, 0] == pytest.approx(6.0)   # in-box moved
        assert d["points"][1, 0] == pytest.approx(20.0)  # outside untouched

    def test_local_scaling_scales_in_box_points(self):
        aug = self._aug("random_local_scaling",
                        LOCAL_SCALE_RANGE=[2.0, 2.0 + 2e-3])
        gt, pts = self._data()
        pts[0] = [6.0, 0.5, 0.2, 1.0]  # offset from center
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        np.testing.assert_allclose(d["gt_boxes"][0, 3:6],
                                   [8.0, 4.0, 3.2], rtol=2e-3)
        # in-box point scaled about the center (5,0,0)
        np.testing.assert_allclose(d["points"][0, :3], [7.0, 1.0, 0.4],
                                   rtol=2e-3)

    def test_local_rotation_rotates_about_center(self):
        aug = self._aug("random_local_rotation",
                        LOCAL_ROT_ANGLE=[np.pi / 2, np.pi / 2])
        gt, pts = self._data()
        pts[0] = [6.0, 0.0, 0.0, 1.0]  # +1 in x from the center
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        assert d["gt_boxes"][0, 6] == pytest.approx(np.pi / 2)
        # rotating (1, 0) by +90deg about the center -> (0, 1)
        np.testing.assert_allclose(d["points"][0, :3], [5.0, 1.0, 0.0],
                                   atol=1e-5)

    def test_world_frustum_dropout_drops_slab(self):
        aug = self._aug("random_world_frustum_dropout",
                        INTENSITY_RANGE=[0.5, 0.5], DIRECTION=["top"])
        gt = np.array([[5.0, 0.0, -1.5, 4.0, 2.0, 1.6, 0.0],
                       [5.0, 3.0, 1.5, 4.0, 2.0, 1.6, 0.0]], np.float32)
        pts = np.array([[1.0, 0.0, -2.0, 0.0],
                        [1.0, 0.0, 2.0, 0.0]], np.float32)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car", "car"])})
        # threshold = 2 - 0.5*(2-(-2)) = 0: keep z < 0
        assert len(d["points"]) == 1 and d["points"][0, 2] == -2.0
        assert len(d["gt_boxes"]) == 1
        assert len(d["gt_names"]) == 1  # names stay in sync (ref desyncs)

    def test_local_frustum_dropout_top(self):
        aug = self._aug("random_local_frustum_dropout",
                        INTENSITY_RANGE=[0.5, 0.5], DIRECTION=["top"])
        gt, pts = self._data()
        pts = np.array([
            [5.0, 0.0, 0.5, 1.0],    # in box, upper half -> dropped
            [5.0, 0.0, -0.5, 2.0],   # in box, lower half -> kept
            [20.0, 5.0, 0.5, 3.0],   # outside -> kept
        ], np.float32)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        np.testing.assert_allclose(sorted(d["points"][:, 3]), [2.0, 3.0])

    def test_imgaug_flip_recorded(self):
        """imgaug (data_augmentor.imgaug:282-302): per-camera random flip,
        applied image matches the flag recorded in img_process_infos."""
        np.random.seed(3)
        aug = self._aug("imgaug", RAND_FLIP=True, ROT_LIM=[0.0, 0.0])
        imgs = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
        infos = [[0.5, (0, 0, 6, 4), False, 0], [0.5, (0, 0, 6, 4), False, 0]]
        gt = np.zeros((1, 7), np.float32)
        d = aug.forward({
            "gt_boxes": gt, "points": np.zeros((1, 4), np.float32),
            "gt_names": np.array(["car"]),
            "camera_imgs": imgs.copy(), "img_process_infos": infos,
        })
        for cam in range(2):
            expect = imgs[cam, :, ::-1] if d["img_process_infos"][cam][2] \
                else imgs[cam]
            np.testing.assert_allclose(d["camera_imgs"][cam], expect)
            assert d["img_process_infos"][cam][3] == 0.0

    def test_imgaug_rotation_matches_calibrate_matrix(self):
        """A hot pixel must land where image_calibrate's rotation block
        says: q = a(p - b) + b with a = [[c, s], [-s, c]], b = center."""
        from hgsfusion_tpu.datasets.augmentor import DataAugmentor

        img = np.zeros((8, 8, 3), np.float32)
        img[2, 3] = 1.0  # (u=3, v=2)
        out = DataAugmentor._rotate_image(img, 90.0)
        # a = [[0, 1], [-1, 0]], b = (4, 4): q = a([3-4, 2-4]) + b = (2, 5)
        np.testing.assert_allclose(out[5, 2], 1.0, atol=1e-5)
        assert abs(out.sum() - 3.0) < 1e-4

    def test_world_frustum_dropout_keeps_boxes2d_aligned(self):
        """Dropping a box must drop its 2D box too, or the augmentor's
        final gt_boxes_mask application desyncs and raises."""
        aug = self._aug("random_world_frustum_dropout",
                        INTENSITY_RANGE=[0.5, 0.5], DIRECTION=["top"])
        gt = np.array([
            [5.0, 0.0, -0.5, 4.0, 2.0, 1.6, 0.0],   # low box -> kept
            [5.0, 0.0, 0.9, 4.0, 2.0, 1.6, 0.0],    # high box -> dropped
        ], np.float32)
        pts = np.array([[5.0, 0.0, -0.9, 1.0], [5.0, 0.0, 1.0, 2.0]],
                       np.float32)
        b2d = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
        d = aug.forward({
            "gt_boxes": gt.copy(), "points": pts.copy(),
            "gt_names": np.array(["car", "car"]),
            "gt_boxes2d": b2d.copy(),
            "gt_boxes_mask": np.ones(2, bool),
        })
        assert len(d["gt_boxes"]) == len(d["gt_boxes2d"]) == 1
        np.testing.assert_allclose(d["gt_boxes2d"][0], b2d[0])

    def test_in_box_mask_margin(self):
        """Reference get_points_in_box:473-480 adds a 0.1 m xy MARGIN with
        inclusive comparisons; z uses the exact half-extent."""
        aug = self._aug("random_world_flip", ALONG_AXIS_LIST=["x"])
        box = np.array([0, 0, 0, 4.0, 2.0, 1.6, 0.0], np.float32)
        pts = np.array([
            [2.05, 0.0, 0.0],    # x: within the 0.1 margin -> in
            [2.15, 0.0, 0.0],    # x: beyond the margin -> out
            [0.0, 1.05, 0.0],    # y: within the margin -> in
            [0.0, 0.0, 0.85],    # z: beyond dz/2, no margin -> out
            [0.0, 0.0, 0.80],    # z: exactly dz/2 (inclusive) -> in
        ], np.float32)
        mask = aug._in_box_mask(pts, box)
        assert mask.tolist() == [True, False, True, False, True]

    def test_mono_image_flip_standalone(self, synthetic_root):
        """random_image_flip (data_augmentor.py:125-147) flips the mono
        image and mirrors 2D boxes with PROB=1."""
        ds = _make_dataset(synthetic_root, training=True)
        d = ds.compose_input_dict(0)
        aug = self._aug("random_image_flip", PROB=1.0,
                        ALONG_AXIS_LIST=["horizontal"])
        w = d["images"].shape[1]
        b2d = np.array([[10.0, 5.0, 30.0, 25.0]], np.float32)
        orig = d["images"].copy()
        out = aug.random_image_flip(
            {**d, "gt_boxes2d": b2d.copy()},
            {"PROB": 1.0, "ALONG_AXIS_LIST": ["horizontal"]})
        np.testing.assert_allclose(out["images"], orig[:, ::-1])
        np.testing.assert_allclose(out["gt_boxes2d"][0],
                                   [w - 30.0, 5.0, w - 10.0, 25.0])


class TestPyramidAug:
    def _aug(self, name, **cfg_kw):
        from hgsfusion_tpu.datasets.augmentor import DataAugmentor

        cfg = ConfigDict({
            "DISABLE_AUG_LIST": [],
            "AUG_CONFIG_LIST": [dict(NAME=name, **cfg_kw)],
        })
        return DataAugmentor(None, cfg, ["car"])

    def _box(self, x=0.0, y=0.0):
        return np.array([[x, y, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)

    def _pyramid_centroids(self, box, scale=0.7):
        """One point inside each of the 6 face pyramids."""
        from hgsfusion_tpu.datasets.augmentor import _box_pyramids

        pyr = _box_pyramids(box)[0]  # (6, 5, 3)
        face_centers = pyr[:, 1:5].mean(axis=1)
        apex = pyr[:, 0]
        return apex + (face_centers - apex) * scale  # gamma = 1 - scale

    def test_in_pyramid_partitions_box(self):
        from hgsfusion_tpu.datasets.augmentor import (
            _box_pyramids, _in_pyramid)

        box = self._box()
        pyr = _box_pyramids(box)[0]
        pts = self._pyramid_centroids(box)
        for j in range(6):
            for k in range(6):
                inside = _in_pyramid(pts[j:j + 1], pyr[k])[0]
                assert inside == (j == k), (j, k)
        # a far point is in no pyramid
        far = np.array([[9.0, 9.0, 9.0]], np.float32)
        assert not any(_in_pyramid(far, pyr[k])[0] for k in range(6))

    def test_remap_identity(self):
        from hgsfusion_tpu.datasets.augmentor import (
            _box_pyramids, _remap_pyramid_points)

        box = self._box()
        pyr = _box_pyramids(box)[0, 2]
        pts = np.concatenate(
            [self._pyramid_centroids(box), np.full((6, 1), 0.5)], axis=1
        ).astype(np.float32)
        out = _remap_pyramid_points(pts, pyr, pyr,
                                    (pts[:, -1].min(), pts[:, -1].max()))
        np.testing.assert_allclose(out, pts, atol=1e-5)

    def test_dropout_removes_one_pyramid(self):
        aug = self._aug("random_local_pyramid_aug", DROP_PROB=1.0,
                        SPARSIFY_PROB=0.0, SPARSIFY_MAX_NUM=50,
                        SWAP_PROB=0.0, SWAP_MAX_NUM=50)
        box = self._box()
        inside = self._pyramid_centroids(box)
        pts = np.concatenate([inside, [[9.0, 9.0, 9.0]]]).astype(np.float32)
        pts = np.concatenate([pts, np.ones((7, 1), np.float32)], axis=1)
        np.random.seed(0)
        d = aug.forward({"gt_boxes": box.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        # exactly one pyramid's point dropped; the outside point survives
        assert len(d["points"]) == 6
        assert any((d["points"][:, 0] == 9.0))

    def test_sparsify_caps_pyramid_points(self):
        aug = self._aug("random_local_pyramid_aug", DROP_PROB=0.0,
                        SPARSIFY_PROB=1.0, SPARSIFY_MAX_NUM=5,
                        SWAP_PROB=0.0, SWAP_MAX_NUM=50)
        box = self._box()
        centroids = self._pyramid_centroids(box)
        # 20 jittered points around each pyramid centroid
        rng = np.random.RandomState(1)
        pts = np.concatenate([
            centroids[j] + rng.uniform(-0.05, 0.05, (20, 3))
            for j in range(6)
        ]).astype(np.float32)
        pts = np.concatenate([pts, np.ones((120, 1), np.float32)], axis=1)
        np.random.seed(2)
        d = aug.forward({"gt_boxes": box.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car"])})
        # one pyramid capped from 20 to 5
        assert len(d["points"]) == 120 - 20 + 5

    def test_swap_preserves_counts_and_containment(self):
        from hgsfusion_tpu.datasets.augmentor import (
            _box_pyramids, _in_pyramid)

        aug = self._aug("random_local_pyramid_aug", DROP_PROB=0.0,
                        SPARSIFY_PROB=0.0, SPARSIFY_MAX_NUM=50,
                        SWAP_PROB=1.0, SWAP_MAX_NUM=2)
        b1, b2 = self._box(0.0), self._box(10.0)
        gt = np.concatenate([b1, b2])
        rng = np.random.RandomState(3)
        parts = []
        for box in (b1, b2):
            centroids = self._pyramid_centroids(box)
            parts.append(np.concatenate([
                centroids[j] + rng.uniform(-0.05, 0.05, (6, 3))
                for j in range(6)
            ]))
        pts = np.concatenate(parts).astype(np.float32)
        pts = np.concatenate(
            [pts, rng.uniform(0, 1, (len(pts), 1))], axis=1
        ).astype(np.float32)
        np.random.seed(4)
        d = aug.forward({"gt_boxes": gt.copy(), "points": pts.copy(),
                         "gt_names": np.array(["car", "car"])})
        out = d["points"]
        assert len(out) == len(pts)  # swap moves, never deletes
        # every point still lies in some pyramid of one of the two boxes
        pyrs = _box_pyramids(gt).reshape(-1, 5, 3)
        covered = np.zeros(len(out), bool)
        for p in pyrs:
            covered |= _in_pyramid(out, p)
        assert covered.all()
        # at least one point actually moved between boxes
        assert not np.allclose(np.sort(out[:, 0]), np.sort(pts[:, 0]),
                               atol=1e-6)


class TestPipelineEdgeCases:
    """Fuzz the host pipeline at its degenerate corners: the static-shape
    contract must survive frames the reference's ragged pipeline handles
    implicitly (resample-on-empty, mask-to-zero)."""

    def test_all_points_out_of_range(self, synthetic_root):
        ds = _make_dataset(synthetic_root, training=False)
        d = ds.compose_input_dict(0)
        d["points"][:, 0] = 999.0  # everything outside the range mask
        out = ds.prepare_data(d)
        assert out is not None  # eval path never resamples
        out = ds.pad_to_static(out)
        assert out["points_valid"].sum() == 0
        batch = DatasetTemplate.collate_batch([out])
        assert batch["points"].shape[1] == 1024

    def test_all_gt_filtered_returns_none_in_training(self, synthetic_root):
        ds = _make_dataset(synthetic_root, training=True)
        np.random.seed(0)
        d = ds.compose_input_dict(0)
        d["gt_names"] = np.array(["Unknown"] * len(d["gt_names"]))
        assert ds.prepare_data(d) is None  # caller redraws (reference quirk)

    def test_single_point_frame(self, synthetic_root):
        ds = _make_dataset(synthetic_root, training=False)
        d = ds.compose_input_dict(0)
        d["points"] = d["points"][:1]
        out = ds.pad_to_static(ds.prepare_data(d))
        assert out["points_valid"].sum() <= 1
        assert out["points"].shape == (1024, 17)

    def test_gt_boxes_overflow_truncates(self, synthetic_root):
        """More gt boxes than MAX_GT_BOXES must truncate, not crash."""
        ds = _make_dataset(synthetic_root, training=False)
        d = ds.compose_input_dict(0)
        reps = int(np.ceil(40 / max(len(d["gt_boxes"]), 1)))
        d["gt_boxes"] = np.tile(d["gt_boxes"], (reps, 1))[:40]
        d["gt_names"] = np.tile(d["gt_names"], reps)[:40]
        if d.get("gt_boxes2d") is not None:
            d["gt_boxes2d"] = np.tile(d["gt_boxes2d"], (reps, 1))[:40]
        out = ds.pad_to_static(ds.prepare_data(d))
        assert out["gt_boxes"].shape == (16, 8)

    def test_fuzz_random_degenerate_frames(self, synthetic_root):
        """Random subsets/corruptions of a real frame never crash the
        eval-path pipeline and always emit contract-shaped arrays."""
        ds = _make_dataset(synthetic_root, training=False)
        rng = np.random.RandomState(0)
        for trial in range(20):
            d = ds.compose_input_dict(trial % len(ds))
            n = len(d["points"])
            keep = rng.rand(n) < rng.choice([0.0, 0.01, 0.5, 1.0])
            d["points"] = d["points"][keep]
            if rng.rand() < 0.3 and len(d["gt_boxes"]):
                d["gt_boxes"] = d["gt_boxes"][:0]
                d["gt_names"] = d["gt_names"][:0]
                if d.get("gt_boxes2d") is not None:
                    d["gt_boxes2d"] = d["gt_boxes2d"][:0]
            out = ds.pad_to_static(ds.prepare_data(d))
            assert out["points"].shape == (1024, 17)
            assert out["gt_boxes"].shape == (16, 8)
            assert np.all(np.isfinite(out["points"]))


class TestAugMatrixSemantics:
    """set_lidar_aug_matrix must match dataset.py:133-156 exactly: flips are
    recorded ONLY when 'flip_y' is present (the flagship x-only world flip
    pairs with random_image_flip_fusion, so undoing it in the frustum would
    mirror the sampled image columns), and noise_translate rides in the
    translation column."""

    def test_x_only_flip_is_not_recorded(self):
        from hgsfusion_tpu.datasets.dataset import DatasetTemplate

        d = {"flip_x": True}
        DatasetTemplate.set_lidar_aug_matrix(d)
        np.testing.assert_array_equal(d["lidar_aug_matrix"], np.eye(4))

    def test_xy_flip_and_translate_recorded(self):
        from hgsfusion_tpu.datasets.dataset import DatasetTemplate

        d = {"flip_x": True, "flip_y": False,
             "noise_translate": np.array([1.0, -2.0, 0.5])}
        DatasetTemplate.set_lidar_aug_matrix(d)
        m = d["lidar_aug_matrix"]
        np.testing.assert_allclose(m[:3, :3], np.diag([1.0, -1.0, 1.0]))
        np.testing.assert_allclose(m[:3, 3], [1.0, -2.0, 0.5])


def test_collate_stacks_unknown_array_keys():
    """Reference collate default-stacks any same-shape array key; leaving
    e.g. the multicam camera_imgs family as Python lists breaks
    device_put/sharding downstream."""
    from hgsfusion_tpu.datasets.dataset import DatasetTemplate

    s = {"points": np.zeros((4, 5), np.float32),
         "camera_imgs": np.zeros((2, 8, 8, 3), np.float32),
         "lidar2camera": np.eye(4, dtype=np.float32),
         "frame_id": "000001"}
    out = DatasetTemplate.collate_batch([dict(s), dict(s)])
    assert out["camera_imgs"].shape == (2, 2, 8, 8, 3)
    assert out["lidar2camera"].shape == (2, 4, 4)
    assert isinstance(out["frame_id"], list)


def test_point_feature_encoder_emits_xyz_first():
    """absolute_coordinates_encoding always emits x,y,z first and appends
    only the non-xyz used features (point_feature_encoder.py:43-57)."""
    from hgsfusion_tpu.datasets.processor import PointFeatureEncoder

    enc = PointFeatureEncoder({
        "src_feature_list": ["x", "y", "z", "intensity", "ring"],
        "used_feature_list": ["intensity", "x", "y", "z"],
    })
    assert enc.num_point_features == 4
    pts = np.array([[1.0, 2.0, 3.0, 9.0, 7.0]], np.float32)
    out = enc.forward({"points": pts})["points"]
    np.testing.assert_array_equal(out, [[1.0, 2.0, 3.0, 9.0]])


def test_merge_all_iters_scales_len(synthetic_root):
    ds = _make_dataset(synthetic_root, training=True)
    n = len(ds)
    ds._merge_all_iters_to_one_epoch = True  # tools/train.py:95-99
    ds.total_epochs = 10
    assert len(ds) == n * 10
    item = ds[n * 10 - 1]  # wraps modulo the info count
    assert item["points"].shape[0] == ds.max_points


def test_world_augs_transform_roi_boxes():
    """World flip/rotation/scaling must move first-stage proposal boxes
    with the scene (data_augmentor.py:66-71, 86-90, 101-110)."""
    from hgsfusion_tpu.datasets.augmentor import DataAugmentor

    aug = DataAugmentor.__new__(DataAugmentor)
    rb = np.zeros((1, 2, 9), np.float32)
    rb[0, 0] = [1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.5]
    d = {"points": np.zeros((4, 5), np.float32),
         "gt_boxes": np.zeros((1, 7), np.float32),
         "roi_boxes": rb.copy()}

    np.random.seed(0)
    while True:  # redraw until the flip actually fires
        d2 = {**d, "roi_boxes": rb.copy(),
              "gt_boxes": d["gt_boxes"].copy(),
              "points": d["points"].copy()}
        aug.random_world_flip(d2, {"ALONG_AXIS_LIST": ["x"]})
        if d2["flip_x"]:
            break
    np.testing.assert_allclose(
        d2["roi_boxes"][0, 0], [1.0, -2.0, 0.0, 4.0, 2.0, 1.5, -0.3,
                                1.0, -0.5])

    d3 = {**d, "roi_boxes": rb.copy(), "gt_boxes": d["gt_boxes"].copy(),
          "points": d["points"].copy()}
    aug.random_world_scaling(d3, {"WORLD_SCALE_RANGE": [2.0, 2.0 + 1e-2]})
    s = d3["noise_scale"]
    np.testing.assert_allclose(
        d3["roi_boxes"][0, 0],
        [s, 2 * s, 0.0, 4 * s, 2 * s, 1.5 * s, 0.3, s, 0.5 * s],
        rtol=1e-6)

    d4 = {**d, "roi_boxes": rb.copy(), "gt_boxes": d["gt_boxes"].copy(),
          "points": d["points"].copy()}
    aug.random_world_rotation(d4, {"WORLD_ROT_ANGLE": [0.5, 0.5 + 1e-6]})
    a = d4["noise_rot"]
    c, sn = np.cos(a), np.sin(a)
    np.testing.assert_allclose(
        d4["roi_boxes"][0, 0, :2], [c * 1 - sn * 2, sn * 1 + c * 2],
        rtol=1e-5)
    np.testing.assert_allclose(d4["roi_boxes"][0, 0, 6], 0.3 + a, rtol=1e-5)
