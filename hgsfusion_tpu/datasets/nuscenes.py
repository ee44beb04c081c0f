"""NuScenes dataset family (inherited; not used by the HGS path).

Reference: pcdet/datasets/nuscenes/nuscenes_dataset.py +
nuscenes_utils.py. TPU-first differences:
- info creation reads the raw nuScenes JSON tables directly
  (`NuScenesTables`) instead of requiring the external `nuscenes` devkit —
  the devkit is a thin JSON reader and the transform math
  (obtain_sensor2top, fill_trainval_infos, nuscenes_utils.py:252-469) is
  replicated here in numpy;
- evaluation runs the self-contained `eval/nuscenes_eval.py` protocol in
  the lidar frame (center-distance matching is rigid-transform invariant),
  while `write_nusc_submission` still emits the official global-frame
  results_nusc.json using the info matrices (replacing
  transform_det_annos_to_nusc_annos, nuscenes_utils.py:511-556, which
  needed a live devkit instance);
- samples are padded to static shapes for the jitted graph.
"""
from __future__ import annotations

import copy
import json
import pickle
from functools import reduce
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate

# nuscenes_utils.py:16-40 — raw category -> detection class
MAP_NAME_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}

# argmax of the reference's cls_attr_dist train histogram
# (nuscenes_utils.py:43-155) — the fallback attribute per class
DEFAULT_ATTR = {
    "car": "vehicle.parked", "truck": "vehicle.parked",
    "trailer": "vehicle.parked", "construction_vehicle": "vehicle.parked",
    "bus": "vehicle.moving", "pedestrian": "pedestrian.moving",
    "motorcycle": "cycle.without_rider", "bicycle": "cycle.without_rider",
    "barrier": "", "traffic_cone": "",
}

# public scene-name splits for v1.0-mini (nuscenes devkit utils/splits.py)
MINI_TRAIN = [
    "scene-0061", "scene-0553", "scene-0655", "scene-0757",
    "scene-0796", "scene-1077", "scene-1094", "scene-1100",
]
MINI_VAL = ["scene-0103", "scene-0916"]


# ---------------------------------------------------------------------------
# quaternion / SE(3) helpers (replace pyquaternion)
# ---------------------------------------------------------------------------
def quat_to_rotmat(q):
    """(w, x, y, z) unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = np.asarray(q, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rotmat_to_quat(m):
    """3x3 rotation matrix -> (w, x, y, z), w >= 0."""
    m = np.asarray(m, np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 0.0)) * 2
        q = np.empty(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
    if q[0] < 0:
        q = -q
    return q


def quaternion_yaw(q):
    """Yaw of a quaternion: heading of the rotated x-axis projected to the
    xy-plane (nuscenes_utils.quaternion_yaw:234-249)."""
    v = quat_to_rotmat(q) @ np.array([1.0, 0.0, 0.0])
    return float(np.arctan2(v[1], v[0]))


def yaw_to_quat(yaw):
    return np.array([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])


def transform_matrix(translation, rotation_q, inverse=False):
    """4x4 homogeneous transform from (t, quaternion) (devkit geometry_utils)."""
    tm = np.eye(4)
    rot = quat_to_rotmat(rotation_q)
    t = np.asarray(translation, np.float64)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = rot.T @ -t
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = t
    return tm


# ---------------------------------------------------------------------------
# raw-table reader (devkit-free)
# ---------------------------------------------------------------------------
class NuScenesTables:
    """Minimal loader/indexer of the raw nuScenes JSON tables.

    Replaces the `NuScenes` devkit object for info creation: token->record
    maps plus the reverse indexes the devkit builds (sample['data'] channel
    map, sample['anns'] list).
    """

    TABLES = (
        "category", "attribute", "sensor", "calibrated_sensor", "ego_pose",
        "log", "scene", "sample", "sample_data", "sample_annotation",
        "instance",
    )

    def __init__(self, dataroot, version):
        self.dataroot = Path(dataroot)
        self.version = version
        tdir = self.dataroot / version
        self.rec = {}
        for name in self.TABLES:
            with open(tdir / f"{name}.json") as f:
                rows = json.load(f)
            self.rec[name] = {r["token"]: r for r in rows}
        # reverse indexes
        for s in self.rec["sample"].values():
            s["data"], s["anns"] = {}, []
        for sd in self.rec["sample_data"].values():
            cs = self.rec["calibrated_sensor"][sd["calibrated_sensor_token"]]
            sensor = self.rec["sensor"][cs["sensor_token"]]
            sd["channel"] = sensor["channel"]
            if sd["is_key_frame"]:
                self.rec["sample"][sd["sample_token"]]["data"][
                    sd["channel"]] = sd["token"]
        for ann in self.rec["sample_annotation"].values():
            self.rec["sample"][ann["sample_token"]]["anns"].append(
                ann["token"])

    def get(self, table, token):
        return self.rec[table][token]

    @property
    def sample(self):
        return list(self.rec["sample"].values())

    def box_velocity(self, ann_token, max_time_diff=1.5):
        """Finite-difference global velocity from the instance's prev/next
        annotations (devkit NuScenes.box_velocity)."""
        cur = self.get("sample_annotation", ann_token)
        has_prev = cur["prev"] != ""
        has_next = cur["next"] != ""
        if not has_prev and not has_next:
            return np.array([np.nan, np.nan, np.nan])
        first = self.get("sample_annotation", cur["prev"]) if has_prev else cur
        last = self.get("sample_annotation", cur["next"]) if has_next else cur
        pos_first = np.asarray(first["translation"], np.float64)
        pos_last = np.asarray(last["translation"], np.float64)
        t_first = 1e-6 * self.get("sample", first["sample_token"])["timestamp"]
        t_last = 1e-6 * self.get("sample", last["sample_token"])["timestamp"]
        if t_last - t_first > max_time_diff:
            return np.array([np.nan, np.nan, np.nan])
        return (pos_last - pos_first) / max(t_last - t_first, 1e-6)

    def get_sample_data(self, sd_token, ann_tokens=None):
        """(lidar_path, boxes-in-sensor-frame, cam_intrinsic) — devkit
        get_sample_data + nuscenes_utils.get_sample_data:185-231."""
        sd = self.get("sample_data", sd_token)
        cs = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = self.get("ego_pose", sd["ego_pose_token"])
        cam_intrinsic = (
            np.asarray(cs["camera_intrinsic"], np.float64)
            if cs.get("camera_intrinsic") else None
        )
        if ann_tokens is None:
            ann_tokens = self.get("sample", sd["sample_token"])["anns"]
        inv_pose_r = quat_to_rotmat(pose["rotation"]).T
        inv_cs_r = quat_to_rotmat(cs["rotation"]).T
        boxes = []
        for tok in ann_tokens:
            ann = self.get("sample_annotation", tok)
            center = np.asarray(ann["translation"], np.float64)
            rot = quat_to_rotmat(ann["rotation"])
            vel = self.box_velocity(tok)
            # global -> ego -> sensor
            center = inv_pose_r @ (center - np.asarray(pose["translation"]))
            center = inv_cs_r @ (center - np.asarray(cs["translation"]))
            rot = inv_cs_r @ inv_pose_r @ rot
            vel = inv_cs_r @ inv_pose_r @ vel
            name = self.get("category", self.get(
                "instance", ann["instance_token"])["category_token"])["name"]
            attr = (
                self.get("attribute", ann["attribute_tokens"][0])["name"]
                if ann.get("attribute_tokens") else ""
            )
            boxes.append({
                "token": tok,
                "center": center,
                "wlh": np.asarray(ann["size"], np.float64),
                "yaw": float(np.arctan2(rot[1, 0], rot[0, 0])),
                "velocity": vel,
                "name": name,
                "attribute": attr,
                # lyft tables (same schema) lack the point-count fields
                "num_lidar_pts": ann.get("num_lidar_pts", -1),
                "num_radar_pts": ann.get("num_radar_pts", -1),
            })
        return self.dataroot / sd["filename"], boxes, cam_intrinsic


def _sensor2top(tables, sd_token, l2e_t, l2e_r_mat, e2g_t, e2g_r_mat,
                sensor_type="lidar"):
    """RT from a sensor sample_data to the top lidar frame
    (nuscenes_utils.obtain_sensor2top:252-310)."""
    sd = tables.get("sample_data", sd_token)
    cs = tables.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = tables.get("ego_pose", sd["ego_pose_token"])
    sweep = {
        "data_path": sd["filename"],
        "type": sensor_type,
        "sample_data_token": sd["token"],
        "sensor2ego_translation": cs["translation"],
        "sensor2ego_rotation": cs["rotation"],
        "ego2global_translation": pose["translation"],
        "ego2global_rotation": pose["rotation"],
        "timestamp": sd["timestamp"],
    }
    l2e_r_s_mat = quat_to_rotmat(cs["rotation"])
    e2g_r_s_mat = quat_to_rotmat(pose["rotation"])
    l2e_t_s = np.asarray(cs["translation"], np.float64)
    e2g_t_s = np.asarray(pose["translation"], np.float64)
    inv = np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    r = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ inv
    t = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ inv
    t -= (np.asarray(e2g_t) @ inv
          + np.asarray(l2e_t) @ np.linalg.inv(l2e_r_mat).T)
    sweep["sensor2lidar_rotation"] = r.T
    sweep["sensor2lidar_translation"] = t
    return sweep


CAMERA_TYPES = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def fill_trainval_infos(tables, train_scene_tokens, val_scene_tokens,
                        test=False, max_sweeps=10, with_cam=False):
    """nuscenes_utils.fill_trainval_infos:312-469 over raw tables."""
    train_infos, val_infos = [], []
    samples = sorted(tables.sample, key=lambda s: s["timestamp"])
    for sample in samples:
        ref_sd_token = sample["data"]["LIDAR_TOP"]
        ref_sd = tables.get("sample_data", ref_sd_token)
        ref_cs = tables.get(
            "calibrated_sensor", ref_sd["calibrated_sensor_token"])
        ref_pose = tables.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]
        ref_lidar_path, ref_boxes, _ = tables.get_sample_data(ref_sd_token)

        info = {
            "lidar_path": ref_sd["filename"],
            "token": sample["token"],
            "sweeps": [],
            "ref_from_car": transform_matrix(
                ref_cs["translation"], ref_cs["rotation"], inverse=True),
            "car_from_global": transform_matrix(
                ref_pose["translation"], ref_pose["rotation"], inverse=True),
            "timestamp": ref_time,
        }
        if "CAM_FRONT" in sample["data"]:
            cam_sd = tables.get("sample_data", sample["data"]["CAM_FRONT"])
            cam_cs = tables.get(
                "calibrated_sensor", cam_sd["calibrated_sensor_token"])
            info["cam_front_path"] = cam_sd["filename"]
            info["cam_intrinsic"] = np.asarray(
                cam_cs["camera_intrinsic"], np.float64)

        if with_cam:
            info["cams"] = {}
            l2e_r_mat = quat_to_rotmat(ref_cs["rotation"])
            e2g_r_mat = quat_to_rotmat(ref_pose["rotation"])
            for cam in CAMERA_TYPES:
                if cam not in sample["data"]:
                    continue
                cam_info = _sensor2top(
                    tables, sample["data"][cam], ref_cs["translation"],
                    l2e_r_mat, ref_pose["translation"], e2g_r_mat, cam)
                cam_cs = tables.get("calibrated_sensor", tables.get(
                    "sample_data",
                    sample["data"][cam])["calibrated_sensor_token"])
                cam_info["camera_intrinsics"] = np.asarray(
                    cam_cs["camera_intrinsic"], np.float64)
                info["cams"][cam] = cam_info

        # sweep chain (fill_trainval_infos:389-441)
        curr = ref_sd
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr["prev"] == "":
                if len(sweeps) == 0:
                    sweeps.append({
                        "lidar_path": ref_sd["filename"],
                        "sample_data_token": curr["token"],
                        "transform_matrix": None,
                        "time_lag": 0.0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr = tables.get("sample_data", curr["prev"])
                pose_c = tables.get("ego_pose", curr["ego_pose_token"])
                cs_c = tables.get(
                    "calibrated_sensor", curr["calibrated_sensor_token"])
                global_from_car = transform_matrix(
                    pose_c["translation"], pose_c["rotation"], inverse=False)
                car_from_current = transform_matrix(
                    cs_c["translation"], cs_c["rotation"], inverse=False)
                tm = reduce(np.dot, [
                    info["ref_from_car"], info["car_from_global"],
                    global_from_car, car_from_current,
                ])
                sweeps.append({
                    "lidar_path": curr["filename"],
                    "sample_data_token": curr["token"],
                    "transform_matrix": tm,
                    "global_from_car": global_from_car,
                    "car_from_current": car_from_current,
                    "time_lag": ref_time - 1e-6 * curr["timestamp"],
                })
        info["sweeps"] = sweeps

        if not test:
            num_lidar_pts = np.array(
                [b["num_lidar_pts"] for b in ref_boxes], np.int64)
            num_radar_pts = np.array(
                [b["num_radar_pts"] for b in ref_boxes], np.int64)
            mask = (num_lidar_pts + num_radar_pts) > 0
            locs = np.array(
                [b["center"] for b in ref_boxes], np.float64).reshape(-1, 3)
            # wlh -> dx dy dz (lwh)
            dims = np.array(
                [b["wlh"] for b in ref_boxes], np.float64
            ).reshape(-1, 3)[:, [1, 0, 2]]
            rots = np.array(
                [b["yaw"] for b in ref_boxes], np.float64).reshape(-1, 1)
            velocity = np.array(
                [b["velocity"] for b in ref_boxes], np.float64).reshape(-1, 3)
            names = np.array([
                MAP_NAME_TO_DETECTION.get(b["name"], b["name"])
                for b in ref_boxes
            ])
            attrs = np.array([b["attribute"] for b in ref_boxes])
            tokens = np.array([b["token"] for b in ref_boxes])
            gt_boxes = np.concatenate(
                [locs, dims, rots, velocity[:, :2]], axis=1)
            info["gt_boxes"] = gt_boxes[mask]
            info["gt_boxes_velocity"] = velocity[mask]
            info["gt_names"] = names[mask]
            info["gt_attributes"] = attrs[mask]
            info["gt_boxes_token"] = tokens[mask]
            info["num_lidar_pts"] = num_lidar_pts[mask]
            info["num_radar_pts"] = num_radar_pts[mask]

        scene_token = sample["scene_token"]
        if scene_token in train_scene_tokens:
            train_infos.append(info)
        elif scene_token in val_scene_tokens:
            val_infos.append(info)
    return train_infos, val_infos


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10,
                         with_cam=False, train_scenes=None, val_scenes=None):
    """Devkit-free create_nuscenes_info (nuscenes_dataset.py:358-404).

    For v1.0-mini the public scene splits are built in; for trainval pass
    explicit scene-name lists (the official 700/150 split lives in the
    devkit's splits.py) or default to every scene in train.

    Layout matches the reference (nuscenes_dataset.py:362-363: data_path =
    data_path / version): `<data_path>/<version>/` holds `samples/`,
    `sweeps/`, and the `<version>/` table dir.
    """
    data_path = Path(data_path) / version
    save_path = Path(save_path)
    tables = NuScenesTables(data_path, version)
    scenes = list(tables.rec["scene"].values())
    name_to_token = {s["name"]: s["token"] for s in scenes}
    if train_scenes is None and version == "v1.0-mini":
        train_scenes, val_scenes = MINI_TRAIN, MINI_VAL
    if train_scenes is None:
        train_scenes = [s["name"] for s in scenes]
        val_scenes = []
    train_tokens = {name_to_token[n] for n in train_scenes
                    if n in name_to_token}
    val_tokens = {name_to_token[n] for n in (val_scenes or [])
                  if n in name_to_token}
    test = "test" in version
    train_infos, val_infos = fill_trainval_infos(
        tables, train_tokens, val_tokens, test=test, max_sweeps=max_sweeps,
        with_cam=with_cam,
    )
    save_path.mkdir(parents=True, exist_ok=True)
    if test:
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_test.pkl",
                  "wb") as f:
            pickle.dump(train_infos, f)
    else:
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_train.pkl",
                  "wb") as f:
            pickle.dump(train_infos, f)
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_val.pkl",
                  "wb") as f:
            pickle.dump(val_infos, f)
    return train_infos, val_infos


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------
class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        root_path = (
            Path(root_path) if root_path is not None
            else Path(dataset_cfg.DATA_PATH)
        ) / dataset_cfg.VERSION
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.infos = []
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.pred_velocity = bool(dataset_cfg.get("PRED_VELOCITY", False))
        camera_cfg = dataset_cfg.get("CAMERA_CONFIG", None)
        self.use_camera = bool(
            camera_cfg and camera_cfg.get("USE_CAMERA", True))
        self.camera_image_cfg = (camera_cfg["IMAGE"] if self.use_camera
                                 else None)
        self.include_nuscenes_data(self.mode)
        if self.training and dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(
                f"Total samples for NuScenes dataset: {len(self.infos)}")

    def balanced_infos_resampling(self, infos):
        """CBGS duplication toward a uniform class prior
        (nuscenes_dataset.py:48-84, arXiv 1908.09492)."""
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info["gt_names"]):
                if name in self.class_names:
                    cls_infos[name].append(info)
        total = sum(len(v) for v in cls_infos.values())
        if total == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        sampled = []
        for cur_infos in cls_infos.values():
            if not cur_infos:
                continue
            ratio = frac / (len(cur_infos) / total)
            sampled += list(np.random.choice(
                cur_infos, int(len(cur_infos) * ratio)))
        return sampled if sampled else infos

    # -- lidar IO -------------------------------------------------------
    def get_sweep(self, sweep_info):
        def remove_ego_points(points, center_radius=1.0):
            mask = ~((np.abs(points[:, 0]) < center_radius)
                     & (np.abs(points[:, 1]) < center_radius))
            return points[mask]

        lidar_path = self.root_path / sweep_info["lidar_path"]
        points = np.fromfile(
            str(lidar_path), dtype=np.float32).reshape(-1, 5)[:, :4]
        points = remove_ego_points(points)
        tm = sweep_info["transform_matrix"]
        if tm is not None:
            hom = np.concatenate(
                [points[:, :3], np.ones((len(points), 1), np.float32)],
                axis=1)
            points[:, :3] = (hom @ np.asarray(tm, np.float32).T)[:, :3]
        times = sweep_info["time_lag"] * np.ones((len(points), 1), np.float32)
        return points, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        points = np.fromfile(
            str(self.root_path / info["lidar_path"]), dtype=np.float32
        ).reshape(-1, 5)[:, :4]
        pts_list = [points]
        times_list = [np.zeros((len(points), 1), np.float32)]
        n_sweep = len(info["sweeps"])
        if n_sweep > 0 and max_sweeps > 1:
            for k in np.random.choice(
                    n_sweep, min(max_sweeps - 1, n_sweep), replace=False):
                p, t = self.get_sweep(info["sweeps"][k])
                pts_list.append(p)
                times_list.append(t)
        points = np.concatenate(pts_list, axis=0)
        times = np.concatenate(times_list, axis=0).astype(points.dtype)
        return np.concatenate([points, times], axis=1)

    # -- camera IO (BEVFusion-style multi-cam) --------------------------
    def load_camera_info(self, input_dict, info):
        """nuscenes_dataset.py:155-212 — per-cam matrices + resize/crop."""
        from PIL import Image

        lidar2cam, cam_intr, cam2lidar, imgs = [], [], [], []
        for cam_info in info["cams"].values():
            r = np.asarray(cam_info["sensor2lidar_rotation"], np.float64)
            t = np.asarray(cam_info["sensor2lidar_translation"], np.float64)
            l2c = np.eye(4)
            l2c[:3, :3] = r.T
            l2c[:3, 3] = -(r.T @ t)
            lidar2cam.append(l2c)
            intr = np.eye(4)
            intr[:3, :3] = np.asarray(
                cam_info["camera_intrinsics"], np.float64)
            cam_intr.append(intr)
            c2l = np.eye(4)
            c2l[:3, :3] = r
            c2l[:3, 3] = t
            cam2lidar.append(c2l)
            imgs.append(Image.open(
                str(self.root_path / cam_info["data_path"])))

        fh, fw = self.camera_image_cfg["FINAL_DIM"]
        w, h = imgs[0].size
        crops, infos_out = [], []
        for img in imgs:
            if self.training:
                resize = float(np.random.uniform(
                    *self.camera_image_cfg["RESIZE_LIM_TRAIN"]))
            else:
                resize = float(np.mean(self.camera_image_cfg["RESIZE_LIM_TEST"]))
            new_w, new_h = int(w * resize), int(h * resize)
            crop_h = new_h - fh
            crop_w = (
                int(np.random.uniform(0, max(0, new_w - fw)))
                if self.training else int(max(0, new_w - fw) / 2)
            )
            crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
            # keep raw uint8 — image_normalize keys its /255 on int dtype
            crops.append(np.asarray(
                img.resize((new_w, new_h)).crop(crop), np.uint8))
            infos_out.append([resize, crop, False, 0])
        input_dict["camera_imgs"] = np.stack(crops, axis=0)
        input_dict["img_process_infos"] = infos_out
        input_dict["lidar2camera"] = np.stack(lidar2cam).astype(np.float32)
        input_dict["camera_intrinsics"] = np.stack(cam_intr).astype(np.float32)
        input_dict["camera2lidar"] = np.stack(cam2lidar).astype(np.float32)
        return input_dict

    # -- pipeline -------------------------------------------------------
    def __len__(self):
        return self.merged_len(len(self.infos))

    def __getitem__(self, index):
        return self.getitem_with_resample(
            index, self._get_one, len(self.infos))

    def _get_one(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(index, max_sweeps=self.max_sweeps)
        input_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info["token"]},
        }
        if "gt_boxes" in info:
            min_pts = self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT", 0)
            mask = (
                info["num_lidar_pts"] > min_pts - 1
                if min_pts else np.ones(len(info["gt_boxes"]), bool)
            )
            input_dict["gt_boxes"] = info["gt_boxes"][mask]
            input_dict["gt_names"] = info["gt_names"][mask]
        if self.use_camera:
            input_dict = self.load_camera_info(input_dict, info)
        data_dict = self.prepare_data(input_dict)
        if data_dict is None:
            return None
        if (self.dataset_cfg.get("SET_NAN_VELOCITY_TO_ZEROS", False)
                and "gt_boxes" in data_dict):
            gt = data_dict["gt_boxes"]
            gt[np.isnan(gt)] = 0
            data_dict["gt_boxes"] = gt
        if not self.pred_velocity and "gt_boxes" in data_dict:
            # drop vx, vy, keep class id (nuscenes_dataset.py:253-254)
            data_dict["gt_boxes"] = data_dict["gt_boxes"][
                :, [0, 1, 2, 3, 4, 5, 6, -1]]
        return data_dict

    # -- predictions / eval ---------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i, pd in enumerate(pred_dicts):
            boxes = np.asarray(pd["pred_boxes"], np.float32)
            labels = np.asarray(pd["pred_labels"], np.int64)
            scores = np.asarray(pd["pred_scores"], np.float32)
            annos.append({
                "name": np.asarray(
                    [class_names[l - 1] for l in labels]),
                "score": scores,
                "boxes_lidar": boxes,
                "pred_labels": labels,
                "frame_id": batch_dict["frame_id"][i],
                "metadata": batch_dict["metadata"][i]
                if "metadata" in batch_dict else {"token": None},
            })
        return annos

    @staticmethod
    def _attr_for(name, velocity):
        """Attribute heuristic (transform_det_annos_to_nusc_annos,
        nuscenes_utils.py:526-543)."""
        if np.hypot(*velocity) > 0.2:
            if name in ("car", "construction_vehicle", "bus", "truck",
                        "trailer"):
                return "vehicle.moving"
            if name in ("bicycle", "motorcycle"):
                return "cycle.with_rider"
        else:
            if name == "pedestrian":
                return "pedestrian.standing"
            if name == "bus":
                return "vehicle.stopped"
        return DEFAULT_ATTR.get(name, "")

    def _det_to_boxes(self, det):
        boxes3d = np.asarray(det["boxes_lidar"], np.float64).reshape(
            len(det["name"]), -1)
        out = []
        for k in range(len(boxes3d)):
            vel = (
                tuple(boxes3d[k, 7:9]) if boxes3d.shape[1] >= 9
                else (0.0, 0.0)
            )
            out.append({
                "translation": boxes3d[k, :3],
                "size": boxes3d[k, [4, 3, 5]],  # dx dy dz -> wlh
                "yaw": float(boxes3d[k, 6]),
                "velocity": vel,
                "detection_name": str(det["name"][k]),
                "detection_score": float(det["score"][k]),
                "attribute_name": self._attr_for(str(det["name"][k]), vel),
            })
        return out

    def _gt_boxes_for_eval(self, info):
        out = []
        boxes = np.asarray(info["gt_boxes"], np.float64)
        attrs = info.get("gt_attributes", [""] * len(boxes))
        for k in range(len(boxes)):
            # NaN gt velocities stay NaN (devkit load_gt): accumulate()
            # then records vel_err as NaN and _cummean skips those samples
            # instead of counting |pred_vel| toward mAVE.
            vel = tuple(boxes[k, 7:9]) if boxes.shape[1] >= 9 else (0.0, 0.0)
            out.append({
                "translation": boxes[k, :3],
                "size": boxes[k, [4, 3, 5]],
                "yaw": float(boxes[k, 6]),
                "velocity": vel,
                "detection_name": str(info["gt_names"][k]),
                "attribute_name": str(attrs[k]),
            })
        return out

    def write_nusc_submission(self, det_annos, output_path):
        """Official global-frame results_nusc.json via the info matrices
        (replaces transform_det_annos_to_nusc_annos which needed a devkit)."""
        by_token = {info["token"]: info for info in self.infos}
        results = {}
        for det in det_annos:
            token = det["metadata"]["token"]
            info = by_token[token]
            g_from_ref = np.linalg.inv(
                np.asarray(info["ref_from_car"], np.float64)
                @ np.asarray(info["car_from_global"], np.float64)
            )
            rot_g = g_from_ref[:3, :3]
            annos = []
            for b in self._det_to_boxes(det):
                center = rot_g @ np.asarray(
                    [*b["translation"]][:3]) + g_from_ref[:3, 3]
                quat = rotmat_to_quat(
                    rot_g @ quat_to_rotmat(yaw_to_quat(b["yaw"])))
                vel3 = rot_g @ np.array([*b["velocity"], 0.0])
                annos.append({
                    "sample_token": token,
                    "translation": center.tolist(),
                    "size": np.asarray(b["size"]).tolist(),
                    "rotation": quat.tolist(),
                    "velocity": vel3[:2].tolist(),
                    "detection_name": b["detection_name"],
                    "detection_score": b["detection_score"],
                    "attribute_name": b["attribute_name"] or "",
                })
            results[token] = annos
        submission = {
            "meta": {
                "use_camera": self.use_camera, "use_lidar": True,
                "use_radar": False, "use_map": False, "use_external": False,
            },
            "results": results,
        }
        output_path = Path(output_path)
        output_path.mkdir(parents=True, exist_ok=True)
        with open(output_path / "results_nusc.json", "w") as f:
            json.dump(submission, f)
        return output_path / "results_nusc.json"

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..eval.nuscenes_eval import nuscenes_detection_eval

        if kwargs.get("output_path"):
            self.write_nusc_submission(det_annos, kwargs["output_path"])
        by_token = {info["token"]: info for info in self.infos}
        gt_by_token = {
            tok: self._gt_boxes_for_eval(info)
            for tok, info in by_token.items() if "gt_boxes" in info
        }
        pred_by_token = {tok: [] for tok in gt_by_token}
        for det in det_annos:
            tok = det["metadata"]["token"]
            if tok in pred_by_token:
                pred_by_token[tok] = self._det_to_boxes(det)
        eval_classes = [c for c in class_names if c != "ignore"]
        return nuscenes_detection_eval(
            gt_by_token, pred_by_token, eval_classes)

    # -- gt database -----------------------------------------------------
    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """nuscenes_dataset.py:312-355 with numpy points_in_boxes."""
        db_path = self.root_path / f"gt_database_{max_sweeps}sweeps_withvelo"
        db_info_path = (
            self.root_path
            / f"nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl")
        db_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            if "gt_boxes" not in info:
                continue
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            self.gt_db_add_frame(
                points, info["gt_boxes"], info["gt_names"], db_path,
                self.root_path, lambda i, n: f"{idx}_{n}_{i}.bin",
                all_db_infos, used_classes,
                extra=lambda i: {"image_idx": idx},
            )
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos
