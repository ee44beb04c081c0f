"""Training-time augmentations (numpy, CPU side).

Reference: pcdet/datasets/augmentor/data_augmentor.py:10-333 and
augmentor_utils.py. Registry coverage: world flip/rotation/scaling/
translation, local (per-box) translation/rotation/scaling, world+local
frustum dropout, mono image flip (standalone + fusion-coupled), multi-camera
imgaug (flip+rotate), SE-SSD pyramid dropout/sparsify/swap, and gt_sampling
(database_sampler) — the full reference registry.
"""
from __future__ import annotations

import numpy as np

from ..utils.common import rotate_points_along_z

# box-face quads in OUR corner-template order (utils/box_utils.py:20-29),
# each (c0, c1, c2, c3) with c1/c3 adjacent to c0 so the pyramid
# parameterization's edge vectors are orthogonal: bottom, top, +x, -x,
# +y, -y. The reference's get_pyramids (augmentor_utils.py:487-510) does
# the same with its own corner ordering.
_PYRAMID_FACES = np.array([
    [0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
    [3, 2, 6, 7], [0, 3, 7, 4], [1, 2, 6, 5],
])


def _box_pyramids(boxes):
    """(N, 7+) -> (N, 6, 5, 3): [apex=center | 4 face corners] per face."""
    from ..utils.box_utils import boxes_to_corners_3d

    boxes = np.asarray(boxes)
    corners = np.asarray(boxes_to_corners_3d(boxes[:, :7]))  # (N, 8, 3)
    faces = corners[:, _PYRAMID_FACES]  # (N, 6, 4, 3)
    apex = np.broadcast_to(
        boxes[:, None, None, :3], (len(boxes), 6, 1, 3))
    return np.concatenate([apex, faces], axis=2)


def _pyramid_basis(pyr):
    """(sc, v0, v1, v2): face center, the two face edge vectors from c0,
    and the face-center -> apex vector (mutually orthogonal for box
    faces). Shared by containment and remapping so they can't drift."""
    sc = pyr[1:5].mean(axis=0)
    return sc, pyr[2] - pyr[1], pyr[4] - pyr[1], pyr[0] - sc


def _pyramid_coords(points, pyr):
    """Orthogonal-projection coordinates (alpha, beta, gamma) of points in
    a face pyramid (local_pyramid_swap.get_points_ratio:582-588): alpha/
    beta span the face edges from c0, gamma runs face-center -> apex.
    Exact for box faces (the three vectors are mutually orthogonal)."""
    sc, v0, v1, v2 = _pyramid_basis(pyr)
    rel = points[:, :3] - pyr[1]
    a = rel @ v0 / max(v0 @ v0, 1e-9)
    b = rel @ v1 / max(v1 @ v1, 1e-9)
    g = (points[:, :3] - sc) @ v2 / max(v2 @ v2, 1e-9)
    return a, b, g


def _in_pyramid(points, pyr):
    """Inside-pyramid mask: the cross-section is the face scaled by
    (1 - gamma) about its center (exact replacement for the reference's
    Delaunay in_hull on the 5-vertex frustum)."""
    a, b, g = _pyramid_coords(points, pyr)
    half = (1.0 - g) / 2.0
    return ((g >= 0) & (g <= 1)
            & (np.abs(a - 0.5) <= half) & (np.abs(b - 0.5) <= half))


def _remap_pyramid_points(points, src_pyr, dst_pyr, dst_int_range=None):
    """Carry points from one pyramid to another by their (a, b, g) coords
    (local_pyramid_swap recover_points_by_ratio:590-596); the intensity
    column's min-max RATIOS are rescaled into the receiving pyramid's
    original intensity range (dst_int_range = (lo, hi), :598-600 /
    :643-667). Middle feature columns keep their values (the reference
    only supports 4-col KITTI points and drops extras)."""
    out = points.copy()
    a, b, g = _pyramid_coords(points, src_pyr)
    sc, v0, v1, v2 = _pyramid_basis(dst_pyr)
    out[:, :3] = (a[:, None] * v0 + b[:, None] * v1) + dst_pyr[1] \
        + g[:, None] * v2
    if points.shape[1] > 3 and len(points) and dst_int_range is not None:
        inten = points[:, -1]
        lo, hi = inten.min(), inten.max()
        # the reference clips the span to [1e-6, 1] (augmentor_utils.py:
        # 644-650), so spans > 1 overshoot the destination range — kept
        ratio = (inten - lo) / np.clip(hi - lo, 1e-6, 1.0)
        dlo, dhi = dst_int_range
        out[:, -1] = ratio * (dhi - dlo) + dlo
    return out


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        disable = set(augmentor_configs.get("DISABLE_AUG_LIST", []))
        self.queue = []
        for cfg in augmentor_configs["AUG_CONFIG_LIST"]:
            if cfg["NAME"] in disable:
                continue
            self.queue.append((getattr(self, cfg["NAME"]), cfg))

    # -- individual augmentations -------------------------------------------
    def gt_sampling(self, data_dict, config):
        """GT-database copy-paste (inactive in the shipped HGS configs via
        DISABLE_AUG_LIST, but available: database_sampler.DataBaseSampler)."""
        if not hasattr(self, "_db_sampler"):
            from .database_sampler import DataBaseSampler

            self._db_sampler = DataBaseSampler(
                self.root_path, config, self.class_names, self.logger
            )
        return self._db_sampler(data_dict)

    @staticmethod
    def _flip_boxes(boxes, axis):
        """In-place box flip (augmentor_utils.random_flip_along_{x,y})."""
        if axis == "x":  # reflect across the x axis: negate y
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
            if boxes.shape[1] > 7:  # velocity vy (augmentor_utils:23)
                boxes[:, 8] = -boxes[:, 8]
        else:  # reflect across the y axis: negate x
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = -(boxes[:, 6] + np.pi)
            if boxes.shape[1] > 7:  # velocity vx (augmentor_utils:44)
                boxes[:, 7] = -boxes[:, 7]

    def random_world_flip(self, data_dict, config):
        for axis in config["ALONG_AXIS_LIST"]:
            assert axis in ("x", "y")
            enable = bool(np.random.choice([False, True]))
            if enable:
                gt, pts = data_dict["gt_boxes"], data_dict["points"]
                self._flip_boxes(gt, axis)
                pts[:, 1 if axis == "x" else 0] = \
                    -pts[:, 1 if axis == "x" else 0]
                if data_dict.get("roi_boxes") is not None:
                    # first-stage proposals flip too (data_augmentor.py:66)
                    rb = data_dict["roi_boxes"]
                    flat = rb.reshape(-1, rb.shape[-1])
                    self._flip_boxes(flat, axis)
                    data_dict["roi_boxes"] = flat.reshape(rb.shape)
            data_dict[f"flip_{axis}"] = enable
        return data_dict

    def random_world_rotation(self, data_dict, config):
        rot_range = config["WORLD_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        noise_rot = np.random.uniform(rot_range[0], rot_range[1])
        pts = data_dict["points"]
        data_dict["points"] = rotate_points_along_z(
            pts[None], np.array([noise_rot])
        )[0]
        gt = data_dict["gt_boxes"]
        gt[:, 0:3] = rotate_points_along_z(gt[None, :, 0:3], np.array([noise_rot]))[0]
        gt[:, 6] += noise_rot
        if gt.shape[1] > 7:  # velocity (vx, vy) rotates too (augmentor_utils:64-67)
            vel3 = np.concatenate(
                [gt[:, 7:9], np.zeros((len(gt), 1), gt.dtype)], axis=1)
            gt[:, 7:9] = rotate_points_along_z(
                vel3[None], np.array([noise_rot]))[0][:, 0:2]
        if data_dict.get("roi_boxes") is not None:
            # proposals rotate with the world (data_augmentor.py:86-90)
            rb = data_dict["roi_boxes"]
            flat = rb.reshape(-1, rb.shape[-1])
            flat[:, 0:3] = rotate_points_along_z(
                flat[None, :, 0:3], np.array([noise_rot]))[0]
            flat[:, 6] += noise_rot
            if flat.shape[1] > 7:
                v3 = np.concatenate(
                    [flat[:, 7:9], np.zeros((len(flat), 1), flat.dtype)], 1)
                flat[:, 7:9] = rotate_points_along_z(
                    v3[None], np.array([noise_rot]))[0][:, 0:2]
            data_dict["roi_boxes"] = flat.reshape(rb.shape)
        data_dict["noise_rot"] = noise_rot
        return data_dict

    def random_world_scaling(self, data_dict, config):
        lo, hi = config["WORLD_SCALE_RANGE"]
        if hi - lo < 1e-3:
            return data_dict
        scale = np.random.uniform(lo, hi)
        data_dict["points"][:, :3] *= scale
        gt = data_dict["gt_boxes"]
        gt[:, :6] *= scale
        if gt.shape[1] > 7:  # velocity scales too (augmentor_utils:88-89)
            gt[:, 7:] *= scale
        if data_dict.get("roi_boxes") is not None:
            # global_scaling_with_roi_boxes:107 — xyz+dims and velocities,
            # NOT the heading column
            data_dict["roi_boxes"][..., [0, 1, 2, 3, 4, 5, 7, 8]] *= scale
        data_dict["noise_scale"] = scale
        return data_dict

    def random_world_translation(self, data_dict, config):
        """Gaussian world shift (data_augmentor.py:149-170; also shifts
        roi_boxes when present)."""
        std = config["NOISE_TRANSLATE_STD"]
        noise = np.array([
            np.random.normal(0, std[0]), np.random.normal(0, std[1]),
            np.random.normal(0, std[2]),
        ], np.float32)
        data_dict["points"][:, :3] += noise
        data_dict["gt_boxes"][:, :3] += noise
        if data_dict.get("roi_boxes") is not None:
            data_dict["roi_boxes"][..., :3] += noise
        data_dict["noise_translate"] = noise
        return data_dict

    def _in_box_mask(self, points, box):
        """Rotated in-box point mask, exact reference semantics
        (augmentor_utils.get_points_in_box:467-484): inclusive half-extent
        comparisons with a 0.1 m xy MARGIN so boundary points move with
        the box during local augmentations."""
        margin = 1e-1
        sx = points[:, 0] - box[0]
        sy = points[:, 1] - box[1]
        sz = points[:, 2] - box[2]
        cosa, sina = np.cos(-box[6]), np.sin(-box[6])
        local_x = sx * cosa - sy * sina
        local_y = sx * sina + sy * cosa
        return ((np.abs(sz) <= box[5] / 2.0)
                & (np.abs(local_x) <= box[3] / 2.0 + margin)
                & (np.abs(local_y) <= box[4] / 2.0 + margin))

    def random_local_translation(self, data_dict, config):
        """Per-box axis shifts (augmentor_utils.random_local_translation_
        along_{x,y,z}:171-235)."""
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        lo, hi = config["LOCAL_TRANSLATION_RANGE"]
        axes = {"x": 0, "y": 1, "z": 2}
        for axis in config["ALONG_AXIS_LIST"]:
            col = axes[axis]
            for idx in range(len(gt)):
                offset = np.random.uniform(lo, hi)
                mask = self._in_box_mask(pts, gt[idx])
                pts[mask, col] += offset
                gt[idx, col] += offset
        return data_dict

    def random_local_rotation(self, data_dict, config):
        """Per-box rotation about the box center (augmentor_utils.
        local_rotation:339-384, incl. the velocity-column rotation)."""
        from ..utils.common import rotate_points_along_z

        rot_range = config["LOCAL_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        for idx in range(len(gt)):
            rot = np.random.uniform(rot_range[0], rot_range[1])
            mask = self._in_box_mask(pts, gt[idx])
            center = gt[idx, :3].copy()
            pts[mask, :3] -= center
            pts[mask] = np.asarray(rotate_points_along_z(
                pts[None, mask], np.array([rot])))[0]
            pts[mask, :3] += center
            gt[idx, 6] += rot
            if gt.shape[1] > 8:
                vel3 = np.array([[gt[idx, 7], gt[idx, 8], 0.0]], np.float32)
                gt[idx, 7:9] = np.asarray(rotate_points_along_z(
                    vel3[None], np.array([rot])))[0][0, :2]
        return data_dict

    def random_local_scaling(self, data_dict, config):
        """Per-box scaling about the box center (augmentor_utils.
        local_scaling:305-336)."""
        lo, hi = config["LOCAL_SCALE_RANGE"]
        if hi - lo < 1e-3:
            return data_dict
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        for idx in range(len(gt)):
            scale = np.random.uniform(lo, hi)
            mask = self._in_box_mask(pts, gt[idx])
            center = gt[idx, :3].copy()
            pts[mask, :3] = (pts[mask, :3] - center) * scale + center
            gt[idx, 3:6] *= scale
        return data_dict

    def random_world_frustum_dropout(self, data_dict, config):
        """Global slab dropout per direction (augmentor_utils.
        global_frustum_dropout_{top,bottom,left,right}:237-303): drop
        points (and boxes) beyond a random fraction of the extent."""
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        lo, hi = config["INTENSITY_RANGE"]
        for direction in config["DIRECTION"]:
            if len(pts) == 0:
                break
            intensity = np.random.uniform(lo, hi)
            col = 2 if direction in ("top", "bottom") else 1
            vmin, vmax = pts[:, col].min(), pts[:, col].max()
            if direction in ("top", "left"):
                thr = vmax - intensity * (vmax - vmin)
                keep_p = pts[:, col] < thr
                keep_b = gt[:, col] < thr
            else:
                thr = vmin + intensity * (vmax - vmin)
                keep_p = pts[:, col] > thr
                keep_b = gt[:, col] > thr
            pts = pts[keep_p]
            if "gt_boxes_mask" in data_dict:
                data_dict["gt_boxes_mask"] = data_dict["gt_boxes_mask"][keep_b]
            if "gt_names" in data_dict:
                data_dict["gt_names"] = data_dict["gt_names"][keep_b]
            if data_dict.get("gt_boxes2d", None) is not None and len(
                    data_dict["gt_boxes2d"]) == len(gt):
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][keep_b]
            gt = gt[keep_b]
        data_dict["points"] = pts
        data_dict["gt_boxes"] = gt
        return data_dict

    def random_local_frustum_dropout(self, data_dict, config):
        """Per-box partial dropout (augmentor_utils.local_frustum_dropout_
        {top,bottom,left,right}:387-464): remove in-box points beyond a
        random fraction of the box extent along the direction."""
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        lo, hi = config["INTENSITY_RANGE"]
        for direction in config["DIRECTION"]:
            for idx in range(len(gt)):
                if len(pts) == 0:
                    break
                x, y, z, dx, dy, dz = gt[idx, :6]
                intensity = np.random.uniform(lo, hi)
                mask = self._in_box_mask(pts, gt[idx])
                if direction == "top":
                    drop = mask & (pts[:, 2] >= (z + dz / 2) - intensity * dz)
                elif direction == "bottom":
                    drop = mask & (pts[:, 2] <= (z - dz / 2) + intensity * dz)
                elif direction == "left":
                    drop = mask & (pts[:, 1] >= (y + dy / 2) - intensity * dy)
                else:
                    drop = mask & (pts[:, 1] <= (y - dy / 2) + intensity * dy)
                pts = pts[~drop]
        data_dict["points"] = pts
        return data_dict

    def random_local_pyramid_aug(self, data_dict, config):
        """SE-SSD pyramid augmentations (data_augmentor.py:259-280 /
        augmentor_utils.py:487-677): each box splits into 6 face pyramids
        (apex at the box center); per box one random pyramid may be
        DROPPED (points deleted), SPARSIFIED (subsampled to
        SPARSIFY_MAX_NUM when richer), or SWAPPED with another box's
        same-face pyramid (points carried over by their in-pyramid
        coordinates, intensities rescaled into the receiving range).
        A box takes part in at most one stage (processed pyramids leave
        the pool, :541/:576)."""
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        if len(gt) == 0:
            return data_dict
        pyramids = _box_pyramids(gt)

        # dropout (local_pyramid_dropout:528-543)
        face = np.random.randint(0, 6, len(pyramids))
        drop = np.random.uniform(0, 1, len(pyramids)) <= config["DROP_PROB"]
        if drop.any() and len(pts):
            masks = [_in_pyramid(pts, pyramids[i, face[i]])
                     for i in np.where(drop)[0]]
            pts = pts[~np.any(masks, axis=0)]
        pyramids = pyramids[~drop]

        # sparsify (local_pyramid_sparsify:546-576)
        if len(pyramids) and len(pts):
            maxn = int(config["SPARSIFY_MAX_NUM"])
            face = np.random.randint(0, 6, len(pyramids))
            sp = np.random.uniform(0, 1, len(pyramids)) \
                <= config["SPARSIFY_PROB"]
            remove = np.zeros(len(pts), bool)
            kept_parts = []
            for i in np.where(sp)[0]:
                mask = _in_pyramid(pts, pyramids[i, face[i]])
                if mask.sum() > maxn:  # only richer pyramids sparsify
                    remove |= mask
                    sel = np.random.choice(
                        np.where(mask)[0], size=maxn, replace=False)
                    kept_parts.append(pts[sel])
            if remove.any():
                pts = np.concatenate([pts[~remove]] + kept_parts)
            pyramids = pyramids[~sp]

        # swap (local_pyramid_swap:579-677)
        if len(pyramids) > 1 and len(pts):
            thres = int(config["SWAP_MAX_NUM"])
            swap = np.random.uniform(0, 1, len(pyramids)) \
                <= config["SWAP_PROB"]
            if swap.any():
                counts = np.stack([
                    [_in_pyramid(pts, pyramids[i, j]).sum()
                     for j in range(6)]
                    for i in range(len(pyramids))
                ])  # (Nb, 6)
                rich = counts > thres
                pairs = []
                taken = np.zeros_like(rich)
                for i in np.where(swap)[0]:
                    js = np.where(rich[i] & ~taken[i])[0]
                    if not len(js):
                        continue
                    j = np.random.choice(js)
                    donors = np.where(
                        rich[:, j] & ~taken[:, j]
                        & (np.arange(len(pyramids)) != i))[0]
                    if not len(donors):
                        continue  # reference self-swap fallback is a no-op
                    d = np.random.choice(donors)
                    taken[i, j] = taken[d, j] = True
                    pairs.append((i, d, j))
                if pairs:
                    remove = np.zeros(len(pts), bool)
                    new_parts = []
                    for i, d, j in pairs:
                        m_i = _in_pyramid(pts, pyramids[i, j])
                        m_d = _in_pyramid(pts, pyramids[d, j])
                        remove |= m_i | m_d
                        rng_i = (pts[m_i, -1].min(), pts[m_i, -1].max())
                        rng_d = (pts[m_d, -1].min(), pts[m_d, -1].max())
                        new_parts.append(_remap_pyramid_points(
                            pts[m_d], pyramids[d, j], pyramids[i, j], rng_i))
                        new_parts.append(_remap_pyramid_points(
                            pts[m_i], pyramids[i, j], pyramids[d, j], rng_d))
                    pts = np.concatenate([pts[~remove]] + new_parts)

        data_dict["points"] = pts
        return data_dict

    def _flip_image_with_boxes(self, data_dict):
        """Horizontal mono-image flip with calib-consistent 3D/2D box
        updates (augmentor_utils.random_image_flip_horizontal:113-156):
        box centroids are flipped in image space and lifted back through
        the calibration so camera and lidar stay geometrically aligned."""
        image = data_dict["images"]
        calib = data_dict["calib"]
        gt = data_dict["gt_boxes"]
        data_dict["images"] = np.ascontiguousarray(np.fliplr(image))
        w = image.shape[1]
        img_pts, img_depth = calib.lidar_to_img(gt[:, :3])
        img_pts[:, 0] = w - img_pts[:, 0]
        pts_rect = calib.img_to_rect(
            u=img_pts[:, 0], v=img_pts[:, 1], depth_rect=img_depth
        )
        gt[:, :3] = calib.rect_to_lidar(pts_rect)
        gt[:, 6] = -gt[:, 6]
        if data_dict.get("gt_boxes2d", None) is not None and len(
            data_dict["gt_boxes2d"]
        ):
            b2d = data_dict["gt_boxes2d"]
            b2d[:, [0, 2]] = w - b2d[:, [2, 0]]
        if "foreground" in data_dict:  # data_augmentor.py:138-139
            data_dict["foreground"] = np.ascontiguousarray(
                np.fliplr(data_dict["foreground"]))
        if "depth_maps" in data_dict:  # data_augmentor.py:140-141
            data_dict["depth_maps"] = np.ascontiguousarray(
                np.fliplr(data_dict["depth_maps"]))
        return data_dict

    def random_image_flip(self, data_dict, config):
        """Standalone probabilistic mono image flip
        (data_augmentor.random_image_flip:125-147)."""
        prob = float(config.get("PROB", 0.5))
        for cur_axis in config.get("ALONG_AXIS_LIST", ["horizontal"]):
            assert cur_axis == "horizontal"
            enable = np.random.choice(
                [False, True], replace=False, p=[1.0 - prob, prob])
            if enable:
                data_dict = self._flip_image_with_boxes(data_dict)
        return data_dict

    def random_image_flip_fusion(self, data_dict, config):
        """Flip the image iff the world was flipped (data_augmentor.py:116-123),
        keeping camera and lidar geometrically consistent."""
        if not data_dict.get("flip_x", False):
            return data_dict
        return self._flip_image_with_boxes(data_dict)

    def imgaug(self, data_dict, config):
        """Per-camera flip + rotation on the multi-cam crop stack
        (data_augmentor.imgaug:282-302), recorded in img_process_infos so
        processor.image_calibrate folds them into img_aug_matrix. PIL-free:
        the rotation is an inverse affine warp about the crop center using
        exactly the matrix image_calibrate composes."""
        imgs = data_dict.get("camera_imgs")
        if imgs is None:
            return data_dict
        imgs = np.asarray(imgs)
        infos = data_dict.get("img_process_infos")
        if infos is None:
            h, w = imgs.shape[1:3]
            infos = [[1.0, (0, 0, w, h), False, 0.0] for _ in range(len(imgs))]
            data_dict["img_process_infos"] = infos
        rot_lim = config.get("ROT_LIM", [0.0, 0.0])
        rand_flip = bool(config.get("RAND_FLIP", False))
        new_imgs = []
        for img, info in zip(imgs, infos):
            flip = bool(rand_flip and np.random.choice([0, 1]))
            rotate = float(np.random.uniform(rot_lim[0], rot_lim[1]))
            if flip:
                img = img[:, ::-1]
            if abs(rotate) > 1e-6:
                img = self._rotate_image(img, rotate)
            info[2] = flip
            info[3] = rotate
            new_imgs.append(np.ascontiguousarray(img))
        data_dict["camera_imgs"] = np.stack(new_imgs)
        return data_dict

    @staticmethod
    def _rotate_image(img, rotate_deg):
        """Rotate about the image center with the same convention
        image_calibrate uses (a = [[cos, sin], [-sin, cos]] on (u, v),
        b = center): output(q) = input(a^-1 (q - b) + b), bilinear."""
        from scipy import ndimage

        theta = rotate_deg / 180.0 * np.pi
        c, s = np.cos(theta), np.sin(theta)
        h, w = img.shape[:2]
        b_uv = np.array([w, h], np.float64) / 2
        a_inv_uv = np.array([[c, -s], [s, c]], np.float64)
        t_uv = b_uv - a_inv_uv @ b_uv
        # scipy affine_transform indexes (row=v, col=u): swap both axes
        m_vu = np.array([[a_inv_uv[1, 1], a_inv_uv[1, 0]],
                         [a_inv_uv[0, 1], a_inv_uv[0, 0]]])
        off_vu = np.array([t_uv[1], t_uv[0]])
        if img.ndim == 3:
            out = np.stack([
                ndimage.affine_transform(
                    img[..., ch].astype(np.float32), m_vu, offset=off_vu,
                    order=1, mode="constant", cval=0.0)
                for ch in range(img.shape[2])
            ], axis=-1)
        else:
            out = ndimage.affine_transform(
                img.astype(np.float32), m_vu, offset=off_vu, order=1,
                mode="constant", cval=0.0)
        return out.astype(img.dtype) if np.issubdtype(
            img.dtype, np.integer) else out

    def forward(self, data_dict):
        for fn, cfg in self.queue:
            data_dict = fn(data_dict, cfg)
        # normalize heading into [-pi, pi) (data_augmentor.forward:318-320)
        gt = data_dict.get("gt_boxes")
        if gt is not None and len(gt):
            gt[:, 6] = gt[:, 6] - np.floor(gt[:, 6] / (2 * np.pi) + 0.5) * 2 * np.pi
        data_dict.pop("road_plane", None)
        # apply the in-class-names mask last (data_augmentor.forward:325-332)
        if "gt_boxes_mask" in data_dict:
            mask = data_dict.pop("gt_boxes_mask")
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            data_dict["gt_names"] = data_dict["gt_names"][mask]
            if "gt_boxes2d" in data_dict and data_dict["gt_boxes2d"] is not None:
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][mask]
        return data_dict
