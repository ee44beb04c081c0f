import numpy as np
import jax.numpy as jnp

from hgsfusion_tpu.utils import box_utils
from hgsfusion_tpu.utils.box_coder import ResidualCoder
from hgsfusion_tpu.utils.common import limit_period, rotate_points_along_z


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 10.0])
    out = limit_period(vals, offset=0.5, period=np.pi)
    assert np.all(out >= -np.pi / 2 - 1e-6)
    assert np.all(out < np.pi / 2 + 1e-6)
    # torch formula: val - floor(val/period + offset) * period
    expected = vals - np.floor(vals / np.pi + 0.5) * np.pi
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_rotate_points_along_z():
    pts = np.array([[[1.0, 0.0, 0.5, 7.0]]])
    out = rotate_points_along_z(pts, np.array([np.pi / 2]))
    # x toward y: (1, 0) rotated +90deg -> (0, 1)
    np.testing.assert_allclose(out[0, 0, :3], [0.0, 1.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 3], 7.0)


def test_corners_3d_axis_aligned():
    boxes = np.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]])
    corners = box_utils.boxes_to_corners_3d(boxes)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(axis=0), [-1.0, 1.0, 2.5], atol=1e-6)
    np.testing.assert_allclose(corners[0].max(axis=0), [3.0, 3.0, 3.5], atol=1e-6)


def test_corners_bev_ccw():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.3]])
    c = box_utils.boxes_to_corners_bev(boxes)[0]
    # shoelace must be positive (CCW)
    area = 0.5 * np.sum(c[:, 0] * np.roll(c[:, 1], -1) - c[:, 1] * np.roll(c[:, 0], -1))
    assert area > 0
    np.testing.assert_allclose(area, 2.0, atol=1e-5)


def test_nearest_bev_iou_matches_axis_aligned():
    # heading 0 boxes: nearest-bev iou == plain axis-aligned iou
    a = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]])
    b = np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]])
    iou = box_utils.boxes3d_nearest_bev_iou(a, b)
    np.testing.assert_allclose(iou, [[2.0 / 6.0]], atol=1e-5)
    # heading pi/2 swaps dims
    b90 = np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 1.0, np.pi / 2]])
    iou90 = box_utils.boxes3d_nearest_bev_iou(a, b90)
    np.testing.assert_allclose(iou90, iou, atol=1e-5)


def test_residual_coder_roundtrip(rng):
    coder = ResidualCoder()
    anchors = jnp.array(
        np.concatenate(
            [
                rng.uniform(-10, 10, (32, 3)),
                rng.uniform(0.5, 4.0, (32, 3)),
                rng.uniform(-np.pi, np.pi, (32, 1)),
            ],
            axis=1,
        ).astype(np.float32)
    )
    boxes = jnp.array(
        np.concatenate(
            [
                rng.uniform(-10, 10, (32, 3)),
                rng.uniform(0.5, 4.0, (32, 3)),
                rng.uniform(-np.pi, np.pi, (32, 1)),
            ],
            axis=1,
        ).astype(np.float32)
    )
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(boxes), rtol=1e-4, atol=1e-4)


def test_camera_lidar_roundtrip():
    from hgsfusion_tpu.utils.calibration import Calibration

    calib = Calibration(
        {
            "P2": np.array(
                [[700.0, 0, 600, 45.0], [0, 700, 180, -0.3], [0, 0, 1, 0.005]],
                dtype=np.float32,
            ),
            "P3": np.zeros((3, 4), dtype=np.float32),
            "R0": np.eye(3, dtype=np.float32),
            "Tr_velo2cam": np.array(
                [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3]], dtype=np.float32
            ),
        }
    )
    lidar_boxes = np.array([[10.0, 2.0, -0.5, 3.9, 1.6, 1.56, 0.4]], dtype=np.float32)
    cam = box_utils.boxes3d_lidar_to_kitti_camera(lidar_boxes, calib)
    back = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
    np.testing.assert_allclose(back[:, :6], lidar_boxes[:, :6], atol=1e-4)
    # headings equal modulo 2*pi
    dh = (back[:, 6] - lidar_boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dh, 0.0, atol=1e-4)
