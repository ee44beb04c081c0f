"""Native C++ rotated-IoU kernel: build, parity vs numpy oracle, dispatch."""
import numpy as np
import pytest

from hgsfusion_tpu.native import native_available, rotate_iou_native
from hgsfusion_tpu.eval.rotated_iou_np import (
    rotate_iou_eval,
    rotate_iou_eval_np,
)


needs_native = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable: numpy fallback in use"
)


def _random_boxes(rng, n):
    b = np.zeros((n, 5))
    b[:, 0] = rng.uniform(-20, 20, n)
    b[:, 1] = rng.uniform(-20, 20, n)
    b[:, 2] = rng.uniform(0.5, 6.0, n)
    b[:, 3] = rng.uniform(0.5, 6.0, n)
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestNativeRotateIoU:
    @needs_native
    @pytest.mark.parametrize("criterion", [-1, 0, 1, 2])
    def test_parity_random(self, rng, criterion):
        a = _random_boxes(rng, 40)
        b = _random_boxes(rng, 37)
        got = rotate_iou_native(a, b, criterion)
        want = rotate_iou_eval_np(a, b, criterion)
        np.testing.assert_allclose(got, want, atol=1e-9)

    @needs_native
    def test_identical_and_touching(self):
        a = np.array([[0, 0, 4, 2, 0.3]])
        np.testing.assert_allclose(rotate_iou_native(a, a, -1), [[1.0]], atol=1e-12)
        # edge-touching axis-aligned boxes: zero overlap
        t = np.array([[0, 0, 2, 2, 0.0], [2, 0, 2, 2, 0.0]])
        iou = rotate_iou_native(t, t, -1)
        assert abs(iou[0, 1]) < 1e-12 and abs(iou[0, 0] - 1) < 1e-12

    @needs_native
    def test_contained_and_degenerate(self):
        a = np.array([[0, 0, 10, 10, 0.5]])
        b = np.array([[0, 0, 1, 1, -0.7], [5, 5, 0, 0, 0]])  # inside; zero-area
        out = rotate_iou_native(a, b, 2)  # raw intersection
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-9)
        assert out[0, 1] == 0.0

    @needs_native
    def test_empty_inputs(self):
        a = np.zeros((0, 5))
        b = _random_boxes(np.random.RandomState(0), 3)
        assert rotate_iou_native(a, b, -1).shape == (0, 3)
        assert rotate_iou_native(b, a, -1).shape == (3, 0)

    def test_dispatch_path_consistent(self, rng):
        """Public rotate_iou_eval (native or fallback) equals the oracle."""
        a = _random_boxes(rng, 12)
        b = _random_boxes(rng, 9)
        np.testing.assert_allclose(
            rotate_iou_eval(a, b, -1), rotate_iou_eval_np(a, b, -1), atol=1e-9
        )

    @needs_native
    def test_ap_pipeline_native_equals_numpy(self, rng):
        """Full eval_class AP with native IoU == with numpy IoU."""
        from hgsfusion_tpu.eval import kitti_ap

        def fake_frame(seed, n_gt, n_det):
            r = np.random.RandomState(seed)
            gt = {
                "name": np.array(["Car"] * n_gt),
                "truncated": np.zeros(n_gt),
                "occluded": np.zeros(n_gt, np.int64),
                "bbox": np.tile([0, 0, 100, 60.0], (n_gt, 1)),
                "dimensions": np.tile([3.9, 1.56, 1.6], (n_gt, 1)),
                "location": np.stack(
                    [r.uniform(-10, 10, n_gt), np.ones(n_gt),
                     r.uniform(5, 40, n_gt)], 1
                ),
                "rotation_y": r.uniform(-np.pi, np.pi, n_gt),
                "alpha": np.zeros(n_gt),
                "difficulty": np.zeros(n_gt, np.int64),
            }
            det = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                   for k, v in gt.items()}
            idx = r.permutation(n_gt)[:n_det]
            for k in ["bbox", "dimensions", "location"]:
                det[k] = det[k][idx]
            for k in ["name", "truncated", "occluded", "rotation_y", "alpha"]:
                det[k] = det[k][idx]
            det["location"] = det["location"] + r.randn(n_det, 3) * 0.1
            det["score"] = r.uniform(0.1, 1.0, n_det)
            del det["difficulty"]
            return gt, det

        frames = [fake_frame(s, 45, 40) for s in range(3)]
        gts = [f[0] for f in frames]
        dets = [f[1] for f in frames]

        import hgsfusion_tpu.native as nat
        from hgsfusion_tpu.eval.vod_eval import make_clean_data

        min_ov = np.array([[[0.5], [0.5], [0.5]]])  # 1 tier x 3 metrics x 1 cls

        def run():
            ret = kitti_ap.eval_class(
                gts, dets, make_clean_data(roi_clean=False), [0], [0],
                metric=2, min_overlaps=min_ov,
            )
            return kitti_ap.get_map_r40(ret["precision"])

        ap_native = run()
        lib, tried = nat._LIB, nat._TRIED
        nat._LIB, nat._TRIED = None, True  # force numpy fallback
        try:
            ap_numpy = run()
        finally:
            nat._LIB, nat._TRIED = lib, tried
        assert float(np.asarray(ap_native).sum()) > 0  # non-degenerate AP
        np.testing.assert_allclose(ap_native, ap_numpy, atol=1e-9)
