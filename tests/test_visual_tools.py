"""Per-dataset visualization scripts (tools/visual_tools/*, reference's
4 renderers) driven end-to-end on a synthetic tree + synthetic result.pkl."""
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _tree_with_results(tmp_path):
    from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti

    root = tmp_path / "tree"
    make_synthetic_kitti(root, num_frames=2, num_points=64,
                         image_hw=(64, 96))
    from test_datasets import _small_vod_cfg

    from hgsfusion_tpu.datasets.vod import VODDataset

    ds = VODDataset(_small_vod_cfg(root),
                    class_names=["Car", "Pedestrian", "Cyclist"],
                    training=False)
    ds.create_infos(splits=("train", "val"))
    infos = np.load(root / "kitti_infos_val.pkl", allow_pickle=True)
    det = []
    for info in infos:
        ann = info["annos"]
        det.append({
            "frame_id": info["image"]["image_idx"],
            "name": np.asarray(ann["name"]),
            "score": np.full(len(ann["name"]), 0.9, np.float32),
            "location": np.asarray(ann["location"]),
            "dimensions": np.asarray(ann["dimensions"]),
            "rotation_y": np.asarray(ann["rotation_y"]),
            "boxes_lidar": np.asarray(ann["gt_boxes_lidar"]),
        })
    result_pkl = tmp_path / "result.pkl"
    with open(result_pkl, "wb") as f:
        pickle.dump(det, f)
    return root, result_pkl


def test_vod_graps_renderer_end_to_end(tmp_path):
    root, result_pkl = _tree_with_results(tmp_path)
    out = tmp_path / "vis"
    r = subprocess.run(
        [sys.executable,
         str(REPO / "tools/visual_tools/visual_result_vod_graps.py"),
         "--data_root", str(root), "--result_pkl", str(result_pkl),
         "--save_path", str(out), "--virtual_prefix", "virtual_points",
         "--frame_stride", "1"],
        capture_output=True, text=True, cwd=str(REPO),
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "", "HOME": "/root",
             "PYTHONPATH": str(REPO), "MPLBACKEND": "Agg"},
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    pngs = sorted(p.name for p in out.glob("*.png"))
    # 2 frames x {3d_gt, bev_gt, 3d_dt, bev_dt}
    assert len(pngs) == 8, pngs
    assert "00000_3d_gt.png" in pngs and "00001_bev_dt.png" in pngs
    assert all((out / p).stat().st_size > 1000 for p in pngs)


def test_gt_sweep_renderer(tmp_path):
    """tools/visual_tj4d.py equivalent: gt-only sweep over an infos file
    (reference tools/visual_tj4d.py plot_points_gt loop)."""
    root, _ = _tree_with_results(tmp_path)
    from hgsfusion_tpu.utils.visual_gt import render_gt

    n = render_gt(root, tmp_path / "gt", ("Car", "Pedestrian", "Cyclist"),
                  infos_name="kitti_infos_val.pkl", image_ext=".jpg",
                  radar_dims=7)
    assert n == 2
    pngs = sorted(p.name for p in (tmp_path / "gt").glob("*.png"))
    assert len(pngs) == 4  # 2 frames x {gt, gt_bev}
    assert "00000_gt.png" in pngs and "00001_gt_bev.png" in pngs


def test_vod_baseline_renderer_in_process(tmp_path):
    root, result_pkl = _tree_with_results(tmp_path)
    from hgsfusion_tpu.utils.visual import render_results

    n = render_results(root, result_pkl, tmp_path / "vis2",
                       ("Car", "Pedestrian", "Cyclist"), image_ext=".jpg",
                       radar_dims=7, virtual_prefix=None, frame_stride=1)
    assert n == 2
    assert len(list((tmp_path / "vis2").glob("*.png"))) == 8


def test_gt_boxes_survive_score_minus_one_and_dt_fig_overlays_gt(
        tmp_path, monkeypatch):
    """Regressions caught by review: (a) gt annos always carry score = -1.0
    (kitti_base.py:32) and must NOT be score-filtered out of the gt
    figures; (b) the bev_dt figure overlays the filled gt boxes under the
    dt outlines (visual_result_vod_graps.py:318-320)."""
    root, result_pkl = _tree_with_results(tmp_path)
    import hgsfusion_tpu.utils.visual as V
    from hgsfusion_tpu.utils.calibration import Calibration

    infos = np.load(root / "kitti_infos_val.pkl", allow_pickle=True)
    ann = V.clean_gt_annos(infos[0]["annos"])
    assert (np.asarray(ann["score"]) == -1.0).all()  # gt convention
    calib = Calibration(
        root / "training/calib" / f"{infos[0]['image']['image_idx']}.txt")
    n_cls = int(np.isin(
        ann["name"], ["Car", "Pedestrian", "Cyclist"]).sum())
    assert n_cls > 0
    boxes, names, _, keep = V._camera_annos_to_lidar(
        ann, calib, ("Car", "Pedestrian", "Cyclist"))
    assert len(boxes) == n_cls  # not dropped by their -1 scores

    calls = []
    orig = V.draw_boxes_bev

    def rec(ax, boxes, color=V.GT_COLOR, facecolor=None):
        calls.append((len(np.asarray(boxes)), facecolor is not None))
        return orig(ax, boxes, color=color, facecolor=facecolor)

    monkeypatch.setattr(V, "draw_boxes_bev", rec)
    V.render_results(root, result_pkl, tmp_path / "v",
                     ("Car", "Pedestrian", "Cyclist"), image_ext=".jpg",
                     radar_dims=7, frame_stride=1)
    # per frame: bev_gt (outline), bev_dt underlay (filled), bev_dt (dt)
    assert any(filled for _, filled in calls), calls
    assert len(calls) == 3 * 2, calls
