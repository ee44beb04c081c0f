"""Standalone interactive 3D HTML export (utils/visual_3d.py) — the
TPU-host equivalent of the reference's open3d demo window
(reference tools/demo.py:23-112)."""
import json
import re

import numpy as np

from hgsfusion_tpu.utils.visual_3d import export_html


def _scene_json(html: str):
    m = re.search(
        r'<script id="scene" type="application/json">(.*?)</script>',
        html, re.S)
    assert m, "inlined scene JSON missing"
    return json.loads(m.group(1))


class TestExportHtml:
    def test_single_file_with_scene_and_interaction(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.randn(500, 4).astype(np.float32) * [10, 10, 2, 1]
        gt = np.array([[5.0, 2.0, -0.5, 4.0, 1.8, 1.6, 0.3]], np.float32)
        pred = np.array([[5.1, 2.1, -0.4, 4.1, 1.7, 1.5, 0.25],
                         [-3.0, 4.0, -0.6, 0.8, 0.7, 1.7, 1.2]], np.float32)
        out = export_html(tmp_path / "f.html", pts, gt_boxes=gt,
                          pred_boxes=pred, pred_scores=[0.9, 0.4],
                          title="frame 7")
        html = out.read_text()
        scene = _scene_json(html)
        assert len(scene["points"]) == 500
        assert len(scene["points"][0]) == 4  # xyz + color01
        assert len(scene["gt_boxes"]) == 1
        assert len(scene["pred_boxes"]) == 2
        assert all(len(c) == 8 and len(c[0]) == 3
                   for c in scene["gt_boxes"] + scene["pred_boxes"])
        assert scene["pred_scores"] == [0.9, 0.4]
        assert scene["extent"] > 1.0
        # the interaction handlers ship inline — no external resources
        for needle in ("mousedown", "wheel", "keydown", "requestAnimationFrame"):
            assert needle in html, needle
        assert "http://" not in html and "https://" not in html

    def test_max_points_downsampling_and_no_boxes(self, tmp_path):
        pts = np.random.RandomState(1).randn(1000, 3).astype(np.float32)
        out = export_html(tmp_path / "g.html", pts, max_points=128)
        scene = _scene_json(out.read_text())
        assert len(scene["points"]) == 128
        assert scene["gt_boxes"] == [] and scene["pred_boxes"] == []
        assert scene["pred_scores"] is None

    def test_color_falls_back_to_height(self, tmp_path):
        # constant 4th column -> color from z
        pts = np.zeros((10, 4), np.float32)
        pts[:, 2] = np.arange(10)
        pts[:, 3] = 5.0
        scene = _scene_json(
            export_html(tmp_path / "h.html", pts).read_text())
        c = [p[3] for p in scene["points"]]
        assert c[0] == 0.0 and c[-1] == 1.0

    def test_empty_frame_and_hostile_title(self, tmp_path):
        # zero points (fully-masked frame) must still render a boxes-only
        # viewer, and markup in the title must not escape its contexts
        gt = np.array([[1.0, 2.0, 0.0, 4.0, 1.8, 1.6, 0.0]], np.float32)
        out = export_html(tmp_path / "e.html", np.zeros((0, 4), np.float32),
                          gt_boxes=gt, title="frame </script><b>")
        html = out.read_text()
        scene = _scene_json(html)
        assert scene["points"] == []
        assert len(scene["gt_boxes"]) == 1
        assert scene["extent"] == 1.0
        # '<' never appears raw in the inline JSON or the <title>
        assert "</script><b>" not in html
        assert scene["title"] == "frame </script><b>"  # round-trips intact
