"""Shape contract vs SURVEY.md Appendix A (reference tensor-flow table).

Asserts the full-VoD-scale HGSFusion intermediate shapes match the
reference's, via jax.eval_shape + capture_intermediates — pure tracing,
no compute, so the full 516x1936 / 320x320x31 model checks in seconds on
CPU. Layouts here are NHWC/Y-X-Z where the torch reference is NCHW; the
table maps dimension-for-dimension.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hgsfusion_tpu.config import load_config, model_config_from_yaml
from hgsfusion_tpu.models.detector import HGSFusionModel


def _flagship_batch_shapes(b=1, n=8192, hw=(516, 1936)):
    return {
        "points": jax.ShapeDtypeStruct((b, n, 17), jnp.float32),
        "points_valid": jax.ShapeDtypeStruct((b, n), jnp.bool_),
        "images": jax.ShapeDtypeStruct((b, *hw, 3), jnp.float32),
        "trans_lidar_to_cam": jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
        "trans_cam_to_img": jax.ShapeDtypeStruct((b, 3, 4), jnp.float32),
        "lidar_aug_matrix": jax.ShapeDtypeStruct((b, 4, 4), jnp.float32),
        "gt_boxes": jax.ShapeDtypeStruct((b, 64, 8), jnp.float32),
    }


class TestAppendixAShapeContract:
    def test_vod_flagship_shapes(self):
        cfg = model_config_from_yaml(load_config("configs/hgsfusion_vod.yaml"))
        model = HGSFusionModel(cfg=cfg)
        batch = _flagship_batch_shapes()

        # grid_size [X=320, Y=320, Z=31] (Appendix A "Grids")
        assert cfg.grid_size == (320, 320, 31)
        # 3 classes x 2 rotations x 1 size = 6 anchors/loc; 320*320*6 = 614400
        assert cfg.num_anchors_per_location == 6

        variables = jax.eval_shape(
            lambda b: model.init(jax.random.PRNGKey(0), b, False), batch
        )

        def fwd(v, b):
            return model.apply(
                v, b, False, capture_intermediates=True, mutable=["intermediates"]
            )

        preds, inter = jax.eval_shape(fwd, variables, batch)
        inter = inter["intermediates"]

        def shape_of(path):
            node = inter
            for p in path:
                node = node[p]
            return node["__call__"][0].shape

        # DDN taps: layer1 (B,129,484,256), layers2-4 at /8 with DeepLab
        # dilation (B,65,242,512/1024/2048) — Appendix A "DDN feats"
        taps = inter["ddn_backbone"]["__call__"][0]
        assert [t.shape for t in taps] == [
            (1, 129, 484, 256), (1, 65, 242, 512),
            (1, 65, 242, 1024), (1, 65, 242, 2048),
        ]
        # reduced feats x4: 64 channels each
        for i in range(4):
            assert shape_of([f"channel_reduce_{i}"])[-1] == 64

        # frustum voxel volume: (B, Y, X, Z, 128) == torch (B,128,31,320,320)
        assert shape_of(["f2v"]) == (1, 320, 320, 31, 128)
        # image BEV after collapse: (B,320,320,128) == torch (B,128,320,320)
        assert shape_of(["map_to_bev"]) == (1, 320, 320, 128)
        # radar BEV (full pillar grid, NOT the stale 160^2 comments)
        assert shape_of(["radar_backbone"]) == (1, 320, 320, 128)
        # occupancy-gated fusion output: (B,320,320,256)
        assert shape_of(["fusion_after_bev"]) == (1, 320, 320, 256)

        # head preds NHWC: cls (B,320,320,18), box (...,42), dir (...,12)
        assert preds["cls_preds"].shape == (1, 320, 320, 18)
        assert preds["box_preds"].shape == (1, 320, 320, 42)
        assert preds["dir_cls_preds"].shape == (1, 320, 320, 12)

    def test_anchor_count_614400(self):
        from hgsfusion_tpu.config import load_config
        from hgsfusion_tpu.models.anchors import TargetAssigner

        cfg = load_config("configs/hgsfusion_vod.yaml")
        mc = model_config_from_yaml(cfg)
        assigner = TargetAssigner(
            [dict(c) for c in cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
            mc.grid_size, mc.pc_range, class_names=mc.class_names,
        )
        assert assigner.flat_anchors.shape == (614400, 7)

    def test_tj4d_grid(self):
        cfg = model_config_from_yaml(load_config("configs/hgsfusion_tj4d.yaml"))
        # Appendix A: TJ4D [216, 248, 19], 31 reader input features, 4 classes
        assert cfg.grid_size == (216, 248, 19)
        assert cfg.reader_num_input == 31
        assert cfg.num_class == 4
