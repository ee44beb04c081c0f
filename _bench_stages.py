"""Per-stage roofline decomposition of the flagship forward + postprocess.

The composite-path tool for the 54-FPS question (VERDICT r2 #2): times each
top-level stage of HGSFusionModel as its own jitted graph, for any config
and batch size, so a single chip run yields the table "which stage holds
the residual at this B". Stage modules below mirror the detector wiring
(hgsfusion_tpu/models/detector.py:200-329) with IDENTICAL module names, so
the full model's variables apply directly and stage outputs equal the real
intermediates (cross-checked: sum(stages) should ~= the full forward — a
single TPU core runs one program with no stream overlap, BASELINE.md
"Stage overlap").

Usage (on the chip; each jitted stage pays its own remote compile):
  python _bench_stages.py [--cfg configs/hgsfusion_vod_pallas.yaml] [--batch N]

Prints one line per stage plus a final JSON summary for the log parser.
"""
from __future__ import annotations

import json
import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.config import load_config
from hgsfusion_tpu.models.anchor_head import AnchorHeadSingle
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.models.bev_encoder import PillarNetRadar
from hgsfusion_tpu.models.detector import post_process
from hgsfusion_tpu.models.frustum import (
    FrustumGridGenerator,
    FrustumToVoxelMultiScale,
)
from hgsfusion_tpu.models.fusion_bev import FusionAfterBEVSE
from hgsfusion_tpu.models.layers import ConvBNReLU
from hgsfusion_tpu.models.occupancy import Conv2DCollapse, RadarOccupancy2D
from hgsfusion_tpu.models.pillar_encoder import PillarFeatureNet
from hgsfusion_tpu.models.resnet import (
    ResNetDeepLabBackbone,
    preprocess_images,
)

ITERS = 10  # --iters N for CPU smoke runs


class CameraStage(nn.Module):
    """preprocess + DDN backbone + per-scale channel reduce -> feats list."""

    cfg: object

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        stage_sizes = (
            (3, 4, 23, 3) if cfg.image_backbone == "ResNet101" else (3, 4, 6, 3)
        )
        taps = ResNetDeepLabBackbone(
            stage_sizes=stage_sizes, dtype=cfg.dtype, name="ddn_backbone"
        )(preprocess_images(images), False)
        return [
            ConvBNReLU(
                cfg.channel_reduce_out, kernel_size=(1, 1), use_bias=False,
                dtype=cfg.dtype, name=f"channel_reduce_{i}",
            )(t, False)
            for i, t in enumerate(taps)
        ]


class F2VStage(nn.Module):
    """frustum grid gen + multi-scale sample/reduce -> (B,Y,X,Z,C) voxel."""

    cfg: object

    @nn.compact
    def __call__(self, feats, l2c, c2i, bda):
        cfg = self.cfg
        grid = FrustumGridGenerator(
            grid_size=cfg.grid_size, pc_range=cfg.pc_range,
            disc_cfg=cfg.disc_cfg, bev_aug=cfg.bev_aug,
        )(l2c, c2i, cfg.image_size, bda=bda)
        return FrustumToVoxelMultiScale(
            out_channels=cfg.f2v_out_channels, dtype=cfg.dtype,
            num_depth_bins=cfg.disc_num_bins, quant=cfg.f2v_quant,
            sampler_kernel=cfg.f2v_sampler_kernel, name="f2v",
        )(feats, grid, False, None)


class PolarF2VStage(nn.Module):
    """polar-factorized f2v + Z-collapse (models/polar_f2v.py) -> image_bev.

    Under F2V.VIEW polar the voxel volume never exists; this stage covers
    what F2VStage + the collapse half of FuseHeadStage cover on the gather
    path, so compare it against f2v + the collapse share of fuse_head."""

    cfg: object

    @nn.compact
    def __call__(self, feats, l2c, c2i, bda):
        from hgsfusion_tpu.models.polar_f2v import (
            _CollapseScope,
            _F2VScope,
            polar_image_bev,
        )

        cfg = self.cfg
        return polar_image_bev(
            _F2VScope(sum_channels=sum(f.shape[-1] for f in feats),
                      out_channels=cfg.f2v_out_channels, dtype=cfg.dtype,
                      name="f2v"),
            _CollapseScope(in_channels=cfg.f2v_out_channels,
                           nz=cfg.grid_size[2],
                           out_channels=cfg.radar_input_channels,
                           dtype=cfg.dtype, name="map_to_bev"),
            feats, l2c, c2i, cfg.image_size, bda, False,
            grid_size=cfg.grid_size, pc_range=cfg.pc_range,
            zeta_bins=cfg.f2v_polar_zeta_bins,
            near_columns=cfg.f2v_polar_near_columns,
            bev_aug=cfg.bev_aug, dtype=cfg.dtype,
        )


class RadarStage(nn.Module):
    """pillar VFE + radar BEV backbone -> radar_bev."""

    cfg: object

    @nn.compact
    def __call__(self, points, points_valid):
        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=cfg.reader_num_input,
            pillar_size=cfg.voxel_size[0], pc_range=cfg.pc_range,
            dtype=cfg.dtype, name="pillar_net",
        )(points, points_valid, False)
        return PillarNetRadar(
            out_indices=cfg.backbone_out_indices,
            neck_out_channels=cfg.neck_out_channels,
            dtype=cfg.dtype, name="radar_backbone",
        )(pillar_bev, occ_mask, False)


class FuseHeadStage(nn.Module):
    """collapse + occupancy gate + SE fusion + anchor head -> preds."""

    cfg: object
    # True when the input is already the collapsed image BEV (polar view:
    # PolarF2VStage emits it; the collapse lives in that stage instead)
    takes_image_bev: bool = False

    @nn.compact
    def __call__(self, voxel, radar_bev):
        cfg = self.cfg
        if self.takes_image_bev:
            image_bev = voxel
        else:
            image_bev = Conv2DCollapse(
                num_bev_features=cfg.radar_input_channels, dtype=cfg.dtype,
                name="map_to_bev",
            )(voxel, False)
        gated, occupancy = RadarOccupancy2D(
            radar_input_channels=cfg.radar_input_channels,
            use_aspp=cfg.use_aspp, aspp_dilation=cfg.aspp_dilation,
            aspp_dilations=cfg.aspp_dilations, use_dcn=cfg.use_dcn,
            use_mask=cfg.occ_use_mask, fuse_mode=cfg.occ_fuse_mode,
            dtype=cfg.dtype, name="radar_occupancy",
        )(image_bev, radar_bev, False)
        fused = FusionAfterBEVSE(
            image_out_channels=cfg.fusion_image_out,
            radar_out_channels=cfg.fusion_radar_out,
            dtype=cfg.dtype, name="fusion_after_bev",
        )(gated, radar_bev, False)
        preds = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size, num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(fused)
        preds["occupancy"] = occupancy
        return preds


def _first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def timed(name, fn, *args, iters=None):
    iters = ITERS if iters is None else iters
    out = fn(*args)  # compile
    _ = float(jnp.sum(_first_leaf(out).astype(jnp.float32)))
    best = []
    for _ in range(3 if iters > 1 else 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(_first_leaf(out).astype(jnp.float32)))
        best.append((time.perf_counter() - t0) / iters)
    ms = sorted(best)[len(best) // 2] * 1e3
    print(f"STAGE {name}: {ms:.1f} ms  (median of {len(best)} x {iters} "
          "chained)", flush=True)
    return ms


def main():
    global ITERS
    cfg_path = "configs/hgsfusion_vod.yaml"
    bsz = 1
    image_hw = (516, 1936)
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--cfg":
            cfg_path = args.pop(0)
        elif a == "--batch":
            bsz = int(args.pop(0))
        elif a == "--iters":
            ITERS = int(args.pop(0))
        elif a == "--image_hw":  # CPU smoke: shrink the camera branch
            image_hw = (int(args.pop(0)), int(args.pop(0)))
        else:
            raise SystemExit(f"unknown arg {a}")

    model, cfg, batch = _vod_flagship(config_path=cfg_path, b=bsz,
                                      image_hw=image_hw)
    if cfg.use_depth:
        raise SystemExit("stage bench assumes USE_DEPTH False (flagships)")
    yaml_cfg = load_config(cfg_path)
    assigner = TargetAssigner(
        [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
        cfg.grid_size, cfg.pc_range, class_names=cfg.class_names,
    )
    post_cfg = yaml_cfg.MODEL.POST_PROCESSING

    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)

    cam = jax.jit(lambda v, img: CameraStage(cfg).apply(v, img))
    polar = getattr(cfg, "f2v_view", "gather") == "polar"
    f2v_mod = PolarF2VStage(cfg) if polar else F2VStage(cfg)
    f2v = jax.jit(
        lambda v, f, l2c, c2i, bda: f2v_mod.apply(v, f, l2c, c2i, bda))
    radar = jax.jit(lambda v, p, pv: RadarStage(cfg).apply(v, p, pv))
    fuse_mod = FuseHeadStage(cfg, takes_image_bev=polar)
    fuse = jax.jit(lambda v, vox, rb: fuse_mod.apply(v, vox, rb))
    full = jax.jit(lambda v, b: model.apply(v, b, False))

    @jax.jit
    def post(preds):
        return post_process(
            preds, assigner.flat_anchors, assigner.box_coder, cfg,
            score_thresh=post_cfg.SCORE_THRESH,
            nms_thresh=post_cfg.NMS_CONFIG.NMS_THRESH,
            pre_max_size=post_cfg.NMS_CONFIG.NMS_PRE_MAXSIZE,
            post_max_size=post_cfg.NMS_CONFIG.NMS_POST_MAXSIZE,
        )

    # real intermediates (stage modules share names with the detector, so
    # the full variables apply directly and outputs equal the model's own)
    feats = cam(variables, batch["images"])
    l2c, c2i = batch["trans_lidar_to_cam"], batch["trans_cam_to_img"]
    bda = batch["lidar_aug_matrix"]
    voxel = f2v(variables, feats, l2c, c2i, bda)
    radar_bev = radar(variables, batch["points"], batch["points_valid"])
    preds = full(variables, batch)

    ms = {
        "camera": timed("camera (preprocess+DDN+reduce)", cam, variables,
                        batch["images"]),
        "f2v": timed(
            "f2v (polar resample + collapse -> image_bev)" if polar
            else "f2v (grid gen + sample/reduce)",
            f2v, variables, feats, l2c, c2i, bda),
        "radar": timed("radar (pillar VFE + BEV backbone)", radar, variables,
                       batch["points"], batch["points_valid"]),
        "fuse_head": timed(
            "fuse_head (occ+SE+head)" if polar
            else "fuse_head (collapse+occ+SE+head)",
            fuse, variables, voxel, radar_bev),
        "post": timed("post_process (decode+NMS)", post, preds),
        "full_forward": timed("full forward (model.apply)", full, variables,
                              batch),
    }
    ms["stage_sum"] = round(
        ms["camera"] + ms["f2v"] + ms["radar"] + ms["fuse_head"], 1)
    ms["e2e_per_frame"] = round((ms["full_forward"] + ms["post"]) / bsz, 1)
    print(json.dumps({"metric": "stage_breakdown", "config": cfg_path,
                      "batch": bsz, "ms": {k: round(v, 1)
                                           for k, v in ms.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
