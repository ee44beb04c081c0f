"""HGSFusion detector: camera + radar branches, DSM fusion, anchor head.

Assembles the active model path of the shipped configs
(tools/cfgs/hgsfusion/hgsfusion_vod.yaml MODEL section; module topology
fusion_vfe -> fusion_after_bev -> dense_head, detector3d_template.py:23-26):

  images --DDN backbone--> 4 taps --1x1 reduce--> frustum sample -> voxel
  points --pillar encode--> sparse-equiv BEV encoder --FPN--> radar BEV
  voxel --collapse--> image BEV --x occupancy(radar BEV)--> spatial sync
  concat+SE --> fused BEV --> anchor head

This module is a pure function of (params, batch); losses and NMS are
separate pure functions so the train step and the inference step compose
freely under jit/pjit.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .anchor_head import AnchorHeadSingle, generate_predicted_boxes
from .bev_encoder import PillarNetRadar
from .frustum import FrustumGridGenerator, FrustumToVoxelMultiScale
from .fusion_bev import FusionAfterBEVSE
from .layers import ConvBNReLU
from .occupancy import Conv2DCollapse, RadarOccupancy2D
from .pillar_encoder import PillarFeatureNet
from .resnet import ResNetDeepLabBackbone, preprocess_images


@dataclasses.dataclass(frozen=True)
class HGSFusionConfig:
    """Static model configuration (mirrors the reference YAML semantics)."""

    class_names: Tuple[str, ...] = ("Car", "Pedestrian", "Cyclist")
    pc_range: Tuple[float, ...] = (0.0, -25.6, -3.0, 51.2, 25.6, 2.0)
    voxel_size: Tuple[float, ...] = (0.16, 0.16, 0.16)
    # image branch
    image_backbone: str = "ResNet101"
    # DDN backbone quantization ("none" | "w8a8"): int8 convs for the
    # FROZEN COCO backbone (resnet.QConv8) — eval-only serving knob
    ddn_quant: str = "none"
    channel_reduce_out: int = 64
    f2v_out_channels: int = 128
    # f2v gather-payload quantization ("none" | "int8"); see
    # FrustumToVoxelMultiScale.quant
    f2v_quant: str = "none"
    # f2v sampler kernel ("xla" | "pallas"); see
    # FrustumToVoxelMultiScale.sampler_kernel
    f2v_sampler_kernel: str = "xla"
    # f2v view-transform formulation ("gather" | "polar"): "polar" runs
    # the polar-factorized f2v + Z-collapse (polar_f2v.py) — ~30x fewer
    # gather rows, no voxel-volume materialization; sub-pixel resampling
    # approximations documented in that module
    f2v_view: str = "gather"
    f2v_polar_zeta_bins: int = 128
    f2v_polar_near_columns: int = 20
    disc_mode: str = "LID"
    disc_num_bins: int = 80
    disc_depth_min: float = 1.0
    disc_depth_max: float = 51.2
    bev_aug: bool = True
    image_size: Tuple[int, int] = (516, 1936)  # static padded (H, W)
    # radar branch
    num_point_features: int = 17  # encoded point columns (VoD 17, TJ4D 18)
    reader_num_input: int = 29  # split-encoded width (VoD 29, TJ4D 31)
    backbone_out_indices: Tuple[int, ...] = (0, 1, 2)
    neck_out_channels: Tuple[int, ...] = (128, 128)
    # occupancy / fusion
    radar_input_channels: int = 128
    aspp_dilation: int = 6
    use_aspp: bool = True
    # parallel-ASPP variant (ASPP_DIAL / USE_DCN; None = serial, shipped)
    aspp_dilations: tuple | None = None
    use_dcn: tuple | None = None
    occ_use_mask: bool = False
    occ_fuse_mode: str = "MUL"
    fusion_image_out: int = 128
    fusion_radar_out: int = 128
    # head
    num_anchors_per_location: int = 6
    num_dir_bins: int = 2
    dir_offset: float = 0.78539
    dir_limit_offset: float = 0.0
    code_size: int = 7
    # AnchorHeadMulti (grouped multihead, anchor_head_multi.py; None ->
    # AnchorHeadSingle). rpn_head_cfgs: class-name groups; mh_num_per_loc:
    # anchors/location per class in CLASS_NAMES order.
    rpn_head_cfgs: tuple | None = None
    mh_num_per_loc: Tuple[int, ...] = ()
    mh_shared_conv_filters: int = 64
    mh_separate_reg_list: Tuple[str, ...] = (
        "reg:2", "height:1", "size:3", "angle:2", "velo:2")
    mh_num_middle_conv: int = 1
    mh_num_middle_filter: int = 64
    mh_separate_multihead: bool = True
    mh_use_dir: bool = False
    # ResidualCoder(code_size=..., encode_angle_by_sincos=...) for the
    # anchor families (TARGET_ASSIGNER_CONFIG.BOX_CODER_CONFIG)
    box_coder_size: int = 7
    box_coder_sincos: bool = False
    # 3D voxel backbone selector for the SECOND-style families
    # ("voxel8x" | "voxel8x_focal"; MODEL.BACKBONE_3D.NAME —
    # spconv_backbone_focal.py VoxelBackBone8xFocal)
    backbone_3d_arch: str = "voxel8x"
    focal_topk: bool = True
    focal_threshold: float = 0.5
    focal_mask_multi: bool = False
    focal_skip_mask_kernel: bool = False
    # BaseBEVBackboneV1 knobs (MODEL.BACKBONE_2D) for the pillar_8x /
    # pillar_res2d_8x families (base_bev_backbone.py:115-204)
    bev_v1_layer_nums: Tuple[int, ...] = (5, 5)
    bev_v1_num_filters: Tuple[int, ...] = (256, 256)
    bev_v1_upsample_strides: Tuple[int, ...] = (1, 2)
    bev_v1_num_upsample_filters: Tuple[int, ...] = (128, 128)
    # BEVFusion image branch (MODEL.IMAGE_BACKBONE / MODEL.NECK): "swin"
    # runs SwinTransformer + GeneralizedLSSFPN (architecture-faithful,
    # bevfusion.py build_image_backbone/build_neck); "ddn" substitutes the
    # ResNet-DeepLab DDN (round-1 documented deviation, kept as a switch)
    image_backbone_arch: str = "ddn"
    swin_embed_dims: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin_window_size: int = 7
    swin_mlp_ratio: int = 4
    swin_out_indices: Tuple[int, ...] = (1, 2, 3)
    swin_drop_path: float = 0.2
    swin_patch_size: int = 4
    fpn_out_channels: int = 256
    # compute dtype for the conv-heavy branches ("float32" | "bfloat16");
    # params, BN statistics, geometry, and head outputs stay f32
    compute_dtype: str = "float32"
    # rematerialize the image backbone + frustum transform in backward
    # (their activations at VoD scale exceed HBM otherwise)
    remat: bool = True
    # USE_DEPTH (ImageVFE): run the DeepLab classifier and build true
    # depth-weighted frustum volumes (False in all shipped HGS configs)
    use_depth: bool = False
    # CenterPoint head (center_head.py): candidate count, target gaussians,
    # decode range (reference tools/cfgs/*centerpoint*.yaml TARGET_ASSIGNER /
    # POST_PROCESSING defaults)
    center_feature_map_stride: int = 2
    center_max_k: int = 500
    # TransFusion peak-pool exemptions by dataset rule (empty = pool all,
    # the VoD/TJ4D behavior; see config.py tf_no_pool_classes)
    tf_no_pool_classes: Tuple[int, ...] = ()
    center_gaussian_overlap: float = 0.1
    center_min_radius: int = 2
    center_post_limit: Tuple[float, ...] = (
        -75.0, -75.0, -10.0, 75.0, 75.0, 10.0
    )
    # CenterHead branch layout (SEPARATE_HEAD_CFG HEAD_ORDER/HEAD_DICT);
    # append ("vel", 2) for nuScenes-style velocity regression
    center_head_order: Tuple[str, ...] = ("center", "center_z", "dim", "rot")
    center_head_channels: Tuple[int, ...] = (2, 1, 3, 2)
    # PV-RCNN second stage (models/pvrcnn.py)
    pv_num_keypoints: int = 1024
    pv_num_rois: int = 128
    pv_nms_thresh: float = 0.8
    # PointRCNN family (models/point_rcnn.py): per-class mean box sizes for
    # the PointResidualCoder and the SA pyramid sizes (scaled-down in tests)
    point_mean_sizes: Tuple[Tuple[float, ...], ...] = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)
    )
    point_npoints: Tuple[int, ...] = (4096, 1024, 256, 64)
    roi_point_sample: int = 512
    # SECOND-IoU head (models/roi_heads.py)
    iou_grid_size: int = 7
    iou_score_type: str = "iou"
    # Part-A2 RoI-aware pool resolution (reference 12; see PartA2RoIHead)
    parta2_pool_size: int = 6

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return (
            int(round((self.pc_range[3] - self.pc_range[0]) / self.voxel_size[0])),
            int(round((self.pc_range[4] - self.pc_range[1]) / self.voxel_size[1])),
            int(round((self.pc_range[5] - self.pc_range[2]) / self.voxel_size[2])),
        )

    @property
    def num_class(self) -> int:
        return len(self.class_names)

    @property
    def dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def disc_cfg(self) -> Dict[str, Any]:
        return dict(
            mode=self.disc_mode,
            depth_min=self.disc_depth_min,
            depth_max=self.disc_depth_max,
            num_bins=self.disc_num_bins,
        )


class HGSFusionModel(nn.Module):
    """End-to-end HGSFusion forward (images + radar points -> head outputs)."""

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        cfg = self.cfg
        nx, ny, nz = cfg.grid_size

        # ---- camera branch: DDN backbone + per-scale channel reduce
        images = preprocess_images(batch["images"])  # (B, H, W, 3)
        stage_sizes = (3, 4, 23, 3) if cfg.image_backbone == "ResNet101" else (3, 4, 6, 3)
        # named "ddn_backbone" so the optimizer's freeze mask can target it
        # (reference freezes it: ddn_template.freeze_backbone_func:72-75)
        backbone_cls = (
            nn.remat(ResNetDeepLabBackbone, static_argnums=(2,))
            if cfg.remat else ResNetDeepLabBackbone
        )
        if "ddn_features" in batch:
            # Injection hook: precomputed multi-scale backbone taps (NHWC,
            # one per feat_extract_layer). Used by the whole-graph parity
            # test to feed BOTH frameworks identical image features at the
            # DDN boundary (the reference's backbone is torchvision
            # DeepLabV3, depth_ffn.py:106-115), and by serving deployments
            # with cached image features.
            taps = list(batch["ddn_features"])
        else:
            if cfg.ddn_quant != "none" and train:
                raise NotImplementedError(
                    "DDN.QUANT is an eval-only serving knob (the backbone "
                    "is frozen; training still runs it in bf16/f32)")
            backbone = backbone_cls(
                stage_sizes=stage_sizes, quant=cfg.ddn_quant,
                dtype=cfg.dtype, name="ddn_backbone"
            )
            taps = backbone(images, train)
        feats = [
            ConvBNReLU(
                cfg.channel_reduce_out, kernel_size=(1, 1), use_bias=False,
                dtype=cfg.dtype, name=f"channel_reduce_{i}",
            )(t, train)
            for i, t in enumerate(taps)
        ]

        depth_probs = None
        depth_logits = None
        if cfg.use_depth:
            # classifier on layer4, logits upsampled to the layer1 resolution
            # (ddn_template.py:163-167), per-scale resize + softmax over
            # D+1 bins dropping the overflow bin (depth_ffn.py:176-201)
            from .layers import resize_bilinear
            from .resnet import DeepLabClassifier

            logits_small = DeepLabClassifier(
                num_classes=cfg.disc_num_bins + 1, dtype=cfg.dtype,
                name="ddn_classifier",
            )(taps[-1], train)
            depth_logits = resize_bilinear(logits_small, feats[0].shape[1:3])
            depth_probs = []
            for f in feats:
                lg = (
                    depth_logits if f.shape[1:3] == depth_logits.shape[1:3]
                    else resize_bilinear(depth_logits, f.shape[1:3])
                )
                probs = jax.nn.softmax(lg, axis=-1)[..., : cfg.disc_num_bins]
                depth_probs.append(probs)

        # ---- frustum view transform (pure geometry + fused reduce)
        image_bev = None
        if cfg.f2v_view == "polar":
            # polar-factorized f2v + Z-collapse (polar_f2v.py): emits the
            # image BEV directly; no voxel volume is materialized
            if cfg.use_depth or cfg.f2v_quant != "none" or \
                    cfg.f2v_sampler_kernel != "xla":
                raise ValueError(
                    "F2V.VIEW: polar covers the USE_DEPTH: False CONCAT "
                    "path with the default XLA sampler only (QUANT and "
                    "SAMPLER_KERNEL are gather-path options)")
            from .polar_f2v import _CollapseScope, _F2VScope, polar_image_bev

            image_bev = polar_image_bev(
                _F2VScope(sum_channels=sum(f.shape[-1] for f in feats),
                          out_channels=cfg.f2v_out_channels,
                          dtype=cfg.dtype, name="f2v"),
                _CollapseScope(in_channels=cfg.f2v_out_channels,
                               nz=cfg.grid_size[2],
                               out_channels=cfg.radar_input_channels,
                               dtype=cfg.dtype, name="map_to_bev"),
                feats, batch["trans_lidar_to_cam"],
                batch["trans_cam_to_img"], cfg.image_size,
                batch.get("lidar_aug_matrix"), train,
                grid_size=cfg.grid_size, pc_range=cfg.pc_range,
                zeta_bins=cfg.f2v_polar_zeta_bins,
                near_columns=cfg.f2v_polar_near_columns,
                bev_aug=cfg.bev_aug, remat=cfg.remat, dtype=cfg.dtype,
            )
        else:
            grid_gen = FrustumGridGenerator(
                grid_size=cfg.grid_size, pc_range=cfg.pc_range,
                disc_cfg=cfg.disc_cfg, bev_aug=cfg.bev_aug,
            )
            grid = grid_gen(
                batch["trans_lidar_to_cam"], batch["trans_cam_to_img"],
                cfg.image_size, bda=batch.get("lidar_aug_matrix"),
            )
            f2v_cls = (
                nn.remat(FrustumToVoxelMultiScale, static_argnums=(3,))
                if cfg.remat else FrustumToVoxelMultiScale
            )
            voxel = f2v_cls(
                out_channels=cfg.f2v_out_channels, dtype=cfg.dtype,
                num_depth_bins=cfg.disc_num_bins, quant=cfg.f2v_quant,
                sampler_kernel=cfg.f2v_sampler_kernel,
                name="f2v",
            )(feats, grid, train, depth_probs)  # (B, Y, X, Z, C)

        # ---- radar branch
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=cfg.reader_num_input,
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        radar_bev = PillarNetRadar(
            out_indices=cfg.backbone_out_indices,
            neck_out_channels=cfg.neck_out_channels,
            dtype=cfg.dtype,
            name="radar_backbone",
        )(pillar_bev, occ_mask, train)

        # ---- DSM spatial sync: collapse + occupancy gate
        if image_bev is None:
            image_bev = Conv2DCollapse(
                num_bev_features=cfg.radar_input_channels, dtype=cfg.dtype,
                name="map_to_bev",
            )(voxel, train)
        gated, occupancy = RadarOccupancy2D(
            radar_input_channels=cfg.radar_input_channels,
            use_aspp=cfg.use_aspp,
            aspp_dilation=cfg.aspp_dilation,
            aspp_dilations=cfg.aspp_dilations,
            use_dcn=cfg.use_dcn,
            use_mask=cfg.occ_use_mask,
            fuse_mode=cfg.occ_fuse_mode,
            dtype=cfg.dtype,
            name="radar_occupancy",
        )(image_bev, radar_bev, train)

        # ---- DSM modality sync: SE fusion
        fused = FusionAfterBEVSE(
            image_out_channels=cfg.fusion_image_out,
            radar_out_channels=cfg.fusion_radar_out,
            dtype=cfg.dtype,
            name="fusion_after_bev",
        )(gated, radar_bev, train)

        # ---- head
        preds = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(fused)
        preds["occupancy"] = occupancy
        if depth_logits is not None:
            preds["depth_logits"] = depth_logits
        return preds


class PointPillarModel(nn.Module):
    """Classic PointPillars-style detector over radar points (zoo family).

    pillar VFE (simple, non-split encoding) -> dense scatter -> classic
    BaseBEVBackbone (SECOND-style encoder/decoder) -> anchor head. Reference:
    pointpillar.py + base_bev_backbone.py of the inherited OpenPCDet zoo.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone

        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=batch["points"].shape[-1],
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            use_virtual=False,
            encoding_type="mixed",
            num_filters=(64,),
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        feats = BaseBEVBackbone(dtype=cfg.dtype, name="backbone_2d")(
            pillar_bev, train
        )
        # upsample strides (1,2,4) over downsamples (2,2,2) -> stride-2 map;
        # anchors at feature_map_stride 2 in PointPillars configs
        return AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats)


class PointPillarMultiHeadModel(nn.Module):
    """PointPillars with the grouped multi-head anchor head (zoo family).

    Topology of the nuScenes CBGS multihead configs: pillar VFE -> dense
    scatter -> BaseBEVBackbone -> AnchorHeadMulti (anchor_head_multi.py:
    SingleHead per class group, separate per-part reg convs, 10-dof
    sincos+velocity coder). Outputs per-head lists in the multihead anchor
    order (flatten_anchors_multihead).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .anchor_head import AnchorHeadMulti
        from .base_bev_backbone import BaseBEVBackbone

        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=batch["points"].shape[-1],
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            use_virtual=False,
            encoding_type="mixed",
            num_filters=(64,),
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        feats = BaseBEVBackbone(dtype=cfg.dtype, name="backbone_2d")(
            pillar_bev, train
        )
        code_size = cfg.box_coder_size + (1 if cfg.box_coder_sincos else 0)
        return AnchorHeadMulti(
            class_names=tuple(cfg.class_names),
            rpn_head_cfgs=cfg.rpn_head_cfgs,
            num_per_loc=cfg.mh_num_per_loc,
            code_size=code_size,
            shared_conv_filters=cfg.mh_shared_conv_filters,
            separate_reg_list=cfg.mh_separate_reg_list,
            num_middle_conv=cfg.mh_num_middle_conv,
            num_middle_filter=cfg.mh_num_middle_filter,
            num_dir_bins=cfg.num_dir_bins,
            use_dir=cfg.mh_use_dir,
            separate_multihead=cfg.mh_separate_multihead,
            dtype=cfg.dtype,
            name="dense_head",
        )(feats, train)


def _voxel_backbone_3d(cfg: HGSFusionConfig, dense, mask, train: bool):
    """Build the SECOND-style 3D backbone per cfg.backbone_3d_arch.

    Returns (x3d, stages, focal_aux) — focal_aux is None for the plain
    VoxelBackBone8x, else the per-stage importance dicts for
    focal_conv_loss (reference consumes it via the hasattr(backbone_3d,
    'get_loss') guard, voxel_rcnn.py:33-36 / pv_rcnn.py:33-35). Must be
    called inside an @nn.compact __call__.
    """
    from .voxel_backbone import VoxelBackBone8x

    if cfg.backbone_3d_arch == "voxel8x_focal":
        from .focal_conv import VoxelBackBone8xFocal

        x3d, _, stages, focal_aux = VoxelBackBone8xFocal(
            topk=cfg.focal_topk, threshold=cfg.focal_threshold,
            mask_multi=cfg.focal_mask_multi,
            skip_mask_kernel=cfg.focal_skip_mask_kernel,
            dtype=cfg.dtype, name="backbone_3d",
        )(dense.astype(cfg.dtype), mask, train)
        return x3d, stages, focal_aux
    x3d, _, stages = VoxelBackBone8x(dtype=cfg.dtype, name="backbone_3d")(
        dense.astype(cfg.dtype), mask, train
    )
    return x3d, stages, None


class SECONDModel(nn.Module):
    """SECOND detector (zoo family): mean VFE -> sparse-equivalent 3D voxel
    backbone -> height compression -> 2D BEV backbone -> anchor head.

    Topology of pcdet/models/detectors/second_net.py with
    tools/cfgs/kitti_models/second.yaml hyperparameters (BaseBEVBackbone
    LAYER_NUMS [5,5], strides [1,2], filters [128,256], upsample [1,2] ->
    [256,256]); anchors live at feature_map_stride 8.

    With cfg.backbone_3d_arch == "voxel8x_focal" the 3D backbone is
    VoxelBackBone8xFocal (spconv_backbone_focal.py:101-269): focal sparse
    convs close stages 1-3 and their voxel-importance sigmoids ride along
    in the output dict under "focal_aux" for the auxiliary focal loss.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .voxel_backbone import height_compression, mean_vfe

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x, _, focal_aux = _voxel_backbone_3d(cfg, dense, mask, train)
        bev = height_compression(x)
        feats = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev, train)
        out = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats)
        if focal_aux is not None and train:
            out["focal_aux"] = focal_aux
        return out


class DSVTModel(nn.Module):
    """DSVT detector (zoo family): pillar VFE -> window-attention sparse
    voxel transformer -> BEV backbone -> center head.

    Topology of the pcdet DSVT configs (dsvt.py backbone + CenterHead);
    see models/dsvt.py for the documented set-attention -> masked
    full-window-attention deviation.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .center_head import CenterHead
        from .dsvt import DSVTBackbone

        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=batch["points"].shape[-1],
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            use_virtual=False,
            encoding_type="mixed",
            num_filters=(64,),
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        x = DSVTBackbone(dtype=cfg.dtype, name="backbone_3d")(
            pillar_bev, occ_mask, train  # occ_mask is (B, ny, nx, 1)
        )
        feats = BaseBEVBackbone(dtype=cfg.dtype, name="backbone_2d")(
            x, train
        )
        return CenterHead(
            num_class=cfg.num_class,
            head_order=cfg.center_head_order,
            head_channels=cfg.center_head_channels,
            dtype=cfg.dtype, name="dense_head",
        )(feats, train)


class BEVFusionModel(nn.Module):
    """BEVFusion detector (zoo family): camera LSS BEV + voxel lidar BEV,
    ConvFuser, TransFusion head.

    Topology: pcdet/models/detectors/bevfusion.py (SwinT + DepthLSSTransform
    + VoxelResBackBone8x + ConvFuser + TransFusionHead). Documented
    deviations: the camera backbone is this repo's ResNet-DeepLab DDN
    (SwinTransformer is not implemented); the depth-weighted lifting reuses
    the exact per-tap trilinear frustum sampler of the HGS USE_DEPTH path at
    the stride-8 BEV resolution, with the z axis collapsed by summation
    (bev_pool's reduction).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .layers import resize_bilinear
        from .resnet import DeepLabClassifier
        from .transfusion_head import TransFusionHead
        from .base_bev_backbone import BaseBEVBackbone
        from .voxel_backbone import (
            VoxelBackBone8x,
            height_compression,
            mean_vfe,
        )

        cfg = self.cfg
        nx, ny, nz = cfg.grid_size
        stride = 8

        # ---- camera branch: image features + depth distribution -> LSS BEV
        images = preprocess_images(batch["images"])
        if cfg.image_backbone_arch == "swin":
            # architecture-faithful: SwinTransformer + GeneralizedLSSFPN
            # (bevfusion.py module_topology image_backbone -> neck); the
            # finest FPN level feeds the depth head and the frustum sampler
            from .swin import GeneralizedLSSFPN, SwinTransformer

            taps = SwinTransformer(
                embed_dims=cfg.swin_embed_dims, depths=cfg.swin_depths,
                num_heads=cfg.swin_num_heads,
                window_size=cfg.swin_window_size,
                mlp_ratio=cfg.swin_mlp_ratio,
                out_indices=cfg.swin_out_indices,
                drop_path_rate=cfg.swin_drop_path,
                patch_size=cfg.swin_patch_size,
                dtype=cfg.dtype, name="image_backbone",
            )(images, train)
            fpn = GeneralizedLSSFPN(
                out_channels=cfg.fpn_out_channels, dtype=cfg.dtype,
                name="neck",
            )(taps, train)
            feat = ConvBNReLU(
                cfg.channel_reduce_out, kernel_size=(1, 1), use_bias=False,
                dtype=cfg.dtype, name="channel_reduce",
            )(fpn[0], train)
            # depth distribution head on the same level (the DepthLSS
            # transform's depthnet role, camera-only variant)
            logits = nn.Conv(
                cfg.disc_num_bins + 1, (1, 1), dtype=cfg.dtype,
                name="depth_head",
            )(fpn[0])
        else:
            taps = ResNetDeepLabBackbone(
                stage_sizes=(3, 4, 6, 3), dtype=cfg.dtype,
                name="ddn_backbone"
            )(images, train)
            feat = ConvBNReLU(
                cfg.channel_reduce_out, kernel_size=(1, 1), use_bias=False,
                dtype=cfg.dtype, name="channel_reduce",
            )(taps[0], train)
            logits = DeepLabClassifier(
                num_classes=cfg.disc_num_bins + 1, dtype=cfg.dtype,
                name="ddn_classifier",
            )(taps[-1], train)
        logits = resize_bilinear(logits, feat.shape[1:3])
        probs = jax.nn.softmax(logits, axis=-1)[..., : cfg.disc_num_bins]

        cam_grid = (nx // stride, ny // stride, max(nz // 2, 1))
        grid_gen = FrustumGridGenerator(
            grid_size=cam_grid, pc_range=cfg.pc_range, disc_cfg=cfg.disc_cfg,
            bev_aug=cfg.bev_aug,
        )
        grid = grid_gen(
            batch["trans_lidar_to_cam"], batch["trans_cam_to_img"],
            cfg.image_size, bda=batch.get("lidar_aug_matrix"),
        )
        vol = FrustumToVoxelMultiScale(
            out_channels=cfg.f2v_out_channels, dtype=cfg.dtype,
            num_depth_bins=cfg.disc_num_bins, name="f2v",
        )([feat], grid, train, [probs])  # (B, Y/8, X/8, Z, C)
        cam_bev = jnp.sum(vol, axis=3)  # z collapsed by sum (bev_pool)

        # ---- lidar/radar branch: voxel backbone at the same stride-8 grid
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, _, _ = VoxelBackBone8x(dtype=cfg.dtype, name="backbone_3d")(
            dense.astype(cfg.dtype), mask, train
        )
        lidar_bev = height_compression(x3d)

        # ---- ConvFuser: concat -> 3x3 conv + BN + ReLU (convfuser.py:5-26)
        fused = jnp.concatenate([cam_bev, lidar_bev], axis=-1)
        fused = nn.Conv(
            cfg.fusion_radar_out, (3, 3), padding=1, use_bias=False,
            dtype=cfg.dtype, name="fuser_conv",
        )(fused)
        fused = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=cfg.dtype, name="fuser_bn",
        )(fused)
        fused = nn.relu(fused)

        feats = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(128, 128),
            dtype=cfg.dtype, name="backbone_2d",
        )(fused, train)
        return TransFusionHead(
            num_class=cfg.num_class, num_proposals=cfg.center_max_k,
            no_pool_classes=cfg.tf_no_pool_classes,
            dtype=cfg.dtype, name="dense_head",
        )(feats, train)


class PVRCNNModel(nn.Module):
    """PV-RCNN detector (zoo family): SECOND-style RPN + voxel set
    abstraction keypoints + RoI-grid second-stage refinement.

    Topology: pcdet/models/detectors/pv_rcnn.py. The train step injects
    `anchors` into the batch (flat RPN anchors are data, not a hashable
    module attribute). Proposals are stop-gradiented like the reference's
    detached rois.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .pvrcnn import (
            KeypointWeighting,
            RCNNHead,
            RoIGridPool,
            VoxelSetAbstraction,
            generate_proposals,
        )
        from .voxel_backbone import height_compression, mean_vfe
        from ..utils.box_coder import ResidualCoder

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, stages, focal_aux = _voxel_backbone_3d(cfg, dense, mask, train)
        bev8 = height_compression(x3d)  # stride-8 'spatial_features'
        feats2d = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev8, train)
        rpn = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats2d)

        # proposals from decoded (detached) RPN boxes
        coder = ResidualCoder()
        batch_cls, batch_box = generate_predicted_boxes(
            rpn["cls_preds"], rpn["box_preds"], rpn.get("dir_cls_preds"),
            batch["anchors"], coder, cfg.num_class,
            dir_offset=cfg.dir_offset, dir_limit_offset=cfg.dir_limit_offset,
            num_dir_bins=cfg.num_dir_bins,
        )
        batch_cls = jax.lax.stop_gradient(batch_cls)
        batch_box = jax.lax.stop_gradient(batch_box)
        scores = jnp.max(jax.nn.sigmoid(batch_cls), -1)
        labels = jnp.argmax(batch_cls, -1) + 1
        rois, roi_scores, roi_labels, roi_valid = jax.vmap(
            lambda s, l, b: generate_proposals(
                s, l, b, cfg.pv_num_rois, cfg.pv_nms_thresh
            )
        )(scores, labels, batch_box)

        keypoints, kp_feats = VoxelSetAbstraction(
            num_keypoints=cfg.pv_num_keypoints, pc_range=cfg.pc_range,
            voxel_size=cfg.voxel_size, bev_stride=8, dtype=cfg.dtype,
            name="pfe",
        )(batch["points"], batch["points_valid"], bev8, stages, train)
        kp_feats, point_logits = KeypointWeighting(
            dtype=cfg.dtype, name="point_head"
        )(kp_feats, train)

        pooled = RoIGridPool(dtype=cfg.dtype, name="roi_grid_pool")(
            rois, keypoints, kp_feats, train
        )
        rcnn_cls, rcnn_reg = RCNNHead(dtype=cfg.dtype, name="roi_head")(
            pooled, train
        )
        out = {
            **rpn,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "keypoints": keypoints,
            "point_logits": point_logits, "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }
        if focal_aux is not None and train:
            out["focal_aux"] = focal_aux
        return out


class _RPNProposals:
    """Shared helper: decoded + detached RPN boxes -> fixed-shape proposals."""

    @staticmethod
    def build(rpn, batch, cfg, num_rois: int, nms_thresh: float):
        from .pvrcnn import generate_proposals
        from ..utils.box_coder import ResidualCoder

        coder = ResidualCoder()
        batch_cls, batch_box = generate_predicted_boxes(
            rpn["cls_preds"], rpn["box_preds"], rpn.get("dir_cls_preds"),
            batch["anchors"], coder, cfg.num_class,
            dir_offset=cfg.dir_offset, dir_limit_offset=cfg.dir_limit_offset,
            num_dir_bins=cfg.num_dir_bins,
        )
        batch_cls = jax.lax.stop_gradient(batch_cls)
        batch_box = jax.lax.stop_gradient(batch_box)
        scores = jnp.max(jax.nn.sigmoid(batch_cls), -1)
        labels = jnp.argmax(batch_cls, -1) + 1
        return jax.vmap(
            lambda s, l, b: generate_proposals(s, l, b, num_rois, nms_thresh)
        )(scores, labels, batch_box)


class VoxelRCNNModel(nn.Module):
    """Voxel R-CNN detector (zoo family): SECOND-style RPN + direct voxel
    RoI grid pooling from the 3D backbone stages (no keypoints).

    Topology: pcdet/models/detectors/voxel_rcnn.py + roi_heads/
    voxelrcnn_head.py (see models/roi_heads.py VoxelRCNNPool for the
    voxel-query -> ball-query deviation note).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .pvrcnn import RCNNHead
        from .roi_heads import VoxelRCNNPool
        from .voxel_backbone import height_compression, mean_vfe

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, stages, focal_aux = _voxel_backbone_3d(cfg, dense, mask, train)
        bev8 = height_compression(x3d)
        feats2d = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev8, train)
        rpn = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats2d)

        rois, roi_scores, roi_labels, roi_valid = _RPNProposals.build(
            rpn, batch, cfg, cfg.pv_num_rois, cfg.pv_nms_thresh
        )
        pooled = VoxelRCNNPool(
            pc_range=cfg.pc_range, voxel_size=cfg.voxel_size,
            dtype=cfg.dtype, name="roi_grid_pool",
        )(rois, stages, train)
        rcnn_cls, rcnn_reg = RCNNHead(dtype=cfg.dtype, name="roi_head")(
            pooled, train
        )
        out = {
            **rpn,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }
        if focal_aux is not None and train:
            out["focal_aux"] = focal_aux
        return out


class PVRCNNPlusPlusModel(nn.Module):
    """PV-RCNN++ detector (zoo family): proposal-centric keypoint sampling
    + VectorPool aggregation in both the VSA and the RoI grid pool.

    Topology: pcdet/models/detectors/pv_rcnn_plusplus.py (proposals are
    generated BEFORE keypoint sampling so the keypoints concentrate around
    candidates; aggregation per the VectorPool modules). Deviations
    documented in models/pvrcnn.py (sector FPS -> masked global FPS;
    VectorPoolLocal's dense sub-voxel average).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .pvrcnn import (
            KeypointWeighting,
            RCNNHead,
            RoIGridPool,
            VoxelSetAbstraction,
        )
        from .voxel_backbone import (
            VoxelBackBone8x,
            height_compression,
            mean_vfe,
        )

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, _, stages = VoxelBackBone8x(dtype=cfg.dtype, name="backbone_3d")(
            dense.astype(cfg.dtype), mask, train
        )
        bev8 = height_compression(x3d)
        feats2d = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev8, train)
        rpn = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats2d)

        rois, roi_scores, roi_labels, roi_valid = _RPNProposals.build(
            rpn, batch, cfg, cfg.pv_num_rois, cfg.pv_nms_thresh
        )
        keypoints, kp_feats = VoxelSetAbstraction(
            num_keypoints=cfg.pv_num_keypoints, pc_range=cfg.pc_range,
            voxel_size=cfg.voxel_size, bev_stride=8,
            aggregation="vectorpool", dtype=cfg.dtype, name="pfe",
        )(batch["points"], batch["points_valid"], bev8, stages, train,
          rois=rois, roi_valid=roi_valid)
        kp_feats, point_logits = KeypointWeighting(
            dtype=cfg.dtype, name="point_head"
        )(kp_feats, train)
        pooled = RoIGridPool(
            aggregation="vectorpool", dtype=cfg.dtype, name="roi_grid_pool"
        )(rois, keypoints, kp_feats, train)
        rcnn_cls, rcnn_reg = RCNNHead(dtype=cfg.dtype, name="roi_head")(
            pooled, train
        )
        return {
            **rpn,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "keypoints": keypoints,
            "point_logits": point_logits, "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }


class SECONDIoUModel(nn.Module):
    """SECOND-IoU detector (zoo family): SECOND RPN + BEV-grid IoU head for
    confidence rectification.

    Topology: pcdet/models/detectors/second_net_iou.py + roi_heads/
    second_head.py (rotated affine grid sampling of the stride-8 BEV
    features; the predicted IoU replaces/blends with the cls score at NMS,
    cfg.iou_score_type).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .roi_heads import SECONDIoUHead, rotated_bev_grid_pool
        from .voxel_backbone import (
            VoxelBackBone8x,
            height_compression,
            mean_vfe,
        )

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, _, _ = VoxelBackBone8x(dtype=cfg.dtype, name="backbone_3d")(
            dense.astype(cfg.dtype), mask, train
        )
        bev = height_compression(x3d)
        feats2d = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev, train)
        rpn = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats2d)

        rois, roi_scores, roi_labels, roi_valid = _RPNProposals.build(
            rpn, batch, cfg, cfg.pv_num_rois, cfg.pv_nms_thresh
        )
        # the reference detaches spatial_features_2d before pooling
        pooled = rotated_bev_grid_pool(
            jax.lax.stop_gradient(feats2d), rois, cfg.pc_range,
            cfg.voxel_size, down_ratio=8, grid_size=cfg.iou_grid_size,
        )
        iou_preds = SECONDIoUHead(dtype=cfg.dtype, name="roi_head")(
            pooled, train
        )
        return {
            **rpn,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "iou_preds": iou_preds,
        }


class PointRCNNModel(nn.Module):
    """PointRCNN detector (zoo family): PointNet++ backbone, per-point box
    head, in-box canonical RoI refinement.

    Topology: pcdet/models/detectors/point_rcnn.py (see models/point_rcnn.py
    for the per-module references).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .point_rcnn import PointHeadBox, PointNet2MSG, PointRCNNHead
        from .pvrcnn import generate_proposals
        from ..utils.box_coder import PointResidualCoder

        cfg = self.cfg
        points = batch["points"]
        valid = batch["points_valid"]
        xyz = points[..., :3]
        feats = PointNet2MSG(
            npoints=cfg.point_npoints, dtype=cfg.dtype, name="backbone_3d"
        )(points, valid, train)
        cls_logits, box_encodings = PointHeadBox(
            num_class=cfg.num_class, dtype=cfg.dtype, name="point_head"
        )(feats, train)

        coder = PointResidualCoder(mean_size=cfg.point_mean_sizes)
        pred_classes = jnp.argmax(cls_logits, -1) + 1
        point_boxes = coder.decode(
            jax.lax.stop_gradient(box_encodings), xyz, pred_classes
        )
        point_scores = jnp.max(jax.nn.sigmoid(cls_logits), -1)
        masked_scores = jnp.where(
            valid, jax.lax.stop_gradient(point_scores), -1.0
        )
        rois, roi_scores, roi_labels, roi_valid = jax.vmap(
            lambda s, l, b: generate_proposals(
                s, l, b, cfg.pv_num_rois, cfg.pv_nms_thresh
            )
        )(masked_scores, pred_classes, point_boxes)

        rcnn_cls, rcnn_reg = PointRCNNHead(
            num_sampled=cfg.roi_point_sample, dtype=cfg.dtype,
            name="roi_head",
        )(rois, roi_valid, xyz, valid, feats,
          jax.lax.stop_gradient(point_scores), train)
        return {
            "point_cls_logits": cls_logits,
            "point_box_encodings": box_encodings,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }


class PartA2Model(nn.Module):
    """Part-A2 detector (zoo family): UNet part-aware stage + anchor RPN +
    RoI-aware part aggregation.

    Topology: pcdet/models/detectors/PartA2_net.py (see models/parta2.py
    for the per-module references and deviations).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .parta2 import (
            PartA2RoIHead,
            PointPartHead,
            UNetDecoder,
            gather_point_voxel_features,
        )
        from .voxel_backbone import (
            VoxelBackBone8x,
            height_compression,
            mean_vfe,
        )

        cfg = self.cfg
        dense, mask = mean_vfe(
            batch["points"], batch["points_valid"], cfg.pc_range,
            cfg.voxel_size, cfg.grid_size,
        )
        x3d, _, stages = VoxelBackBone8x(dtype=cfg.dtype, name="backbone_3d")(
            dense.astype(cfg.dtype), mask, train
        )
        # part-aware stage: decode back to stride 1, per-point heads
        voxel_feats, _ = UNetDecoder(dtype=cfg.dtype, name="unet_decoder")(
            stages, train
        )
        point_feats = gather_point_voxel_features(
            voxel_feats.astype(jnp.float32), batch["points"],
            batch["points_valid"], cfg.pc_range, cfg.voxel_size,
            cfg.grid_size,
        )
        seg_logits, part_pred = PointPartHead(
            num_class=cfg.num_class, dtype=cfg.dtype, name="point_head"
        )(point_feats, train)

        bev = height_compression(x3d)
        feats2d = BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 256),
            upsample_strides=(1, 2), num_upsample_filters=(256, 256),
            dtype=cfg.dtype, name="backbone_2d",
        )(bev, train)
        rpn = AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(feats2d)

        rois, roi_scores, roi_labels, roi_valid = _RPNProposals.build(
            rpn, batch, cfg, cfg.pv_num_rois, cfg.pv_nms_thresh
        )
        seg_scores = jnp.max(jax.nn.sigmoid(seg_logits), -1)
        rcnn_cls, rcnn_reg = PartA2RoIHead(
            pool_size=cfg.parta2_pool_size, dtype=cfg.dtype, name="roi_head"
        )(
            rois, roi_valid, batch["points"][..., :3], batch["points_valid"],
            point_feats, jax.lax.stop_gradient(seg_scores),
            jax.lax.stop_gradient(jax.nn.sigmoid(part_pred)), train,
        )
        return {
            **rpn,
            "seg_logits": seg_logits, "part_pred": part_pred,
            "rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
            "roi_valid": roi_valid, "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
        }


class MPPNetModel(nn.Module):
    """MPPNet detector (zoo family): multi-frame trajectory refinement of
    precomputed first-stage proposals.

    Topology: pcdet/models/detectors/mppnet.py — the network is the second
    stage; `roi_boxes` (per-frame first-stage proposals with velocity) come
    in through the batch, exactly like the reference's
    batch_dict['roi_boxes'] -> 'proposals_list'. See models/mppnet.py for
    the per-module references and the grouped-attention deviation note.
    MPPNetE2E's streaming memory bank: mppnet.MPPNetStreamState +
    mppnet_stream_step (functional FIFO window, tested equal to this
    fixed-window forward).

    Batch contract: points_multi (B, T, N, >=3), points_multi_valid
    (B, T, N), roi_boxes (B, T, P, 9) [box7|vx vy] sorted by score,
    roi_scores (B, T, P), roi_labels (B, T, P).
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .mppnet import MPPNetHead, generate_trajectory

        cfg = self.cfg
        props = batch["roi_boxes"]
        b, t, p = props.shape[:3]
        r = min(cfg.pv_num_rois, p)
        cur = props[:, 0, :r]  # (B, R, 9) current-frame top proposals
        traj, matched = jax.vmap(
            lambda cu, pr: generate_trajectory(cu, pr)
        )(cur, props)  # (B, T, R, 7), (B, T, R)

        rcnn_cls, rcnn_reg = MPPNetHead(
            num_frames=t, dtype=cfg.dtype, name="roi_head"
        )(
            traj, matched, batch["points_multi"],
            batch["points_multi_valid"], train,
        )
        roi_valid = jnp.any(cur[..., 3:6] > 0, axis=-1)
        return {
            "rois": cur[..., :7],
            "roi_scores": batch["roi_scores"][:, 0, :r],
            "roi_labels": batch["roi_labels"][:, 0, :r],
            "roi_valid": roi_valid,
            "trajectory": traj,
            "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
        }


class TransFusionModel(nn.Module):
    """TransFusion-L detector (zoo family): pillar BEV + transformer-decoder
    head with heatmap-initialized object queries and Hungarian set matching.

    Topology: pcdet/models/detectors/transfusion.py (LiDAR-only variant) over
    the pillar backbone; head per dense_heads/transfusion_head.py.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .transfusion_head import TransFusionHead

        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=batch["points"].shape[-1],
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            use_virtual=False,
            encoding_type="mixed",
            num_filters=(64,),
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        feats = BaseBEVBackbone(dtype=cfg.dtype, name="backbone_2d")(
            pillar_bev, train
        )
        return TransFusionHead(
            num_class=cfg.num_class, num_proposals=cfg.center_max_k,
            no_pool_classes=cfg.tf_no_pool_classes,
            dtype=cfg.dtype, name="dense_head",
        )(feats, train)


class VoxelNeXtModel(nn.Module):
    """VoxelNeXt detector (zoo family): fully sparse voxel backbone with
    multi-scale fusion + z-sum BEV collapse, center-based head.

    Reference: pcdet/models/detectors/voxelnext.py +
    spconv_backbone_voxelnext.py (VoxelResBackBone8xVoxelNeXt). Deviation
    (documented): the reference's VoxelNeXtHead predicts on sparse active
    sites with a sparse top-k (voxelnext_head.py _topk_1d); here the head
    runs dense over the masked stride-8 BEV with the same fixed-K decode as
    CenterPoint — equal results on the active set since inactive sites carry
    -inf-like heatmap logits only through the masked conv stack.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .center_head import CenterHead
        from .voxel_backbone import VoxelResBackBone8xVoxelNeXt, mean_vfe

        cfg = self.cfg
        if cfg.backbone_3d_arch == "voxelnext2d":
            # 2-D pillar variant (spconv_backbone_voxelnext2d.py): 32-ch
            # dynamic pillar VFE feeds the six-stage residual 2D backbone
            from .sparse_backbone_2d import VoxelNeXt2DBackbone

            pillar_bev, occ_mask = PillarFeatureNet(
                num_input_features=batch["points"].shape[-1],
                pillar_size=cfg.voxel_size[0], pc_range=cfg.pc_range,
                use_virtual=False, encoding_type="mixed",
                num_filters=(32,), dtype=cfg.dtype, name="pillar_net",
            )(batch["points"], batch["points_valid"], train)
            bev, _, _ = VoxelNeXt2DBackbone(
                dtype=cfg.dtype, name="backbone_3d"
            )(pillar_bev, occ_mask.astype(bool), train)
        else:
            dense, mask = mean_vfe(
                batch["points"], batch["points_valid"], cfg.pc_range,
                cfg.voxel_size, cfg.grid_size,
            )
            bev, bev_mask = VoxelResBackBone8xVoxelNeXt(
                dtype=cfg.dtype, name="backbone_3d"
            )(dense.astype(cfg.dtype), mask, train)
        return CenterHead(
            num_class=cfg.num_class, shared_channels=128,
            head_order=cfg.center_head_order,
            head_channels=cfg.center_head_channels,
            dtype=cfg.dtype, name="dense_head",
        )(bev, train)


class CenterPointModel(nn.Module):
    """CenterPoint-Pillar detector (zoo family, anchor-free center head).

    pillar VFE -> classic BaseBEVBackbone -> CenterHead (heatmap + offsets),
    the pcdet centerpoint_pillar topology (pcdet/models/detectors/
    centerpoint.py + dense_heads/center_head.py). The BEV backbone's
    (1,2,4)-upsample-over-(2,2,2)-downsample output sits at stride 2 of the
    pillar grid, so targets/decode use cfg.center_feature_map_stride=2.
    """

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        from .base_bev_backbone import BaseBEVBackbone
        from .center_head import CenterHead

        cfg = self.cfg
        if cfg.backbone_3d_arch in ("pillar_8x", "pillar_res2d_8x"):
            # sparse pillar backbone family (spconv_backbone_2d.py):
            # 32-ch pillar VFE -> PillarRes18BackBone8x/PillarBackBone8x ->
            # BaseBEVBackboneV1 over (x_conv4, x_conv5); head at stride 8
            from .sparse_backbone_2d import (
                BaseBEVBackboneV1,
                PillarRes18BackBone8x,
            )

            pillar_bev, occ_mask = PillarFeatureNet(
                num_input_features=batch["points"].shape[-1],
                pillar_size=cfg.voxel_size[0], pc_range=cfg.pc_range,
                use_virtual=False, encoding_type="mixed",
                num_filters=(32,), dtype=cfg.dtype, name="pillar_net",
            )(batch["points"], batch["points_valid"], train)
            outs, masks = PillarRes18BackBone8x(
                residual=cfg.backbone_3d_arch == "pillar_res2d_8x",
                dtype=cfg.dtype, name="backbone_3d",
            )(pillar_bev, occ_mask.astype(bool), train)
            feats = BaseBEVBackboneV1(
                layer_nums=cfg.bev_v1_layer_nums,
                num_filters=cfg.bev_v1_num_filters,
                upsample_strides=cfg.bev_v1_upsample_strides,
                num_upsample_filters=cfg.bev_v1_num_upsample_filters,
                dtype=cfg.dtype, name="backbone_2d",
            )(outs["x_conv4"], outs["x_conv5"], train)
        else:
            pillar_bev, occ_mask = PillarFeatureNet(
                num_input_features=batch["points"].shape[-1],
                pillar_size=cfg.voxel_size[0],
                pc_range=cfg.pc_range,
                use_virtual=False,
                encoding_type="mixed",
                num_filters=(64,),
                dtype=cfg.dtype,
                name="pillar_net",
            )(batch["points"], batch["points_valid"], train)
            feats = BaseBEVBackbone(dtype=cfg.dtype, name="backbone_2d")(
                pillar_bev, train
            )
        return CenterHead(
            num_class=cfg.num_class,
            head_order=cfg.center_head_order,
            head_channels=cfg.center_head_channels,
            dtype=cfg.dtype, name="dense_head",
        )(feats, train)


class RadarOnlyModel(nn.Module):
    """Radar-only pillar detector (BASELINE.json config 1: pillar encoder ->
    BEV encoder -> anchor head), the minimum end-to-end slice."""

    cfg: HGSFusionConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool):
        cfg = self.cfg
        pillar_bev, occ_mask = PillarFeatureNet(
            num_input_features=cfg.reader_num_input,
            pillar_size=cfg.voxel_size[0],
            pc_range=cfg.pc_range,
            dtype=cfg.dtype,
            name="pillar_net",
        )(batch["points"], batch["points_valid"], train)
        radar_bev = PillarNetRadar(
            out_indices=cfg.backbone_out_indices,
            neck_out_channels=cfg.neck_out_channels,
            dtype=cfg.dtype,
            name="radar_backbone",
        )(pillar_bev, occ_mask, train)
        return AnchorHeadSingle(
            num_class=cfg.num_class,
            num_anchors_per_location=cfg.num_anchors_per_location,
            code_size=cfg.code_size,
            num_dir_bins=cfg.num_dir_bins,
            name="dense_head",
        )(radar_bev)


def post_process(preds: Dict[str, jnp.ndarray], anchors, box_coder, cfg,
                 score_thresh: float = 0.1, nms_thresh: float = 0.01,
                 pre_max_size: int = 4096, post_max_size: int = 500):
    """Decode + sigmoid + class-agnostic rotated NMS, fixed-shape outputs.

    detector3d_template.post_processing:273-379 with MULTI_CLASSES_NMS False:
    per-anchor max class score, NMS over all classes jointly.
    Returns dict of (B, post_max, ...) arrays + validity mask.
    """
    from ..ops.nms import NEG_INF, class_agnostic_nms
    from ..ops.topk import exact_top_k
    from .anchor_head import decode_selected_boxes

    bsz = preds["cls_preds"].shape[0]
    a = anchors.shape[0]
    batch_cls = preds["cls_preds"].reshape(bsz, a, cfg.num_class)
    raw_box = preds["box_preds"].reshape(bsz, a, -1)
    raw_dir = (preds["dir_cls_preds"].reshape(bsz, a, cfg.num_dir_bins)
               if preds.get("dir_cls_preds") is not None else None)
    scores = jax.nn.sigmoid(batch_cls)
    cls_scores = jnp.max(scores, axis=-1)
    labels = jnp.argmax(scores, axis=-1) + 1
    k = min(pre_max_size, a)

    def one(s, rb, rd, lab):
        # select FIRST, decode 4k rows instead of 614k: the per-anchor
        # decode commutes with score selection (decode_selected_boxes)
        masked = jnp.where(s >= score_thresh, s, NEG_INF)
        top_s, top_i = exact_top_k(masked, k)
        dec = decode_selected_boxes(
            rb[top_i], None if rd is None else rd[top_i], anchors[top_i],
            box_coder, dir_offset=cfg.dir_offset,
            dir_limit_offset=cfg.dir_limit_offset,
            num_dir_bins=cfg.num_dir_bins,
        )
        # candidates arrive pre-thresholded and score-sorted; the inner
        # re-top-k over k rows is cheap and keeps one NMS entry point
        idx, valid = class_agnostic_nms(
            top_s, dec, score_thresh=score_thresh, nms_thresh=nms_thresh,
            pre_max_size=k, post_max_size=post_max_size,
        )
        return dec[idx], s[top_i][idx], lab[top_i][idx], valid

    if raw_dir is None:
        boxes, out_scores, out_labels, valid = jax.vmap(
            lambda s, rb, lab: one(s, rb, None, lab)
        )(cls_scores, raw_box, labels)
    else:
        boxes, out_scores, out_labels, valid = jax.vmap(one)(
            cls_scores, raw_box, raw_dir, labels)
    return {
        "boxes": boxes,
        "scores": out_scores,
        "labels": out_labels,
        "valid": valid,
    }


def post_process_multihead(preds, assigner, cfg, post_cfg: Dict):
    """Multihead decode + per-head multi-class NMS, fixed shapes.

    detector3d_template.post_processing:319-340 with MULTI_CLASSES_NMS: per
    head, per class, rotated NMS on that class's scores; labels map through
    multihead_label_mapping. Fixed-shape: each (head, class) contributes a
    post_max-size block; invalid rows carry valid=False.
    """
    import jax

    from .anchor_head import generate_predicted_boxes_multihead
    from ..ops.nms import class_agnostic_nms

    s0 = assigner.anchor_shapes[0]
    grid_hw = int(s0[0] * s0[1] * s0[2])  # nz*ny*nx (shared by all classes)
    cls_list, box_list, label_map = generate_predicted_boxes_multihead(
        preds, assigner, cfg.rpn_head_cfgs, grid_hw,
        dir_offset=cfg.dir_offset, dir_limit_offset=cfg.dir_limit_offset,
        num_dir_bins=cfg.num_dir_bins,
    )
    score_thresh = post_cfg.get("SCORE_THRESH", 0.1)
    nms_cfg = post_cfg["NMS_CONFIG"]
    blocks = {"boxes": [], "scores": [], "labels": [], "valid": []}
    for cp, bp, labels in zip(cls_list, box_list, label_map):
        scores = jax.nn.sigmoid(cp)  # (B, A_h, nc_h)
        for ci, global_label in enumerate(labels):
            s = scores[..., ci]

            def one(s_b, b_b):
                return class_agnostic_nms(
                    s_b, b_b[..., :7], score_thresh=score_thresh,
                    nms_thresh=nms_cfg["NMS_THRESH"],
                    pre_max_size=nms_cfg["NMS_PRE_MAXSIZE"],
                    post_max_size=nms_cfg["NMS_POST_MAXSIZE"],
                )

            idx, valid = jax.vmap(one)(s, bp)
            take = jax.vmap(lambda arr, i: arr[i])
            blocks["boxes"].append(take(bp, idx))
            blocks["scores"].append(take(s, idx))
            blocks["labels"].append(
                jnp.full(idx.shape, global_label, jnp.int32))
            blocks["valid"].append(valid)
    out = {k: jnp.concatenate(v, axis=1) for k, v in blocks.items()}
    if out["boxes"].shape[-1] > 7:  # velocity extras ride along
        out["vels"] = out["boxes"][..., 7:]
        out["boxes"] = out["boxes"][..., :7]
    return out
