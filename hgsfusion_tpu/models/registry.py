"""Model registry: config NAME -> model class (the builder seam).

Reference: pcdet/models/__init__.py:16-54 (build_network) and the
detectors/__init__.py name registry. The HGS configs use MODEL.NAME 'CaDDN'
(the fusion detector runs under the CaDDN entry, caddn.py:4); radar-only
pillar configs map to the RadarOnly model. Additional detector families from
the inherited OpenPCDet zoo plug in here as they are implemented.
"""
from __future__ import annotations

import functools

from .detector import (
    BEVFusionModel,
    CenterPointModel,
    DSVTModel,
    MPPNetModel,
    PartA2Model,
    PointRCNNModel,
    PVRCNNModel,
    PVRCNNPlusPlusModel,
    SECONDIoUModel,
    TransFusionModel,
    VoxelNeXtModel,
    VoxelRCNNModel,
    HGSFusionConfig,
    HGSFusionModel,
    PointPillarModel,
    RadarOnlyModel,
    SECONDModel,
)

DETECTORS = {
    "HGSFusion": HGSFusionModel,
    "CaDDN": HGSFusionModel,  # reference config name for the HGS topology
    "RadarOnly": RadarOnlyModel,
    "PillarNet": RadarOnlyModel,  # radar-only pillar detector family
    "PointPillar": PointPillarModel,  # classic zoo family (SECOND-style BEV)
    "CenterPoint": CenterPointModel,  # anchor-free center head family
    "SECONDNet": SECONDModel,  # sparse-3D voxel backbone family
    "SECOND": SECONDModel,
    "VoxelNeXt": VoxelNeXtModel,  # fully sparse multi-scale center detector
    "TransFusion": TransFusionModel,  # transformer-decoder set prediction
    "PVRCNN": PVRCNNModel,  # two-stage point-voxel refinement
    "PV-RCNN": PVRCNNModel,
    "BevFusion": BEVFusionModel,  # camera LSS + voxel lidar fusion
    "BEVFusion": BEVFusionModel,
    "DSVT": DSVTModel,  # window-attention sparse voxel transformer
    "VoxelRCNN": VoxelRCNNModel,  # voxel RoI grid pooling two-stage
    "PVRCNNPlusPlus": PVRCNNPlusPlusModel,  # proposal-centric + VectorPool
    "PV-RCNN++": PVRCNNPlusPlusModel,
    "SECONDNetIoU": SECONDIoUModel,  # SECOND + IoU-rectification head
    "PointRCNN": PointRCNNModel,  # point-wise two-stage
    "PartA2Net": PartA2Model,  # part-aware/aggregation two-stage
    "PartA2": PartA2Model,
    "MPPNet": MPPNetModel,  # multi-frame trajectory refinement
    # Reference registers both names (pcdet/models/detectors/__init__.py:13,33).
    # MPPNetE2E differs only in inference bookkeeping (stateful FIFO memory
    # bank); the same fixed-window module serves both — the streaming path is
    # the functional mppnet.MPPNetStreamState + mppnet_stream_step, tested
    # equal to this forward (tests/test_mppnet.py TestMPPNetStreaming).
    "MPPNetE2E": MPPNetModel,
}


def build_network(cfg, model_cfg: HGSFusionConfig):
    """cfg: loaded YAML ConfigDict; model_cfg: static HGSFusionConfig."""
    name = cfg.MODEL.NAME
    # the reference selects the head by DENSE_HEAD.NAME inside one detector
    # entry (detector3d_template.build_dense_head); the multihead variant is
    # a distinct static topology here
    if (name in ("PointPillar", "PointPillarMultiHead")
            and cfg.MODEL.get("DENSE_HEAD", {}).get("NAME")
            == "AnchorHeadMulti"):
        from .detector import PointPillarMultiHeadModel

        return PointPillarMultiHeadModel(cfg=model_cfg)
    if name not in DETECTORS:
        raise KeyError(
            f"unknown detector '{name}'; available: {sorted(DETECTORS)}"
        )
    return DETECTORS[name](cfg=model_cfg)


def _sub_modules():
    """Reference per-category `__all__` registry names -> our equivalents.

    The reference wires sub-modules (VFEs, map_to_bev, 2D backbones, ...)
    by NAME through per-package `__all__` dicts (e.g. backbones_3d/vfe/
    __init__.py, backbones_2d/map_to_bev/__init__.py). Our detectors are
    composed statically, so this mapping is the lookup seam for anyone
    porting a reference config that names one of these directly — every
    registered name resolves to the TPU-native class (or function) that
    implements it. Built lazily to keep registry import light.
    """
    from . import base_bev_backbone, focal_conv, frustum, fusion_bev
    from . import occupancy, pillar_encoder, sparse_backbone_2d

    return {
        # backbones_3d (focal sparse conv family)
        "VoxelBackBone8xFocal": focal_conv.VoxelBackBone8xFocal,
        "FocalSparseConv": focal_conv.FocalSparseConv3D,
        # backbones_3d (sparse 2D pillar family, spconv_backbone_2d.py /
        # spconv_backbone_voxelnext2d.py)
        "PillarBackBone8x": functools.partial(
            sparse_backbone_2d.PillarRes18BackBone8x, residual=False),
        "PillarRes18BackBone8x": sparse_backbone_2d.PillarRes18BackBone8x,
        "VoxelResBackBone8xVoxelNeXt2D":
            sparse_backbone_2d.VoxelNeXt2DBackbone,
        "BaseBEVBackboneV1": sparse_backbone_2d.BaseBEVBackboneV1,
        # backbones_3d/vfe
        "DynamicPillarFeatureNet": pillar_encoder.PillarFeatureNet,
        "Radar7PillarVFE": pillar_encoder.Radar7PillarVFE,
        "SimpleSampler": occupancy.SimpleSampler,
        "RadarOccupancy": occupancy.RadarOccupancy3D,
        "RadarOccupancy2DV2": occupancy.RadarOccupancy2D,
        # vfe/image_vfe_modules/f2v
        "FrustumToVoxel": frustum.FrustumToVoxelSingleScale,
        "FrustumToVoxelMultiScale": frustum.FrustumToVoxelMultiScale,
        # backbones_2d/map_to_bev
        "Conv2DCollapse": occupancy.Conv2DCollapse,
        "Fusion_MAP_TO_BEV": fusion_bev.fusion_map_to_bev,
        "HeightCompressionMultiScale": fusion_bev.HeightCompressionMultiScale,
        # backbones_2d / pillarnet neck
        "BaseBEVBackbone": base_bev_backbone.BaseBEVBackbone,
        "RPNV2": base_bev_backbone.RPNV2,
        # fusion
        "FusionAfterBEVSEDirect": fusion_bev.FusionAfterBEVSE,
    }


def resolve_sub_module(name: str):
    """Look up a reference sub-module NAME (see _sub_modules)."""
    table = _sub_modules()
    if name not in table:
        raise KeyError(
            f"unknown sub-module '{name}'; available: {sorted(table)}"
        )
    return table[name]
