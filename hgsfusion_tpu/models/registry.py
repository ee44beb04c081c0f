"""Model registry: config NAME -> model class (the builder seam).

Reference: pcdet/models/__init__.py:16-54 (build_network) and the
detectors/__init__.py name registry. The HGS configs use MODEL.NAME 'CaDDN'
(the fusion detector runs under the CaDDN entry, caddn.py:4); radar-only
pillar configs map to the RadarOnly model. Additional detector families from
the inherited OpenPCDet zoo plug in here as they are implemented.
"""
from __future__ import annotations

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
}


def build_network(cfg, model_cfg: HGSFusionConfig):
    """cfg: loaded YAML ConfigDict; model_cfg: static HGSFusionConfig."""
    name = cfg.MODEL.NAME
    if name not in DETECTORS:
        raise KeyError(
            f"unknown detector '{name}'; available: {sorted(DETECTORS)}"
        )
    return DETECTORS[name](cfg=model_cfg)
