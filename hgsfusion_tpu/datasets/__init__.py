"""Data layer: dataset registry + loader construction.

Reference: pcdet/datasets/__init__.py:58-88 (build_dataloader). The torch
DataLoader + DistributedSampler is replaced by a simple multiprocess-free
iterator (numpy pipelines here are light: radar clouds are small), sharded
per-host for multi-host data parallelism.
"""
from __future__ import annotations

from .dataset import DatasetTemplate
from .kitti import KittiDataset
from .vod import VODDataset
from .tj4d import TJ4DDataset
from .custom import CustomDataset
from .nuscenes import NuScenesDataset
from .once import ONCEDataset
from .waymo import WaymoDataset
from .lyft import LyftDataset
from .pandaset import PandasetDataset
from .argo2 import Argo2Dataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "VODDataset": VODDataset,
    "TJ4DDataset": TJ4DDataset,
    "CustomDataset": CustomDataset,
    "NuScenesDataset": NuScenesDataset,
    "ONCEDataset": ONCEDataset,
    "WaymoDataset": WaymoDataset,
    "LyftDataset": LyftDataset,
    "PandasetDataset": PandasetDataset,
    "Argo2Dataset": Argo2Dataset,
}


def build_dataset(dataset_cfg, class_names, training=True, root_path=None,
                  logger=None):
    cls = __all__[dataset_cfg.DATASET]
    return cls(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger,
    )
