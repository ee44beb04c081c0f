"""Generate dataset info pkl files for a dataset config.

Replaces the reference's per-dataset `python -m pcdet.datasets.<x> create_*
infos` tooling (e.g. vod_dataset.py:199-323, nuscenes_dataset.py:358-404,
once_dataset.py:386-409). KITTI-family datasets implement
`create_infos(splits=...)`; the inherited families dispatch to their
module-level creators below.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _create_for(data_cfg, class_names, splits, logger):
    name = data_cfg.DATASET
    root = Path(data_cfg.DATA_PATH)
    if name == "NuScenesDataset":
        from hgsfusion_tpu.datasets.nuscenes import create_nuscenes_info

        version = data_cfg.VERSION
        create_nuscenes_info(
            version, root, root / version,
            max_sweeps=int(data_cfg.get("MAX_SWEEPS", 10)),
            with_cam=bool(data_cfg.get("CAMERA_CONFIG", None)),
        )
        return [root / version]
    if name == "ONCEDataset":
        from hgsfusion_tpu.datasets.once import create_once_infos

        create_once_infos(data_cfg, class_names, root, root, splits=splits)
        return [root / f"once_infos_{s}.pkl" for s in splits]
    if name == "LyftDataset":
        from hgsfusion_tpu.datasets.lyft import create_lyft_info

        version = data_cfg.VERSION
        create_lyft_info(
            root, root / version, version=version,
            max_sweeps=int(data_cfg.get("MAX_SWEEPS", 10)),
        )
        return [root / version]
    if name == "PandasetDataset":
        from hgsfusion_tpu.datasets.pandaset import create_pandaset_infos

        create_pandaset_infos(
            data_cfg, class_names, root, root, splits=splits)
        return [root / f"pandaset_infos_{s}.pkl" for s in splits]
    if name == "Argo2Dataset":
        from hgsfusion_tpu.datasets.argo2 import create_argo2_infos

        create_argo2_infos(root / "sensor", root, save_bin=True)
        return [root / "argo2_infos_train.pkl", root / "argo2_infos_val.pkl"]
    if name == "WaymoDataset":
        from hgsfusion_tpu.datasets.waymo import create_waymo_infos

        create_waymo_infos()  # raises with guidance (needs the TF devkit)
    # KITTI-family datasets (VoD / TJ4D / KITTI / Custom)
    from hgsfusion_tpu.datasets import build_dataset

    ds = build_dataset(data_cfg, class_names, training=False, logger=logger)
    return ds.create_infos(splits=tuple(splits))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True,
                   help="model or dataset yaml (DATA_CONFIG or top-level)")
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=None)
    args = p.parse_args()

    from hgsfusion_tpu.config import cfg_from_list, load_config
    from hgsfusion_tpu.utils.common import create_logger

    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)
    data_cfg = cfg.get("DATA_CONFIG", cfg)
    class_names = cfg.get("CLASS_NAMES", ["Car", "Pedestrian", "Cyclist"])
    logger = create_logger()
    files = _create_for(data_cfg, class_names, tuple(args.splits), logger)
    for f in files:
        logger.info(f"wrote {f}")


if __name__ == "__main__":
    main()
