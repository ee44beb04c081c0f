"""Generate kitti_infos_{train,val}.pkl for a dataset config.

Replaces the reference's `python -m pcdet.datasets.kitti.vod_dataset
create_kitti_infos ...` tooling (vod_dataset.py:199-323).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True,
                   help="model or dataset yaml (DATA_CONFIG or top-level)")
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    args = p.parse_args()

    from hgsfusion_tpu.config import load_config
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.utils.common import create_logger

    cfg = load_config(args.cfg_file)
    data_cfg = cfg.get("DATA_CONFIG", cfg)
    class_names = cfg.get("CLASS_NAMES", ["Car", "Pedestrian", "Cyclist"])
    logger = create_logger()
    ds = build_dataset(data_cfg, class_names, training=False, logger=logger)
    files = ds.create_infos(splits=tuple(args.splits))
    for f in files:
        logger.info(f"wrote {f}")


if __name__ == "__main__":
    main()
