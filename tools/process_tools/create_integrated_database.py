"""Merge gt databases from multiple dataset roots into one.

Reference: tools/process_tools/create_integrated_database.py (merged gt-db
for cross-dataset gt_sampling).
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db_infos", nargs="+", required=True,
                   help="paths to kitti_dbinfos_*.pkl files to merge")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    merged = {}
    for path in args.db_infos:
        with open(path, "rb") as f:
            infos = pickle.load(f)
        root = Path(path).parent
        for name, entries in infos.items():
            for e in entries:
                # rebase instance paths so the merged db resolves from its dir
                e["path"] = str((root / e["path"]).resolve())
            merged.setdefault(name, []).extend(entries)
    with open(args.out, "wb") as f:
        pickle.dump(merged, f)
    total = sum(len(v) for v in merged.values())
    print(f"merged {total} instances over {len(merged)} classes -> {args.out}")


if __name__ == "__main__":
    main()
