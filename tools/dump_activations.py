"""Dump per-module activations for parity comparison against the reference.

The reference's de-facto verification was inline debug plots (SURVEY.md §4);
this makes it systematic: run one frame through the model, capture every
intermediate via flax's capture_intermediates, and save an .npz whose keys
can be diffed against reference activation dumps (same batch_dict
boundaries: spatial_features, pillar_features_scattered, voxel-collapse,
spatial_features_2d, head outputs).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgsfusion_tpu.config import load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.checkpoint import CheckpointManager
    from hgsfusion_tpu.train.trainer import device_batch
    from hgsfusion_tpu.utils.common import create_logger

    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--out", default="activations.npz")
    args = p.parse_args()

    cfg = load_config(args.cfg_file)
    model_cfg = model_config_from_yaml(cfg)
    logger = create_logger()
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    model = build_network(cfg, model_cfg)
    batch = dataset.collate_batch([dataset[args.frame]])
    from hgsfusion_tpu.train.trainer import add_init_anchors

    jb = add_init_anchors(
        {k: jnp.asarray(v) for k, v in device_batch(batch).items()},
        cfg, model_cfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(jb)
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        raw = mgr.manager.restore(mgr.latest_step())
        variables = {
            "params": jax.tree_util.tree_map(jnp.asarray, raw["params"]),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, raw["batch_stats"]),
        }

    preds, state = model.apply(
        variables, jb, False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                for i, arr in enumerate(v if isinstance(v, tuple) else (v,)):
                    try:
                        flat[f"{name}.{i}"] = np.asarray(arr, np.float32)
                    except Exception:
                        pass

    walk(state["intermediates"])
    for k, v in preds.items():
        flat[f"preds/{k}"] = np.asarray(v, np.float32)
    np.savez_compressed(args.out, **flat)
    logger.info(f"wrote {len(flat)} activation tensors to {args.out}")
    for k in sorted(flat)[:20]:
        logger.info(f"  {k}: {flat[k].shape}")


if __name__ == "__main__":
    main()
