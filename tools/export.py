"""Serialize a checkpointed detector into a portable serving artifact.

A TPU-native serving surface the torch reference has no equivalent of:
the full inference graph (forward + decode + NMS) is traced once,
serialized as StableHLO via `jax.export`, and can be reloaded and invoked
in a fresh process — no model code, config parsing, or checkpoint
restoration on the serving host. The artifact pins the input shapes the
jitted graph was built for (the framework's static-shape contract).

Usage:
  python tools/export.py --cfg_file configs/hgsfusion_vod.yaml \
      --ckpt_dir output/hgsfusion_vod/default/ckpt --out model.stablehlo
  # serving side:
  from jax import export
  exported = export.deserialize(open("model.stablehlo", "rb").read())
  dets = exported.call(batch)   # dict of fixed-shape detection arrays
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_serving_fn(cfg, model_cfg, params, batch_stats):
    """Closure: batch dict -> fixed-shape detections, params baked in."""
    import jax

    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.trainer import (
        make_eval_step_for_cfg, model_inputs,
    )

    model = build_network(cfg, model_cfg)
    eval_step = make_eval_step_for_cfg(cfg, model_cfg, model)

    def serve(batch):
        return eval_step(params, batch_stats, model_inputs(batch))

    return jax.jit(serve)


def export_model(cfg, model_cfg, params, batch_stats, example_batch,
                 platforms=None):
    """-> jax.export.Exported for the serving closure on example shapes."""
    import jax
    from jax import export as jexport

    from hgsfusion_tpu.train.trainer import model_inputs

    serve = build_serving_fn(cfg, model_cfg, params, batch_stats)
    args = (model_inputs(example_batch),)
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
    return jexport.export(
        serve, platforms=platforms or [jexport.default_export_platform()],
    )(*specs)


def main():
    import jax
    import jax.numpy as jnp

    from hgsfusion_tpu.config import cfg_from_list, load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.checkpoint import CheckpointManager
    from hgsfusion_tpu.train.trainer import device_batch, model_inputs
    from hgsfusion_tpu.utils.common import create_logger

    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--out", required=True, help="output .stablehlo path")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="target platforms (default: current backend)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=None)
    args = p.parse_args()

    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)
    model_cfg = model_config_from_yaml(cfg)
    logger = create_logger()

    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    if len(dataset) == 0:
        raise SystemExit("dataset is empty — run tools/create_infos.py first")
    example = dataset.collate_batch([dataset[0]])
    example = {k: jnp.asarray(v) for k, v in device_batch(example).items()}

    model = build_network(cfg, model_cfg)
    from hgsfusion_tpu.train.trainer import add_init_anchors

    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, False)
    )(add_init_anchors(model_inputs(example), cfg, model_cfg))
    params, stats = variables["params"], variables.get("batch_stats", {})
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        raw = mgr.manager.restore(args.ckpt_step or mgr.latest_step())
        params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
        stats = jax.tree_util.tree_map(jnp.asarray, raw["batch_stats"])

    exported = export_model(cfg, model_cfg, params, stats, example,
                            platforms=args.platforms)
    blob = exported.serialize()
    Path(args.out).write_bytes(blob)
    logger.info(
        f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
        f"platforms {exported.platforms}, "
        f"inputs {sorted(exported.in_avals[0].keys()) if isinstance(exported.in_avals[0], dict) else 'pytree'})"
    )


if __name__ == "__main__":
    main()
