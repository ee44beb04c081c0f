"""Training CLI.

Reference: tools/train.py + tools/train_utils/train_utils.py of the upstream
repo (arg surface kept close: --cfg_file, --batch_size, --epochs, --ckpt,
--extra_tag, --set overrides). TPU-native loop: one jitted train step over a
data mesh; auto-resume from the newest orbax checkpoint.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--ckpt", default=None, help="explicit checkpoint to resume")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--max_ckpt_save_num", type=int, default=30)
    p.add_argument("--fix_random_seed", action="store_true")
    p.add_argument("--merge_all_iters_to_one_epoch", action="store_true",
                   help="fold all epochs into one long epoch (reference flag)")
    p.add_argument("--workers", type=int, default=4,
                   help="prefetch loader threads (0 = synchronous)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="cap total steps (smoke tests)")
    p.add_argument("--profile_steps", type=str, default=None,
                   help="START:END step range to capture a jax.profiler trace")
    p.add_argument("--disable_aug_last_epochs", type=int, default=0,
                   help="disable augmentation for the last N epochs "
                        "(DisableAugmentationHook, train_utils.py:257-272)")
    p.add_argument("--ckpt_save_interval_s", type=float, default=300.0,
                   help="periodic latest-checkpoint interval "
                        "(train_utils.py:135-143)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgsfusion_tpu.config import cfg_from_list, load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.datasets.loader import PrefetchLoader
    from hgsfusion_tpu.models.anchors import TargetAssigner
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.parallel.mesh import make_mesh, shard_batch
    from hgsfusion_tpu.train.checkpoint import CheckpointManager
    from hgsfusion_tpu.train.optim import build_optimizer
    from hgsfusion_tpu.train.trainer import (
        TrainState, device_batch, make_train_step,
    )
    from hgsfusion_tpu.utils.common import create_logger

    args = parse_args()
    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)
    model_cfg = model_config_from_yaml(cfg)

    out_dir = Path(args.output_dir) / cfg.TAG / args.extra_tag
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "train.log")
    logger.info(f"devices: {jax.devices()}")
    # tensorboard (reference: tensorboardX SummaryWriter, train_utils.py:129-133)
    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(str(out_dir / "tensorboard"))
    except Exception:
        tb = None
    prof_range = None
    if args.profile_steps:
        prof_range = tuple(int(x) for x in args.profile_steps.split(":"))

    if args.fix_random_seed:
        np.random.seed(666)

    n_dev = len(jax.devices())
    per_dev_bs = args.batch_size or int(cfg.OPTIMIZATION.get("BATCH_SIZE_PER_DEVICE", 1))
    batch_size = per_dev_bs * n_dev
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True,
                            logger=logger)
    if args.merge_all_iters_to_one_epoch:
        # one long epoch instead of per-epoch boundaries (reference
        # train.py --merge_all_iters_to_one_epoch)
        dataset._merge_all_iters_to_one_epoch = True
        dataset.total_epochs = epochs
        epochs = 1
    if len(dataset) == 0:
        raise SystemExit(
            f"dataset is empty — generate info files first: "
            f"python tools/create_infos.py --cfg_file {args.cfg_file}"
        )
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * epochs
    logger.info(
        f"dataset {len(dataset)} frames, batch {batch_size}, "
        f"{steps_per_epoch} steps/epoch, {total_steps} total"
    )

    model = build_network(cfg, model_cfg)
    mppnet = cfg.MODEL.NAME in ("MPPNet", "MPPNetE2E")
    head_cfg = cfg.MODEL.get("DENSE_HEAD")
    if head_cfg is None and not mppnet:
        raise NotImplementedError(
            f"no train-step dispatch for model {cfg.MODEL.NAME!r} "
            "(config has no DENSE_HEAD and it is not a known second-stage "
            "family)"
        )
    head_name = head_cfg.NAME if head_cfg is not None else ""
    center_head = head_name == "CenterHead"
    transfusion_head = head_name == "TransFusionHead"
    # two-stage (RoIHeadTemplate) families and their loss recipes
    TWOSTAGE_FAMILIES = {
        "PVRCNN": "pvrcnn", "PV-RCNN": "pvrcnn",
        "PVRCNNPlusPlus": "pvrcnnpp", "PV-RCNN++": "pvrcnnpp",
        "VoxelRCNN": "voxelrcnn",
        "SECONDNetIoU": "secondiou",
        "PointRCNN": "pointrcnn",
        "PartA2Net": "parta2", "PartA2": "parta2",
    }
    if mppnet:
        TWOSTAGE_FAMILIES["MPPNet"] = TWOSTAGE_FAMILIES["MPPNetE2E"] = "mppnet"
    twostage = TWOSTAGE_FAMILIES.get(cfg.MODEL.NAME)
    pvrcnn = twostage is not None and twostage not in ("pointrcnn", "mppnet")
    multihead = head_name == "AnchorHeadMulti"
    assigner = None
    if (not center_head and not transfusion_head
            and twostage not in ("pointrcnn", "mppnet")):
        if multihead:
            from hgsfusion_tpu.train.trainer import make_anchor_assigner

            assigner = make_anchor_assigner(cfg, model_cfg)
        else:
            assigner = TargetAssigner(
                [dict(c) for c in cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
                model_cfg.grid_size, model_cfg.pc_range,
                class_names=model_cfg.class_names,
            )
    loss_weights = (
        dict(head_cfg.LOSS_CONFIG.LOSS_WEIGHTS) if head_cfg is not None else {}
    )

    mesh = make_mesh()

    loader = PrefetchLoader(
        dataset, batch_size, shuffle=True, num_workers=args.workers,
        prefetch=2,
    )
    batch_iter = loader.batches()
    example = next(batch_iter)

    example_inputs = {
        k: jnp.asarray(v) for k, v in example.items()
        if not isinstance(v, list) and k != "batch_size"
    }
    if pvrcnn:
        example_inputs["anchors"] = assigner.flat_anchors
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, False)
    )(example_inputs)
    tx, lr_schedule = build_optimizer(
        cfg.OPTIMIZATION, total_steps, variables["params"]
    )
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32),
    )

    ckpt = CheckpointManager(out_dir / "ckpt", max_to_keep=args.max_ckpt_save_num)
    # --ckpt accepts a step number OR a checkpoint-dir path (the reference
    # CLI takes a .pth path; an orbax dir stands in for that here)
    resume_step = None
    if args.ckpt:
        try:
            resume_step = int(args.ckpt)
        except ValueError:
            ext = CheckpointManager(args.ckpt)
            raw = ext.manager.restore(ext.latest_step())
            state = TrainState(
                params=jax.tree_util.tree_map(
                    jnp.asarray, raw["params"]),
                batch_stats=jax.tree_util.tree_map(
                    jnp.asarray, raw["batch_stats"]),
                opt_state=state.opt_state, step=state.step,
            )
            logger.info(
                f"loaded weights from {args.ckpt} "
                f"(step {ext.latest_step()}, fresh optimizer)")
    restored, step0 = ckpt.restore(state, step=resume_step)
    if restored is not None:
        state = restored
        logger.info(f"auto-resumed from step {step0}")

    if center_head:
        from hgsfusion_tpu.train.trainer import make_center_train_step

        train_step = jax.jit(
            make_center_train_step(model, tx, loss_weights, model_cfg)
        )
    elif transfusion_head:
        from hgsfusion_tpu.train.trainer import make_transfusion_train_step

        train_step = jax.jit(
            make_transfusion_train_step(model, tx, loss_weights, model_cfg)
        )
    elif twostage is not None:
        from hgsfusion_tpu.train.trainer import make_twostage_train_step

        train_step = jax.jit(
            make_twostage_train_step(
                model, assigner, tx, loss_weights, model_cfg, family=twostage
            )
        )
    elif multihead:
        from hgsfusion_tpu.train.trainer import make_multihead_train_step

        train_step = jax.jit(
            make_multihead_train_step(
                model, assigner, tx, loss_weights, model_cfg
            )
        )
    else:
        train_step = jax.jit(
            make_train_step(model, assigner, tx, loss_weights, model_cfg)
        )

    start_step = int(state.step)
    t_start = time.time()
    t_last_save = time.time()
    aug_disabled = False
    for step in range(start_step, total_steps):
        if args.max_steps is not None and step - start_step >= args.max_steps:
            break
        if (
            args.disable_aug_last_epochs > 0 and not aug_disabled
            and step >= (epochs - args.disable_aug_last_epochs) * steps_per_epoch
        ):
            # disable only DISABLE_AUG_LIST entries (DisableAugmentationHook,
            # train_utils.py:257-272) — typically gt_sampling; world
            # flip/rot/scale stay active in the final epochs
            hook = cfg.get("HOOK", {}).get("DisableAugmentationHook", {})
            disable = set(hook.get("DISABLE_AUG_LIST", ["gt_sampling"]))
            dataset.data_augmentor.queue = [
                (fn, c) for fn, c in dataset.data_augmentor.queue
                if c["NAME"] not in disable
            ]
            logger.info(
                f"augmentations {sorted(disable)} disabled for the final "
                f"epochs")
            aug_disabled = True
        if prof_range and step == prof_range[0]:
            jax.profiler.start_trace(str(out_dir / "profile"))
        batch = shard_batch(device_batch(next(batch_iter)), mesh)
        state, metrics = train_step(state, batch)
        if prof_range and step == prof_range[1]:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {out_dir}/profile")
        if step % 50 == 0 or step == total_steps - 1:
            metrics = {k: float(v) for k, v in metrics.items()}
            lr = float(lr_schedule(step))
            logger.info(
                f"step {step}/{total_steps} loss {metrics['loss']:.4f} ("
                + " ".join(
                    f"{k.replace('rpn_loss_', '').replace('loss_', '')} {v:.4f}"
                    for k, v in sorted(metrics.items()) if k != "loss"
                )
                + f") lr {lr:.2e} {(time.time() - t_start):.0f}s"
            )
            if tb is not None:
                for k, v in metrics.items():
                    tb.add_scalar(f"train/{k}", v, step)
                tb.add_scalar("meta/learning_rate", lr, step)
        if (step + 1) % steps_per_epoch == 0:
            ckpt.save(step + 1, jax.device_get(state))
            t_last_save = time.time()
            logger.info(f"saved checkpoint at step {step + 1}")
        elif time.time() - t_last_save > args.ckpt_save_interval_s:
            # crash-resilience checkpoint (reference 'latest_model' every 300 s)
            ckpt.save(step + 1, jax.device_get(state))
            t_last_save = time.time()
            logger.info(f"periodic checkpoint at step {step + 1}")
    ckpt.save(int(state.step), jax.device_get(state), wait=True)
    logger.info("training done")


if __name__ == "__main__":
    main()
