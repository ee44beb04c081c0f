"""TTA evaluation CLI (reference: tools/test_tta.py + eval_one_epoch_tta).

Same surface as tools/test.py but each val frame is evaluated `--tta_num`
times under random augmentations, predictions scored against the augmented
gt of each variant (matching the reference's no-inverse-ensembling protocol).
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--tta_num", type=int, default=4)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgsfusion_tpu.config import cfg_from_list, load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.eval.tta import make_tta_variants
    from hgsfusion_tpu.models.anchors import TargetAssigner
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.checkpoint import CheckpointManager
    from hgsfusion_tpu.train.trainer import (
        detections_to_pred_dicts, device_batch, make_eval_step,
    )
    from hgsfusion_tpu.utils.common import create_logger

    args = parse_args()
    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)
    model_cfg = model_config_from_yaml(cfg)

    out_dir = Path(args.output_dir) / cfg.TAG / args.extra_tag / "eval_tta"
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "eval_tta.log")

    # tta=True: gt stays available in test mode (vod_dataset.py:32)
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    model = build_network(cfg, model_cfg)
    assigner = TargetAssigner(
        [dict(c) for c in cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
        model_cfg.grid_size, model_cfg.pc_range, class_names=model_cfg.class_names,
    )
    first = dataset.collate_batch([dataset[0]])
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(
        {k: jnp.asarray(v) for k, v in device_batch(first).items()}
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        step = args.ckpt_step or mgr.latest_step()
        raw = mgr.manager.restore(step)
        params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
        batch_stats = jax.tree_util.tree_map(jnp.asarray, raw["batch_stats"])
        logger.info(f"loaded checkpoint step {step}")

    eval_step = jax.jit(
        make_eval_step(model, assigner, model_cfg, dict(cfg.MODEL.POST_PROCESSING))
    )

    det_annos, gt_annos = [], []
    n = len(dataset) if args.max_frames is None else min(args.max_frames, len(dataset))
    for i in range(n):
        # eval mode drops gt; rebuild the sample with gt for TTA scoring
        input_dict = dataset.compose_input_dict(i)
        data_dict = dataset.prepare_data(input_dict) or dataset.prepare_data(
            dataset.compose_input_dict(i)
        )
        sample = dataset.pad_to_static(data_dict)
        calib = input_dict["calib"]
        for variant in make_tta_variants(sample, calib, args.tta_num, seed=i):
            batch = dataset.collate_batch([variant])
            jb = {k: jnp.asarray(v) for k, v in device_batch(batch).items()}
            out = eval_step(params, batch_stats, jb)
            pred_dicts = detections_to_pred_dicts(out, batch)
            det_annos += dataset.generate_prediction_dicts(
                batch, pred_dicts, dataset.class_names
            )
            # augmented gt as the matching gt anno (eval_one_epoch_tta:253-260)
            gt = np.asarray(batch["gt_boxes"][0])
            gt = gt[gt[:, -1] > 0]
            from hgsfusion_tpu.utils import box_utils

            cam = box_utils.boxes3d_lidar_to_kitti_camera(gt[:, :7], calib)
            bbox = box_utils.boxes3d_kitti_camera_to_imageboxes(
                cam, calib, image_shape=np.asarray(batch["image_shape"][0]).reshape(-1)
            )
            names = np.array(
                [dataset.class_names[int(c) - 1] for c in gt[:, -1]]
            )
            gt_annos.append(
                {
                    "name": names, "location": cam[:, 0:3],
                    "dimensions": cam[:, 3:6], "rotation_y": cam[:, 6],
                    "bbox": bbox, "alpha": np.zeros(len(gt)),
                    "occluded": np.zeros(len(gt)), "truncated": np.zeros(len(gt)),
                    "difficulty": np.zeros(len(gt), np.int32),
                }
            )
        if i % 20 == 0:
            logger.info(f"tta eval {i}/{n}")

    # dataset-specific protocol over the AUGMENTED per-variant gts (the
    # reference's eval_one_epoch_tta scores via dataset.evaluation,
    # eval_utils.py:303-307; TJ4D must not be scored with the VoD ROI/IoU
    # protocol)
    from hgsfusion_tpu.datasets.tj4d import TJ4DDataset

    if isinstance(dataset, TJ4DDataset):
        from hgsfusion_tpu.eval.tj4d_eval import tj4d_official_eval

        result_str, result_dict = tj4d_official_eval(
            gt_annos, det_annos, dataset.class_names
        )
    else:
        from hgsfusion_tpu.eval.vod_eval import vod_official_eval

        result_str, result_dict = vod_official_eval(
            gt_annos, det_annos, dataset.class_names
        )
    logger.info("\n" + result_str)
    with open(out_dir / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)


if __name__ == "__main__":
    main()
