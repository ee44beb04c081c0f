"""Demo: run the detector on frames and render visualizations.

Reference: tools/demo.py:23-112 (open3d interactive viewer) and
tools/visual_tools/* (matplotlib BEV renderers). Headless TPU hosts have no
GL, so this renders matplotlib BEV images (points + gt + predictions) to PNG
and — the interactive equivalent of the reference's open3d window —
self-contained HTML 3D viewers (--html; orbit/zoom/pan in any browser,
utils/visual_3d.py)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def draw_bev(ax, points, boxes=None, labels=None, scores=None, color="lime",
             pc_range=(0, -25.6, 51.2, 25.6)):
    import numpy as np

    from hgsfusion_tpu.utils.box_utils import boxes_to_corners_bev

    ax.scatter(points[:, 0], points[:, 1], s=0.4, c="white", alpha=0.6)
    if boxes is not None and len(boxes):
        corners = np.asarray(boxes_to_corners_bev(np.asarray(boxes)))
        for i, c in enumerate(corners):
            ring = np.concatenate([c, c[:1]], axis=0)
            ax.plot(ring[:, 0], ring[:, 1], color=color, linewidth=0.8)
            if scores is not None:
                ax.text(c[0, 0], c[0, 1], f"{scores[i]:.2f}", color=color,
                        fontsize=5)
    ax.set_facecolor("black")
    ax.set_xlim(pc_range[0], pc_range[2])
    ax.set_ylim(pc_range[1], pc_range[3])
    ax.set_aspect("equal")


def draw_image_boxes(ax, image, boxes, calib, color="lime", scores=None,
                     show_image=True):
    """Project 3D boxes onto the camera image and draw the 12 box edges
    (visual_result_vod_graps.py lidar2img/plot_boxes:130-171)."""
    import numpy as np

    from hgsfusion_tpu.utils.box_utils import boxes_to_corners_3d

    if show_image:
        ax.imshow(image.astype("uint8") if image.max() > 1.5 else image)
    if boxes is None or not len(boxes):
        return
    corners = np.asarray(boxes_to_corners_3d(np.asarray(boxes)))  # (N, 8, 3)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    h, w = image.shape[:2]
    for bi, c in enumerate(corners):
        uv, depth = calib.lidar_to_img(c)
        if (depth <= 0.5).any():  # behind or at the camera: skip the box
            continue
        if ((uv[:, 0] < 0) | (uv[:, 0] >= w)
                | (uv[:, 1] < 0) | (uv[:, 1] >= h)).all():
            continue
        for a, b in edges:
            ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]],
                    color=color, linewidth=0.8)
        if scores is not None:
            ax.text(uv[0, 0], uv[0, 1], f"{scores[bi]:.2f}", color=color,
                    fontsize=5)
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    ax.set_axis_off()


def main():
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from hgsfusion_tpu.config import load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.checkpoint import CheckpointManager
    from hgsfusion_tpu.train.trainer import (
        detections_to_pred_dicts, device_batch, make_eval_step_for_cfg,
    )
    from hgsfusion_tpu.utils.common import create_logger

    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--html", action="store_true",
                   help="also write an interactive 3D HTML viewer per frame "
                        "(the open3d-window equivalent for headless hosts)")
    args = p.parse_args()

    cfg = load_config(args.cfg_file)
    model_cfg = model_config_from_yaml(cfg)
    logger = create_logger()
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    model = build_network(cfg, model_cfg)
    batch = dataset.collate_batch([dataset[0]])
    from hgsfusion_tpu.train.trainer import add_init_anchors

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(
        add_init_anchors(
            {k: jnp.asarray(v) for k, v in device_batch(batch).items()},
            cfg, model_cfg)
    )
    params, stats = variables["params"], variables["batch_stats"]
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        raw = mgr.manager.restore(mgr.latest_step())
        params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
        stats = jax.tree_util.tree_map(jnp.asarray, raw["batch_stats"])

    eval_step = jax.jit(make_eval_step_for_cfg(cfg, model_cfg, model))
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng4 = (
        model_cfg.pc_range[0], model_cfg.pc_range[1],
        model_cfg.pc_range[3], model_cfg.pc_range[4],
    )
    for i in range(min(args.frames, len(dataset))):
        batch = dataset.collate_batch([dataset[i]])
        out = eval_step(params, stats, {
            k: jnp.asarray(v) for k, v in device_batch(batch).items()
        })
        preds = detections_to_pred_dicts(out, batch)[0]
        pts = np.asarray(batch["points"][0])[np.asarray(batch["points_valid"][0])]
        gt = np.asarray(batch["gt_boxes"][0])
        gt = gt[gt[:, -1] > 0]

        fig, ax = plt.subplots(figsize=(8, 8), dpi=150)
        draw_bev(ax, pts, gt[:, :7], color="cyan", pc_range=rng4)
        draw_bev(ax, pts[:0], preds["pred_boxes"], scores=preds["pred_scores"],
                 color="lime", pc_range=rng4)
        ax.set_title(
            f"frame {batch['frame_id'][0]}: gt cyan, pred lime", color="black"
        )
        fig.savefig(out_dir / f"{batch['frame_id'][0]}_bev.png",
                    facecolor="gray")
        plt.close(fig)
        logger.info(f"wrote {out_dir}/{batch['frame_id'][0]}_bev.png")

        if args.html:
            from hgsfusion_tpu.utils.visual_3d import export_html

            out = export_html(
                out_dir / f"{batch['frame_id'][0]}_3d.html", pts,
                gt_boxes=gt[:, :7], pred_boxes=preds["pred_boxes"],
                pred_scores=preds["pred_scores"],
                title=f"frame {batch['frame_id'][0]} — gt cyan, pred green")
            logger.info(f"wrote {out}")

        # camera view with projected 3D boxes, when the frame carries one
        if "images" in batch and batch.get("calib") is not None:
            image = np.asarray(batch["images"][0])
            if image.dtype == np.uint8:  # raw-byte transport convention
                image = image.astype(np.float32) / 255.0
            calib = batch["calib"][0]
            fig, ax = plt.subplots(figsize=(10, 4), dpi=150)
            draw_image_boxes(ax, image, gt[:, :7], calib, color="cyan")
            draw_image_boxes(
                ax, image, preds["pred_boxes"], calib, color="lime",
                scores=preds["pred_scores"], show_image=False,
            )
            fig.savefig(out_dir / f"{batch['frame_id'][0]}_img.png")
            plt.close(fig)
            logger.info(f"wrote {out_dir}/{batch['frame_id'][0]}_img.png")


if __name__ == "__main__":
    main()
