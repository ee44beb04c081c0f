"""Train/eval step factories and the training loop.

Reference: tools/train_utils/train_utils.py:11-143 (per-step LR schedule,
grad clip, AMP) and tools/train.py. TPU-first: the whole step — forward,
target assignment, losses, grad, optimizer — is one jitted graph over global
(sharded) arrays; gradient all-reduce is inserted by XLA. Loss scaling / AMP
is unnecessary in bf16-on-TPU; mixed precision is a dtype policy instead.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.anchor_head import anchor_head_loss
from ..models.anchors import TargetAssigner
from ..models.detector import post_process
from ..models.occupancy import occupancy_loss
from ..utils.box_coder import ResidualCoder


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


MODEL_BATCH_KEYS = (
    "points", "points_valid", "images", "trans_lidar_to_cam",
    "trans_cam_to_img", "lidar_aug_matrix", "gt_boxes", "gt_boxes2d",
    "depth_maps",
    # MPPNet multi-frame contract (models/detector.py MPPNetModel)
    "points_multi", "points_multi_valid", "roi_boxes", "roi_scores",
    "roi_labels",
)


def model_inputs(batch: Dict) -> Dict:
    """Strip host-side metadata (frame ids, calib objects) from a batch."""
    return {k: batch[k] for k in MODEL_BATCH_KEYS if k in batch}


# models whose forward reads batch["anchors"] (detector.py _RPNProposals):
# every anchor-RPN two-stage family; PointRCNN/MPPNet propose from points
ANCHOR_INPUT_MODELS = (
    "PVRCNN", "PV-RCNN", "PVRCNNPlusPlus", "PV-RCNN++",
    "VoxelRCNN", "SECONDNetIoU", "PartA2Net", "PartA2",
)


def add_init_anchors(inputs: Dict, yaml_cfg, model_cfg) -> Dict:
    """Inject the flat anchor grid for init/inference of the two-stage
    families — tools that model.init without it crash with KeyError
    'anchors'. No-op for every other model."""
    if yaml_cfg.MODEL.NAME in ANCHOR_INPUT_MODELS:
        from ..models.anchors import TargetAssigner

        inputs = dict(inputs)
        inputs["anchors"] = TargetAssigner(
            [dict(c)
             for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
            model_cfg.grid_size, model_cfg.pc_range,
            class_names=model_cfg.class_names,
        ).flat_anchors
    return inputs


def device_batch(batch: Dict) -> Dict:
    """Keep only the array leaves a jitted step can consume."""
    import numpy as np

    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, jnp.ndarray)) and k != "batch_size"
    }


def create_train_state(model, tx, example_batch, rng) -> TrainState:
    variables = model.init(rng, model_inputs(example_batch), False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _grad_step(loss_fn, tx) -> Callable:
    """Shared value_and_grad -> optimizer update -> new TrainState.

    loss_fn(params, batch_stats, batch) -> (loss, (tb_dict, new_batch_stats));
    every detector family's train step is this plus its own loss_fn."""

    def step(state: TrainState, batch):
        (_, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        return TrainState(
            params=optax.apply_updates(state.params, upd),
            batch_stats=new_stats, opt_state=new_opt, step=state.step + 1,
        ), tb

    return step


def make_train_step(model, assigner: TargetAssigner, tx,
                    loss_weights: Dict, cfg, use_occ_loss: bool = True,
                    occ_max_half_extent: int = 48) -> Callable:
    """One jitted training step: loss = rpn (cls+loc+dir) + occupancy focal.

    Mirrors CaDDN.get_training_loss (caddn.py:58-99) with USE_DEPTH False.
    """
    anchors = assigner.flat_anchors

    def loss_fn(params, batch_stats, batch):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), True, mutable=["batch_stats"],
        )
        targets = assigner(batch["gt_boxes"])
        rpn_loss, tb = anchor_head_loss(
            preds, targets, anchors, cfg.num_class, loss_weights,
            dir_offset=cfg.dir_offset, num_dir_bins=cfg.num_dir_bins,
        )
        total = rpn_loss
        if use_occ_loss and "occupancy" in preds:
            occ = occupancy_loss(
                preds["occupancy"], batch["gt_boxes"], cfg.grid_size,
                cfg.pc_range, cfg.voxel_size, occ_max_half_extent,
            )
            tb = {**tb, "loss_occ": occ}
            total = total + occ
        if "focal_aux" in preds:
            # focal sparse backbone importance supervision, added unweighted
            # like the reference's hasattr(backbone_3d, 'get_loss') guard
            from ..models.focal_conv import focal_conv_loss

            fl = focal_conv_loss(
                preds["focal_aux"], batch["gt_boxes"], cfg.pc_range,
                cfg.voxel_size,
            )
            tb = {**tb, "loss_box_of_pts": fl}
            total = total + fl
        if "depth_logits" in preds and "depth_maps" in batch:
            from ..models.ddn_loss import ddn_loss

            dloss, dtb = ddn_loss(
                preds["depth_logits"], batch["depth_maps"],
                batch.get("gt_boxes2d", jnp.zeros(
                    (batch["gt_boxes"].shape[0], 1, 4), jnp.float32
                )),
                cfg.disc_cfg,
            )
            tb = {**tb, **dtb}
            total = total + dloss
        tb = {**tb, "loss": total}
        return total, (tb, mutated["batch_stats"])

    return _grad_step(loss_fn, tx)


def make_center_train_step(model, tx, loss_weights: Dict, cfg) -> Callable:
    """Training step for anchor-free CenterPoint-family detectors.

    Mirrors centerpoint.py get_training_loss -> CenterHead.get_loss
    (center_head.py:233-262); targets are assigned on-device inside the same
    jitted graph (center_head.center_targets).
    """
    from ..models.center_head import center_head_loss, center_targets

    gx, gy, _ = cfg.grid_size
    stride = cfg.center_feature_map_stride
    fmap_hw = (gy // stride, gx // stride)
    head_order = tuple(cfg.center_head_order)
    code_size = int(sum(cfg.center_head_channels))  # 8 (+2 with vel)
    code_weights = loss_weights.get("code_weights", [1.0] * code_size)

    def loss_fn(params, batch_stats, batch):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), True, mutable=["batch_stats"],
        )
        targets = center_targets(
            batch["gt_boxes"], cfg.num_class, fmap_hw, stride,
            cfg.pc_range, cfg.voxel_size,
            gaussian_overlap=cfg.center_gaussian_overlap,
            min_radius=cfg.center_min_radius,
            code_size=code_size,
        )
        total, tb = center_head_loss(
            preds, targets, head_order, code_weights,
            cls_weight=loss_weights.get("cls_weight", 1.0),
            loc_weight=loss_weights.get("loc_weight", 2.0),
        )
        tb = {**tb, "loss": total}
        return total, (tb, mutated["batch_stats"])

    return _grad_step(loss_fn, tx)


def make_center_eval_step(model, cfg, post_cfg: Dict) -> Callable:
    """Inference step for CenterPoint-family detectors: forward + fixed-K
    heatmap decode (+ range/score mask) + the final rotated NMS.

    A trained heatmap has gaussian-shaped responses, so cells adjacent to
    each peak also clear SCORE_THRESH and global top-K emits near-duplicate
    boxes; the reference therefore runs class_agnostic_nms with
    POST_PROCESSING.NMS_CONFIG after the decode (center_head.py:336-352).
    Configs without an NMS_CONFIG (unit tests) keep the raw decode."""
    from ..models.center_head import decode_center_boxes
    from ..ops.nms import class_agnostic_nms

    nms_cfg = post_cfg.get("NMS_CONFIG")
    nms_type = (nms_cfg or {}).get("NMS_TYPE", "nms_gpu")
    if nms_cfg is not None and nms_type in ("circle_nms",
                                            "class_specific_nms"):
        # the reference raises for circle_nms here too (center_head.py:350);
        # no shipped config uses class_specific_nms
        raise NotImplementedError(
            f"CenterPoint eval NMS_TYPE {nms_type} is not implemented")

    def eval_step(params, batch_stats, batch):
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), False,
        )
        out = decode_center_boxes(
            preds, cfg.center_max_k, cfg.center_feature_map_stride,
            cfg.pc_range, cfg.voxel_size, cfg.center_post_limit,
            score_thresh=post_cfg.get("SCORE_THRESH", 0.1),
        )
        if nms_cfg is None:
            return out
        pre = int(nms_cfg.get("NMS_PRE_MAXSIZE", out["scores"].shape[1]))
        post = int(nms_cfg.get("NMS_POST_MAXSIZE", out["scores"].shape[1]))
        thresh = float(nms_cfg["NMS_THRESH"])

        def one(bx, sc, lb, vd, vl):
            # score_thresh already applied by the decode (the reference
            # passes score_thresh=None into the NMS, center_head.py:340)
            idx, ok = class_agnostic_nms(
                sc, bx[:, :7], score_thresh=-1.0, nms_thresh=thresh,
                pre_max_size=pre, post_max_size=post, valid=vd)
            return (bx[idx], jnp.where(ok, sc[idx], 0.0), lb[idx], ok,
                    vl[idx])

        vels = out.get("vels")
        if vels is None:
            vels = jnp.zeros(out["boxes"].shape[:2] + (2,))
        boxes, scores, labels, valid, vels = jax.vmap(one)(
            out["boxes"], out["scores"], out["labels"], out["valid"], vels)
        res = {"boxes": boxes, "scores": scores, "labels": labels,
               "valid": valid}
        if "vels" in out:
            res["vels"] = vels
        return res

    return eval_step


def make_twostage_train_step(model, assigner, tx, loss_weights: Dict, cfg,
                             family: str = "pvrcnn") -> Callable:
    """Generic two-stage training step (the RoIHeadTemplate families).

    Loss terms by family (get_training_loss of the respective detectors):
      pvrcnn / pvrcnnpp: RPN anchor + keypoint fg BCE + RCNN cls/reg
      voxelrcnn:         RPN anchor + RCNN cls/reg
      secondiou:         RPN anchor + IoU-head BCE (second_net_iou.py)
      pointrcnn:         point head (focal cls + point-residual reg) + RCNN
      parta2:            RPN anchor + part head (focal + part BCE) + RCNN
    """
    from ..models.pvrcnn import point_fg_loss, rcnn_losses, roi_targets

    anchors = assigner.flat_anchors if assigner is not None else None
    coder = ResidualCoder()

    def loss_fn(params, batch_stats, batch):
        inputs = model_inputs(batch)
        if anchors is not None:
            inputs = {**inputs, "anchors": anchors}
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs, True, mutable=["batch_stats"],
        )
        total = jnp.zeros(())
        tb: Dict = {}
        if anchors is not None:
            targets = assigner(batch["gt_boxes"])
            rpn_loss, tb = anchor_head_loss(
                preds, targets, anchors, cfg.num_class, loss_weights,
                dir_offset=cfg.dir_offset, num_dir_bins=cfg.num_dir_bins,
            )
            total = total + rpn_loss
        if family in ("pvrcnn", "pvrcnnpp"):
            pt_loss = point_fg_loss(
                preds["point_logits"], preds["keypoints"], batch["gt_boxes"]
            )
            total = total + pt_loss
            tb = {**tb, "point_fg": pt_loss}
        elif family == "pointrcnn":
            from ..models.point_rcnn import point_head_loss, point_targets
            from ..utils.box_coder import PointResidualCoder

            pcoder = PointResidualCoder(mean_size=cfg.point_mean_sizes)
            xyz = batch["points"][..., :3]
            pt = point_targets(xyz, batch["points_valid"], batch["gt_boxes"])
            pl, ptb = point_head_loss(
                preds["point_cls_logits"], preds["point_box_encodings"],
                xyz, pt, pcoder,
            )
            total = total + pl
            tb = {**tb, **ptb}
        elif family == "parta2":
            from ..models.parta2 import part_head_loss, part_targets

            pt = part_targets(
                batch["points"][..., :3], batch["points_valid"],
                batch["gt_boxes"],
            )
            pl, ptb = part_head_loss(
                preds["seg_logits"], preds["part_pred"], pt
            )
            total = total + pl
            tb = {**tb, **ptb}

        if "focal_aux" in preds:
            from ..models.focal_conv import focal_conv_loss

            fl = focal_conv_loss(
                preds["focal_aux"], batch["gt_boxes"], cfg.pc_range,
                cfg.voxel_size,
            )
            tb = {**tb, "loss_box_of_pts": fl}
            total = total + fl
        rt = jax.vmap(roi_targets)(
            preds["rois"], preds["roi_valid"], batch["gt_boxes"]
        )
        if "iou_preds" in preds:
            from ..models.roi_heads import iou_head_loss

            il = iou_head_loss(preds["iou_preds"], rt)
            total = total + il
            tb = {**tb, "rcnn_iou": il}
        else:
            rcnn_loss, rtb = rcnn_losses(
                preds["rcnn_cls"], preds["rcnn_reg"], rt, preds["rois"],
                coder,
            )
            total = total + rcnn_loss
            tb = {**tb, **rtb}
        tb = {**tb, "loss": total}
        return total, (tb, mutated["batch_stats"])

    return _grad_step(loss_fn, tx)


def make_pvrcnn_train_step(model, assigner: TargetAssigner, tx,
                           loss_weights: Dict, cfg) -> Callable:
    """PV-RCNN two-stage training: RPN anchor loss + keypoint fg BCE +
    RCNN roi_iou cls / canonical-residual reg (pv_rcnn.get_training_loss)."""
    return make_twostage_train_step(
        model, assigner, tx, loss_weights, cfg, family="pvrcnn"
    )


def make_pvrcnn_eval_step(model, assigner, cfg, post_cfg: Dict) -> Callable:
    """Two-stage inference: refined boxes = decode_canonical(rcnn_reg, rois),
    scores = sigmoid(rcnn_cls), labels from the RPN proposals, final NMS.

    Serves every RoIHeadTemplate family with a reg branch (PV-RCNN(++),
    VoxelRCNN, PartA2, PointRCNN — the latter passes assigner=None since it
    has no anchors)."""
    from ..models.pvrcnn import decode_canonical
    from ..ops.nms import greedy_nms_lazy
    from ..utils.box_coder import ResidualCoder

    anchors = assigner.flat_anchors if assigner is not None else None
    coder = ResidualCoder()
    post_max = post_cfg["NMS_CONFIG"]["NMS_POST_MAXSIZE"]

    def eval_step(params, batch_stats, batch):
        inputs = model_inputs(batch)
        if anchors is not None:
            inputs = {**inputs, "anchors": anchors}
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs, False,
        )
        refined = jax.vmap(lambda r, ro: decode_canonical(r, ro, coder))(
            preds["rcnn_reg"], preds["rois"]
        )
        scores = jax.nn.sigmoid(preds["rcnn_cls"]) * preds["roi_valid"]
        ok = scores > post_cfg.get("SCORE_THRESH", 0.1)

        def one(boxes, s, labels, valid):
            order = jnp.argsort(-jnp.where(valid, s, -1.0))
            b_s, s_s, l_s, v_s = boxes[order], s[order], labels[order], valid[order]
            keep = greedy_nms_lazy(
                b_s, v_s, post_cfg["NMS_CONFIG"]["NMS_THRESH"], post_max
            )
            rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
            slot = jnp.where(keep & (rank < post_max), rank, post_max)
            ob = jnp.zeros((post_max + 1, 7)).at[slot].set(b_s)[:post_max]
            os_ = jnp.zeros((post_max + 1,)).at[slot].set(s_s)[:post_max]
            ol = jnp.zeros((post_max + 1,), l_s.dtype).at[slot].set(l_s)[:post_max]
            ov = jnp.zeros((post_max + 1,), bool).at[slot].set(True)[:post_max]
            return ob, os_, ol, ov

        boxes, s_out, labels, valid = jax.vmap(one)(
            refined, scores, preds["roi_labels"], ok
        )
        return {"boxes": boxes, "scores": s_out, "labels": labels,
                "valid": valid}

    return eval_step


def make_secondiou_eval_step(model, assigner: TargetAssigner, cfg,
                             post_cfg: Dict) -> Callable:
    """SECOND-IoU inference (second_net_iou.post_processing:148-152): the
    rectified IoU prediction (SCORE_TYPE cfg.iou_score_type) is the NMS
    score, and a FINAL class_agnostic_nms with POST_PROCESSING.NMS_CONFIG
    runs over the proposals — the stage-1 proposal NMS is loose (0.8 IoU)
    and ranked by raw cls scores, so without this pass overlapping
    duplicates survive and the rectified-score ordering (the model's core
    contribution) never applies. Configs without an NMS_CONFIG (unit
    tests) keep the score-mask-only behavior."""
    from ..models.roi_heads import rectified_scores
    from ..ops.nms import class_agnostic_nms

    anchors = assigner.flat_anchors
    nms_cfg = post_cfg.get("NMS_CONFIG")
    score_thresh = float(post_cfg.get("SCORE_THRESH", 0.1))

    def eval_step(params, batch_stats, batch):
        inputs = {**model_inputs(batch), "anchors": anchors}
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs, False,
        )
        iou = jax.nn.sigmoid(preds["iou_preds"])
        scores = rectified_scores(
            preds["roi_scores"], iou, score_type=cfg.iou_score_type
        ) * preds["roi_valid"]
        if nms_cfg is None:
            ok = (scores > score_thresh) & preds["roi_valid"]
            return {
                "boxes": preds["rois"], "scores": scores,
                "labels": preds["roi_labels"], "valid": ok,
            }
        r = scores.shape[1]
        pre = int(nms_cfg.get("NMS_PRE_MAXSIZE", r))
        post = int(nms_cfg.get("NMS_POST_MAXSIZE", r))
        thresh = float(nms_cfg["NMS_THRESH"])

        def one(bx, sc, lb, vd):
            idx, ok = class_agnostic_nms(
                sc, bx[:, :7], score_thresh=score_thresh,
                nms_thresh=thresh, pre_max_size=pre, post_max_size=post,
                valid=vd)
            return bx[idx], jnp.where(ok, sc[idx], 0.0), lb[idx], ok

        boxes, scores, labels, valid = jax.vmap(one)(
            preds["rois"], scores, preds["roi_labels"], preds["roi_valid"])
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid}

    return eval_step


def make_transfusion_train_step(model, tx, loss_weights: Dict, cfg) -> Callable:
    """Training step for TransFusion-family detectors (transfusion_head.py
    loss:342-383): gaussian heatmap focal + Hungarian-matched cls/L1."""
    from ..models.transfusion_head import transfusion_loss

    gx, gy, _ = cfg.grid_size
    stride = cfg.center_feature_map_stride
    fmap_hw = (gy // stride, gx // stride)

    def loss_fn(params, batch_stats, batch):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), True, mutable=["batch_stats"],
        )
        total, tb = transfusion_loss(
            preds, batch["gt_boxes"], cfg.num_class, cfg.pc_range,
            cfg.voxel_size, stride, fmap_hw,
            cls_weight=loss_weights.get("cls_weight", 1.0),
            bbox_weight=loss_weights.get("bbox_weight", 0.25),
            hm_weight=loss_weights.get("hm_weight", 1.0),
            code_weights=loss_weights.get("code_weights", (1.0,) * 8),
            gaussian_overlap=cfg.center_gaussian_overlap,
            min_radius=cfg.center_min_radius,
        )
        tb = {**tb, "loss": total}
        return total, (tb, mutated["batch_stats"])

    return _grad_step(loss_fn, tx)


def make_transfusion_eval_step(model, cfg, post_cfg: Dict) -> Callable:
    """Inference for TransFusion: per-query decode, no NMS (set prediction)."""
    from ..models.transfusion_head import transfusion_get_boxes

    def eval_step(params, batch_stats, batch):
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), False,
        )
        return transfusion_get_boxes(
            preds, cfg.pc_range, cfg.voxel_size, cfg.center_feature_map_stride,
            score_thresh=post_cfg.get("SCORE_THRESH", 0.0),
            post_center_range=cfg.center_post_limit,
        )

    return eval_step


def make_eval_step(model, assigner: TargetAssigner, cfg, post_cfg: Dict) -> Callable:
    """One jitted inference step: forward + decode + NMS, fixed shapes."""
    anchors = assigner.flat_anchors
    coder = assigner.box_coder

    def eval_step(params, batch_stats, batch):
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), False,
        )
        return post_process(
            preds, anchors, coder, cfg,
            score_thresh=post_cfg.get("SCORE_THRESH", 0.1),
            nms_thresh=post_cfg["NMS_CONFIG"]["NMS_THRESH"],
            pre_max_size=post_cfg["NMS_CONFIG"]["NMS_PRE_MAXSIZE"],
            post_max_size=post_cfg["NMS_CONFIG"]["NMS_POST_MAXSIZE"],
        )

    return eval_step


def detections_to_pred_dicts(out: Dict, batch: Dict) -> list:
    """Fixed-shape device outputs -> per-frame variable-length numpy dicts."""
    import numpy as np

    boxes = np.asarray(out["boxes"])
    if "vels" in out:  # nuScenes-style velocity: 9-dof boxes_lidar
        boxes = np.concatenate([boxes, np.asarray(out["vels"])], axis=-1)
    scores = np.asarray(out["scores"])
    labels = np.asarray(out["labels"])
    valid = np.asarray(out["valid"])
    pred_dicts = []
    for i in range(boxes.shape[0]):
        m = valid[i]
        pred_dicts.append(
            {
                "pred_boxes": boxes[i][m],
                "pred_scores": scores[i][m],
                "pred_labels": labels[i][m].astype(np.int64),
            }
        )
    return pred_dicts


def make_eval_step_for_cfg(yaml_cfg, model_cfg, model) -> Callable:
    """Family-dispatching eval-step factory shared by tools/test.py,
    tools/export.py, and tools/demo.py (one place for the head->decode
    routing instead of three copies)."""
    post_cfg = dict(yaml_cfg.MODEL.POST_PROCESSING)
    if yaml_cfg.MODEL.NAME in ("MPPNet", "MPPNetE2E"):
        # second stage only — no DENSE_HEAD in the config; proposals come in
        # through the batch and the pvrcnn decode (canonical residuals vs
        # rois, sigmoid rcnn_cls) serves the refinement head directly
        return make_pvrcnn_eval_step(model, None, model_cfg, post_cfg)
    head_cfg = yaml_cfg.MODEL.get("DENSE_HEAD")
    if head_cfg is None:
        raise NotImplementedError(
            f"no eval-step dispatch for model {yaml_cfg.MODEL.NAME!r} "
            "(config has no DENSE_HEAD and it is not a known second-stage "
            "family)"
        )
    head_name = head_cfg.NAME
    if head_name == "CenterHead":
        return make_center_eval_step(model, model_cfg, post_cfg)
    if head_name == "TransFusionHead":
        return make_transfusion_eval_step(model, model_cfg, post_cfg)
    if head_name == "AnchorHeadMulti":
        return make_multihead_eval_step(
            model, make_anchor_assigner(yaml_cfg, model_cfg), model_cfg,
            post_cfg)
    if yaml_cfg.MODEL.NAME in (
        "PVRCNN", "PV-RCNN", "PVRCNNPlusPlus", "PV-RCNN++", "VoxelRCNN",
        "PartA2Net", "PartA2", "PointRCNN", "SECONDNetIoU",
    ):
        assigner = None
        if yaml_cfg.MODEL.NAME != "PointRCNN":
            assigner = TargetAssigner(
                [dict(c)
                 for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
                model_cfg.grid_size, model_cfg.pc_range,
                class_names=model_cfg.class_names,
            )
        maker = (
            make_secondiou_eval_step
            if yaml_cfg.MODEL.NAME == "SECONDNetIoU" else make_pvrcnn_eval_step
        )
        return maker(model, assigner, model_cfg, post_cfg)
    assigner = TargetAssigner(
        [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
        model_cfg.grid_size, model_cfg.pc_range,
        class_names=model_cfg.class_names,
    )
    return make_eval_step(model, assigner, model_cfg, post_cfg)


# ---------------------------------------------------------------------------
# AnchorHeadMulti (grouped multihead) family
# ---------------------------------------------------------------------------

def make_anchor_assigner(yaml_cfg, model_cfg) -> TargetAssigner:
    """TargetAssigner from the yaml DENSE_HEAD: multihead anchor order and
    BOX_CODER_CONFIG (code_size / sincos) when AnchorHeadMulti."""
    from ..utils.box_coder import ResidualCoder

    head = yaml_cfg.MODEL.DENSE_HEAD
    tgt = head.get("TARGET_ASSIGNER_CONFIG", {})
    coder = ResidualCoder(**dict(tgt.get("BOX_CODER_CONFIG", {})))
    return TargetAssigner(
        [dict(c) for c in head.ANCHOR_GENERATOR_CONFIG],
        model_cfg.grid_size, model_cfg.pc_range,
        class_names=model_cfg.class_names, box_coder=coder,
        use_multihead=head.NAME == "AnchorHeadMulti",
    )


def make_multihead_train_step(model, assigner: TargetAssigner, tx,
                              loss_weights: Dict, cfg) -> Callable:
    """Train step for the AnchorHeadMulti family (anchor_head_multi.py
    get_cls_layer_loss/get_box_reg_layer_loss over per-head slices)."""
    from ..models.anchor_head import anchor_head_multi_loss

    shape0 = assigner.anchor_shapes[0]
    grid_hw = int(shape0[0] * shape0[1] * shape0[2])

    def loss_fn(params, batch_stats, batch):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), True, mutable=["batch_stats"],
        )
        targets = assigner(batch["gt_boxes"])
        total, tb = anchor_head_multi_loss(
            preds, targets, assigner, loss_weights, cfg.rpn_head_cfgs,
            grid_hw, dir_offset=cfg.dir_offset,
            num_dir_bins=cfg.num_dir_bins,
            separate_multihead=cfg.mh_separate_multihead,
        )
        tb = {**tb, "loss": total}
        return total, (tb, mutated["batch_stats"])

    return _grad_step(loss_fn, tx)


def make_multihead_eval_step(model, assigner: TargetAssigner, cfg,
                             post_cfg: Dict) -> Callable:
    """Inference step for AnchorHeadMulti: per-head decode + per-class NMS
    (post_processing MULTI_CLASSES_NMS branch)."""
    from ..models.detector import post_process_multihead

    def eval_step(params, batch_stats, batch):
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_inputs(batch), False,
        )
        return post_process_multihead(preds, assigner, cfg, post_cfg)

    return eval_step
