"""Detection-level polar-vs-gather equivalence (post-NMS boxes).

Replaces the round-4 corr>0.95-on-raw-logits gate (VERDICT r4 weak #2)
with the comparison that actually matters for the north star: the two
view transforms' DETECTIONS after decode + NMS, using weights TRAINED on
structured scenes (random weights give near-tied scores, where ordering
noise says nothing about the approximation). The flagship-scale version
of this study — official-protocol AP deltas across J/N knobs on real
TPU — is recorded in BASELINE.md round 5; this test pins the invariant
at CI scale.

Scene semantics mirror datasets/synthetic.py structured mode: radar and
virtual points cluster inside the gt boxes with class-signature features
(rcs = 4 + 2*class), virtual one-hots carry the true class, the image
shows a class-colored blob at each box's projection.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgsfusion_tpu.config import ConfigDict
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.models.detector import (
    HGSFusionModel, post_process,
)
from hgsfusion_tpu.train.optim import build_optimizer
from hgsfusion_tpu.train.trainer import TrainState, make_train_step

from test_model import ANCHOR_CFG, TINY
from test_train import LOSS_WEIGHTS, OPTIM_CFG

CAR = (6.0, 1.0, -0.8, 3.9, 1.6, 1.56)
PED = (10.0, -2.0, -0.5, 0.8, 0.6, 1.73)


def _cluster(rng, n, box7):
    cx, cy, cz, dx, dy, dz, ry = box7
    local = rng.uniform(-0.5, 0.5, (n, 3)) * np.array([dx, dy, dz])
    c, s = np.cos(ry), np.sin(ry)
    out = np.empty((n, 3), np.float32)
    out[:, 0] = cx + local[:, 0] * c - local[:, 1] * s
    out[:, 1] = cy + local[:, 0] * s + local[:, 1] * c
    out[:, 2] = cz + local[:, 2]
    return out


def make_structured_batch(rng, ry_car=0.3, ry_ped=-0.5):
    """One learnable frame at TINY scale (two objects, cluster + blobs)."""
    b, n = 1, 192
    boxes = [(*CAR, ry_car, 1, 0), (*PED, ry_ped, 2, 1)]
    pts = np.zeros((b, n, 17), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 1.5, (b, n))
    pts[..., 3] = rng.randn(b, n).astype(np.float32)
    pts[..., 15] = (rng.rand(b, n) > 0.5).astype(np.float32)
    pts[..., 16] = 1.0
    half = n // 2
    for k, (x, y, z, dx, dy, dz, ry, _lab, cls_i) in enumerate(boxes):
        sl = slice(k * half // 2, (k + 1) * half // 2)
        m = sl.stop - sl.start
        pts[0, sl, 0:3] = _cluster(rng, m, (x, y, z, dx, dy, dz, ry))
        pts[0, sl, 3] = 4.0 + 2.0 * cls_i + 0.3 * rng.randn(m)
        # virtual one-hot: label slot = class index, virtual flag col 15=1
        pts[0, sl, 4:12] = 0.0
        pts[0, sl, 4 + cls_i] = 1.0
        pts[0, sl, 15] = 1.0

    images = np.full((b, 64, 96, 3), 96 / 255.0, np.float32)
    images += rng.rand(b, 64, 96, 3).astype(np.float32) * 0.03
    l2c = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3], [0, 0, 0, 1]],
        np.float32)
    c2i = np.array([[80.0, 0, 48, 0], [0, 80, 32, 0], [0, 0, 1, 0]],
                   np.float32)
    colors = np.array([[0.9, 0.2, 0.2], [0.2, 0.9, 0.2]], np.float32)
    for (x, y, z, dx, dy, dz, ry, _lab, cls_i) in boxes:
        cam = l2c @ np.array([x, y, z, 1.0], np.float32)
        uvw = c2i @ cam
        u, v = int(uvw[0] / uvw[2]), int(uvw[1] / uvw[2])
        su = max(int(80 * max(dx, dy) / cam[2] / 2), 3)
        sv = max(int(80 * dz / cam[2] / 2), 3)
        images[0, max(v - sv, 0): v + sv, max(u - su, 0): u + su] = (
            colors[cls_i])

    gt = np.zeros((b, 8, 8), np.float32)
    gt[0, 0] = [*boxes[0][:7], boxes[0][7]]
    gt[0, 1] = [*boxes[1][:7], boxes[1][7]]
    return {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, n), bool),
        "images": jnp.asarray(images),
        "trans_lidar_to_cam": jnp.asarray(l2c)[None],
        "trans_cam_to_img": jnp.asarray(c2i)[None],
        "lidar_aug_matrix": jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                     (b, 1, 1)),
        "gt_boxes": jnp.asarray(gt),
    }


POLAR_KW = dict(f2v_view="polar", f2v_polar_zeta_bins=48,
                f2v_polar_near_columns=4)


@pytest.fixture(scope="module")
def trained_state():
    """300 steps of gather-path training on two structured frames.

    300 (not fewer): the focal-loss positive signal crosses the 0.1
    score threshold around step ~150 at this scale (max sigmoid score
    0.013 at step 100 -> 0.25 at 150 -> 0.93 at 300); a 60-step model
    detects nothing anywhere and the comparison is vacuous.
    """
    rng = np.random.RandomState(7)
    frames = [make_structured_batch(rng, 0.3, -0.5),
              make_structured_batch(rng, -1.2, 2.0)]
    model = HGSFusionModel(cfg=TINY)
    assigner = TargetAssigner(ANCHOR_CFG, TINY.grid_size, TINY.pc_range,
                              class_names=TINY.class_names)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), frames[0], False))()
    tx, _ = build_optimizer(OPTIM_CFG, total_steps=300,
                            params=variables["params"])
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(model, assigner, tx, LOSS_WEIGHTS,
                                      TINY))
    loss0 = loss = None
    for i in range(300):
        state, tb = step_fn(state, frames[i % 2])
        loss = float(tb["loss"])
        if loss0 is None:
            loss0 = loss
    assert np.isfinite(loss) and loss < loss0
    return state, assigner, frames


def _detections(cfg, state, assigner, batch):
    model = HGSFusionModel(cfg=cfg)
    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, False)
    out = post_process(
        preds, assigner.flat_anchors, assigner.box_coder, cfg,
        score_thresh=0.1, nms_thresh=0.01, pre_max_size=256,
        post_max_size=16)
    valid = np.asarray(out["valid"][0])
    return (np.asarray(out["boxes"][0])[valid],
            np.asarray(out["scores"][0])[valid],
            np.asarray(out["labels"][0])[valid])


def _bev_iou(a, b):
    """Rotated BEV IoU on lidar boxes (n,7) x (m,7)."""
    from hgsfusion_tpu.eval.rotated_iou_np import rotate_iou_eval

    return rotate_iou_eval(a[:, [0, 1, 3, 4, 6]], b[:, [0, 1, 3, 4, 6]])


class TestDetectionEquivalence:
    @pytest.mark.parametrize("frame_idx", [0, 1])
    def test_polar_matches_gather_post_nms(self, trained_state, frame_idx):
        """Evaluated on the TRAINING frames, deliberately: a 2-frame tiny
        model memorizes (it detects nothing on re-sampled noise, let
        alone unseen poses), and path equivalence needs confident
        detections on SOME input — which input doesn't matter, since
        both paths see the identical batch and weights."""
        state, assigner, frames = trained_state
        batch = frames[frame_idx]
        bg, sg, lg = _detections(TINY, state, assigner, batch)
        cfg_p = dataclasses.replace(TINY, **POLAR_KW)
        bp, sp, lp = _detections(cfg_p, state, assigner, batch)

        # both paths must find both objects (non-vacuous gate)
        assert len(bg) >= 2 and len(bp) >= 2, (len(bg), len(bp))
        # sanity: the trained model localizes each gt through BOTH paths
        gt = np.asarray(batch["gt_boxes"][0][:2, :7])
        for bx in (bg, bp):
            assert (_bev_iou(bx, gt).max(axis=0) > 0.5).all()

        # cross-path greedy matching at the protocol min-overlaps
        min_iou = np.where(lg == 1, 0.5, 0.25)
        iou = _bev_iou(bg, bp)
        matched, ious, sdelta = 0, [], []
        used = set()
        for ia in np.argsort(-sg):
            cand = [(iou[ia, ib], ib) for ib in range(len(bp))
                    if ib not in used and lp[ib] == lg[ia]
                    and iou[ia, ib] >= min_iou[ia]]
            if cand:
                best, ib = max(cand)
                used.add(ib)
                matched += 1
                ious.append(best)
                sdelta.append(abs(sg[ia] - sp[ib]))
        rate = matched / max(len(bg), len(bp))
        # observed at this scale: rate 1.0, cross-IoU >= 0.997, score
        # delta <= 0.002 — the gates leave headroom for platform noise
        assert rate >= 0.9, (rate, len(bg), len(bp), matched)
        assert np.median(ious) >= 0.9, ious
        assert np.mean(sdelta) <= 0.05, sdelta
