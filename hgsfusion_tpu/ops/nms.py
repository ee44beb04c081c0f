"""Rotated NMS, fully on-device (no host roundtrip).

The reference NMS (pcdet/ops/iou3d_nms/src/iou3d_nms.cpp:137-182) computes a
GPU bitmask then runs the greedy sweep on the *CPU* after a device->host
memcpy per call. Here the whole thing stays on-device: a blockwise rotated
IoU matrix + a masked greedy `fori_loop`, returning fixed-shape outputs
(indices padded to `post_max_size` + a validity mask), so it composes under
`jit` and never forces a sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev_blocked

NEG_INF = -1e9


def greedy_suppress(overlap: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS sweep over score-sorted candidates.

    Args:
      overlap: (N, N) bool, True where IoU > threshold (upper triangle used).
      valid: (N,) bool, candidate validity (e.g. passed score threshold).
    Returns:
      keep: (N,) bool.
    """
    n = overlap.shape[0]

    def body(i, carry):
        suppressed, keep = carry
        is_live = jnp.logical_and(~suppressed[i], valid[i])
        keep = keep.at[i].set(is_live)
        suppressed = jnp.where(is_live, suppressed | overlap[i], suppressed)
        return suppressed, keep

    suppressed0 = jnp.zeros((n,), dtype=bool)
    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, n, body, (suppressed0, keep0))
    return keep


def rotated_nms(boxes, scores, iou_threshold: float, valid=None,
                row_block: int = 256):
    """NMS over score-sorted (boxes, scores); returns keep mask (N,).

    Semantics of iou3d_nms_utils.nms_gpu:120-135 (IoU_bev > thresh
    suppresses), with candidates masked by `valid`.
    """
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    valid_sorted = jnp.ones_like(scores, dtype=bool) if valid is None else valid[order]
    iou = boxes_iou_bev_blocked(boxes_sorted, boxes_sorted, row_block=row_block)
    overlap = iou > iou_threshold
    keep_sorted = greedy_suppress(overlap, valid_sorted)
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep


def class_agnostic_nms(box_scores, box_preds, score_thresh: float,
                       nms_thresh: float, pre_max_size: int, post_max_size: int,
                       valid=None, row_block: int = 256):
    """Full post-processing NMS with fixed-shape outputs.

    Mirrors model_nms_utils.class_agnostic_nms:6-25 (score threshold ->
    top-`pre_max_size` -> rotated NMS -> first `post_max_size` kept in score
    order), but with static shapes: returns (indices (post_max,), valid mask
    (post_max,)) where indices point into the input arrays.
    """
    from .topk import exact_top_k

    n = box_scores.shape[0]
    ok = box_scores >= score_thresh
    if valid is not None:
        ok = ok & valid
    masked_scores = jnp.where(ok, box_scores, NEG_INF)
    k = min(pre_max_size, n)
    # lax.top_k is pathologically slow on TPU for large k (see ops/topk.py)
    top_scores, top_idx = exact_top_k(masked_scores, k)
    top_valid = top_scores > NEG_INF / 2
    top_boxes = box_preds[top_idx]

    # candidates are sorted valid-first: row blocks past the valid count are
    # skipped entirely (exact; see boxes_iou_bev_blocked)
    n_valid = jnp.sum(top_valid.astype(jnp.int32))
    iou = boxes_iou_bev_blocked(
        top_boxes, top_boxes, row_block=row_block, n_valid=n_valid
    )
    keep = greedy_suppress(iou > nms_thresh, top_valid)

    # select the first post_max_size kept candidates (already score-ordered)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel = keep & (rank < post_max_size)
    # scatter kept candidates into the output slots by rank
    out_idx = jnp.zeros((post_max_size,), dtype=top_idx.dtype)
    out_valid = jnp.zeros((post_max_size,), dtype=bool)
    slot = jnp.where(sel, rank, post_max_size)  # invalid -> dumped slot
    out_idx = jnp.zeros((post_max_size + 1,), dtype=top_idx.dtype).at[slot].set(top_idx)[
        :post_max_size
    ]
    out_valid = jnp.zeros((post_max_size + 1,), dtype=bool).at[slot].set(True)[
        :post_max_size
    ]
    return out_idx, out_valid
