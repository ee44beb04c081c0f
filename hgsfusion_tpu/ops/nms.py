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

from .rotated_iou import boxes_iou_bev, boxes_iou_bev_blocked

# masked-score sentinel: scores are sigmoid probabilities in [0, 1], so -1
# suffices and keeps the exact_top_k bisection bracket tight (a -1e9
# sentinel would widen the bracket to ~1e9 and cost ~30 bits of the
# fixed-pass bisection's precision on near-ties at rank k)
NEG_INF = -1.0


def greedy_nms_lazy(boxes, valid, nms_thresh: float, max_keep: int):
    """Greedy rotated NMS without materializing the (N, N) IoU matrix.

    Candidates must be score-sorted descending (as from exact_top_k). Each
    while_loop iteration keeps exactly ONE box and suppresses via a single
    (1, N) IoU row, then jumps straight to the next unsuppressed candidate —
    suppressed boxes cost no iterations. Total work is O(kept * N) instead
    of the O(N^2) matrix + O(N) sweep; `max_keep` (= NMS_POST_MAXSIZE)
    bounds the kept count, which is exact for the returned set because the
    caller truncates to max_keep anyway. Same keep set as
    greedy_suppress(iou > thresh, valid) restricted to its first max_keep
    True entries (tested).

    Returns keep (N,) bool with at most max_keep entries set.
    """
    n = boxes.shape[0]
    idxs = jnp.arange(n)

    def next_live(suppressed, after):
        live = valid & ~suppressed & (idxs > after)
        return jnp.where(jnp.any(live), jnp.argmax(live), n).astype(jnp.int32)

    def cond(carry):
        i, keep, suppressed, kept = carry
        return (i < n) & (kept < max_keep)

    def body(carry):
        i, keep, suppressed, kept = carry
        ic = jnp.clip(i, 0, n - 1)
        keep = keep.at[ic].set(True)
        row = boxes_iou_bev(
            jax.lax.dynamic_slice_in_dim(boxes, ic, 1, axis=0), boxes
        )[0]
        suppressed = suppressed | ((row > nms_thresh) & (idxs > i))
        return next_live(suppressed, i), keep, suppressed, kept + 1

    i0 = jnp.where(jnp.any(valid), jnp.argmax(valid), n).astype(jnp.int32)
    _, keep, _, _ = jax.lax.while_loop(
        cond, body,
        (i0, jnp.zeros((n,), bool), jnp.zeros((n,), bool), jnp.int32(0)),
    )
    return keep


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

    # lazy greedy: one IoU row per KEPT box, capped at post_max_size kept —
    # O(kept * pre_max) instead of the O(pre_max^2) suppression matrix
    keep = greedy_nms_lazy(top_boxes, top_valid, nms_thresh, post_max_size)

    # select the first post_max_size kept candidates (already score-ordered)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel = keep & (rank < post_max_size)
    # scatter kept candidates into the output slots by rank
    slot = jnp.where(sel, rank, post_max_size)  # invalid -> dumped slot
    out_idx = jnp.zeros((post_max_size + 1,), dtype=top_idx.dtype).at[slot].set(top_idx)[
        :post_max_size
    ]
    out_valid = jnp.zeros((post_max_size + 1,), dtype=bool).at[slot].set(True)[
        :post_max_size
    ]
    return out_idx, out_valid
