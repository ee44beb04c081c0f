"""Rotated BEV overlap / IoU / IoU3D, fully on-device with static shapes.

TPU-native replacement for the reference CUDA polygon-clipping kernels
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:104-340). Instead of the
sequential Sutherland-Hodgman clip (variable vertex counts), we use the
candidate-point + convex-hull formulation, which vectorizes cleanly:

  1. collect all 24 candidate intersection vertices per box pair
     (16 edge-pair intersections + 4+4 contained corners) with validity flags,
  2. sort valid candidates by angle around their centroid,
  3. shoelace over the sorted ring.

This is exact for convex-convex intersection and maps to pure vector ops
(the only "irregular" step is an argsort over 24 lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.box_utils import boxes_to_corners_bev

_EPS = 1e-8


def _cross2(o, a, b):
    """Cross product (a-o) x (b-o); broadcasting over leading dims."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _edges(corners):
    """(..., 4, 2) corners -> per-edge start/end (..., 4, 2) each."""
    starts = corners
    ends = jnp.roll(corners, shift=-1, axis=-2)
    return starts, ends


# Containment margin: corners of touching/identical boxes land exactly on the
# other box's edges, where f32 rounding can push the cross product slightly
# negative (order-of-evaluation dependent). 1e-4 m^2 is far below any
# detection-relevant overlap but absorbs that rounding.
_EPS_INSIDE = 1e-4


def _points_in_quad(points, quad):
    """points (..., P, 2) inside convex CCW quad (..., 4, 2) -> (..., P) bool."""
    s, e = _edges(quad)  # (..., 4, 2)
    # cross of edge direction with (point - edge start) >= 0 for all edges
    d = e - s  # (..., 4, 2)
    rel = points[..., :, None, :] - s[..., None, :, :]  # (..., P, 4, 2)
    cross = d[..., None, :, 0] * rel[..., 1] - d[..., None, :, 1] * rel[..., 0]
    return jnp.all(cross >= -_EPS_INSIDE, axis=-1)


def _edge_intersections(ca, cb):
    """All 16 edge-pair intersection points between quads ca, cb.

    ca, cb: (..., 4, 2). Returns points (..., 16, 2), valid (..., 16).
    """
    pa, pb = _edges(ca)  # (..., 4, 2) each
    qa, qb = _edges(cb)
    # broadcast to (..., 4, 4, 2): A edges x B edges
    p1 = pa[..., :, None, :]
    p2 = pb[..., :, None, :]
    q1 = qa[..., None, :, :]
    q2 = qb[..., None, :, :]
    r = p2 - p1
    s = q2 - q1
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q1 - p1
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pt = p1 + t[..., None] * r
    shape = pt.shape[:-3] + (16, 2)
    return pt.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _convex_area_from_candidates(points, valid):
    """Area of the convex hull of valid candidate points.

    points: (..., K, 2), valid: (..., K). All valid points are vertices of a
    convex polygon (possibly with duplicates). Sorts by angle around the
    centroid, then shoelace with wrap-around at the valid count.
    """
    k = points.shape[-2]
    validf = valid.astype(points.dtype)
    count = jnp.sum(validf, axis=-1)  # (...)
    denom = jnp.maximum(count, 1.0)
    center = jnp.sum(points * validf[..., None], axis=-2) / denom[..., None]
    rel = points - center[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    key = jnp.where(valid, ang, jnp.inf)  # invalid to the end
    order = jnp.argsort(key, axis=-1)
    sorted_rel = jnp.take_along_axis(rel, order[..., None], axis=-2)
    # next index with wrap at count
    idx = jnp.arange(k)
    idx = jnp.broadcast_to(idx, valid.shape)
    nxt = jnp.where(idx + 1 >= count[..., None], 0, idx + 1)
    nxt_rel = jnp.take_along_axis(sorted_rel, nxt[..., None], axis=-2)
    cross = (
        sorted_rel[..., 0] * nxt_rel[..., 1] - sorted_rel[..., 1] * nxt_rel[..., 0]
    )
    cross = jnp.where(idx < count[..., None], cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(count >= 3, area, 0.0)


def _pairwise_intersection_from_corners(ca, cb):
    """Intersection area given corner sets ca (..., 4, 2), cb (..., 4, 2)."""
    inter_pts, inter_valid = _edge_intersections(ca, cb)  # (..., 16, 2)
    a_in_b = _points_in_quad(ca, cb)  # (..., 4)
    b_in_a = _points_in_quad(cb, ca)  # (..., 4)
    pts = jnp.concatenate([inter_pts, ca, cb], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=-1)
    return _convex_area_from_candidates(pts, valid)


def boxes_overlap_bev(boxes_a, boxes_b):
    """Rotated BEV intersection areas, (N, 7) x (M, 7) -> (N, M).

    Equivalent of iou3d_nms_kernel.cu `boxes_overlap_kernel`:236.
    """
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca_pair = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    cb_pair = jnp.broadcast_to(cb[None, :], (n, m, 4, 2))
    return _pairwise_intersection_from_corners(ca_pair, cb_pair)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (N, M). iou3d_nms_kernel.cu `boxes_iou_bev_kernel`:279."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


def boxes_iou3d(boxes_a, boxes_b):
    """Rotated 3D IoU (N, M). iou3d_nms_utils.boxes_iou3d_gpu:48-81."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0, None)
    inter3d = inter_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter3d / jnp.clip(vol_a + vol_b - inter3d, 1e-6, None)


def boxes_iou_bev_blocked(boxes_a, boxes_b, row_block: int = 256):
    """boxes_iou_bev computed in row blocks to bound peak memory.

    Used by NMS over the full pre-max set (e.g. 4096 x 4096 pairs, where the
    (N, M, 24, 2) candidate buffer would otherwise be GBs).
    """
    n = boxes_a.shape[0]
    pad = (-n) % row_block
    padded = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    blocks = padded.reshape(-1, row_block, boxes_a.shape[1])
    out = jax.lax.map(lambda blk: boxes_iou_bev(blk, boxes_b), blocks)
    return out.reshape(-1, boxes_b.shape[0])[:n]
