"""Rotated BEV overlap / IoU / IoU3D, fully on-device with static shapes.

TPU-native replacement for the reference CUDA polygon-clipping kernels
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:104-340). Instead of the
sequential Sutherland-Hodgman clip (variable vertex counts) or a sort-based
convex hull, we use a sort-free boundary-integral formulation:

  The boundary of A (convex) intersected with B (convex) consists of the arcs
  of dA inside B and the arcs of dB inside A, all traversed CCW. The shoelace
  line integral 0.5 * (x dy - y dx) over a straight segment p->q equals
  0.5 * cross(p, q), and the total area is the SUM of per-segment
  contributions - order-independent. Each of the 8 edges clips against the
  other quad's 4 half-planes as a 1-D interval [t_in, t_out] (pure min/max),
  so the whole pairwise IoU is ~400 flops of pure vector math per pair: no
  sort, no gather, no data-dependent control flow. Exact for all convex
  cases (disjoint -> 0, containment -> area of the inner box).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.box_utils import boxes_to_corners_bev

_EPS = 1e-8


# Collinearity tolerances: `b` (cross of edge directions) is exactly 0 for
# bit-identical duplicated boxes; `a` measures the signed offset of the edge
# line. Tiny absolute thresholds only catch true degeneracies.
_EPS_PAR = 1e-6
_EPS_COLL = 1e-5


def _half_boundary(cp, cq, first_pass: bool):
    """Shoelace contribution of polygon P's edges clipped to inside Q.

    cp, cq: (..., 4, 2) CCW corners. Each edge p1 -> p1 + t*d, t in [0, 1],
    is clipped against Q's 4 half-planes (inside = cross(e_q, x - q1) >= 0),
    a pure interval intersection; the surviving sub-segment contributes
    0.5 * cross(p(t_lo), p(t_hi)).

    Collinear-edge rule (removes double counting without breaking exactness):
    when a P-edge lies ON a Q-edge line, it is counted only in the first pass
    and only if the edges point the same way (identical/contained boxes count
    the shared boundary once; externally touching boxes count it never).
    """
    p1 = cp
    d = jnp.roll(cp, -1, axis=-2) - cp  # (..., 4, 2)
    q1 = cq
    e = jnp.roll(cq, -1, axis=-2) - cq  # (..., 4, 2)

    rel = p1[..., :, None, :] - q1[..., None, :, :]  # (..., 4P, 4Q, 2)
    a = e[..., None, :, 0] * rel[..., 1] - e[..., None, :, 1] * rel[..., 0]
    b = (
        e[..., None, :, 0] * d[..., :, None, 1]
        - e[..., None, :, 1] * d[..., :, None, 0]
    )
    parallel = jnp.abs(b) <= _EPS_PAR
    tc = -a / jnp.where(parallel, 1.0, b)

    lo = jnp.where(~parallel & (b > 0), tc, 0.0)
    hi = jnp.where(~parallel & (b < 0), tc, 1.0)
    collinear = parallel & (jnp.abs(a) <= _EPS_COLL)
    if first_pass:
        same_dir = (
            d[..., :, None, 0] * e[..., None, :, 0]
            + d[..., :, None, 1] * e[..., None, :, 1]
        ) > 0
        parallel_ok = jnp.where(collinear, same_dir, a > 0)
    else:
        parallel_ok = ~collinear & (a > 0)
    hi = jnp.where(parallel & ~parallel_ok, -1.0, hi)

    t_lo = jnp.maximum(jnp.max(lo, axis=-1), 0.0)  # (..., 4P)
    t_hi = jnp.minimum(jnp.min(hi, axis=-1), 1.0)
    valid = t_hi > t_lo
    pa = p1 + t_lo[..., None] * d
    pb = p1 + t_hi[..., None] * d
    contrib = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
    return 0.5 * jnp.sum(jnp.where(valid, contrib, 0.0), axis=-1)


def _pairwise_intersection_from_corners(ca, cb):
    """Intersection area given corner sets ca (..., 4, 2), cb (..., 4, 2).

    Translates each pair to its joint centroid first (the boundary integral
    is translation-invariant in exact math; centering keeps f32 cross terms
    small at 50 m+ ranges).
    """
    center = 0.5 * (
        jnp.mean(ca, axis=-2, keepdims=True) + jnp.mean(cb, axis=-2, keepdims=True)
    )
    ca = ca - center
    cb = cb - center
    area = _half_boundary(ca, cb, first_pass=True) + _half_boundary(
        cb, ca, first_pass=False
    )
    return jnp.maximum(area, 0.0)


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


def boxes_iou_bev_blocked(boxes_a, boxes_b, row_block: int = 256,
                          n_valid=None):
    """boxes_iou_bev computed in row blocks to bound peak memory.

    Used by NMS over the full pre-max set (e.g. 4096 x 4096 pairs). When
    `n_valid` is given (candidates sorted valid-first, e.g. after a score
    threshold + top-k), row blocks entirely past the valid count skip the
    geometry and emit zeros via lax.cond — exact results, and the typical
    detection workload (a few hundred valid of 4096 slots) only pays for the
    blocks it uses.
    """
    n = boxes_a.shape[0]
    pad = (-n) % row_block
    padded = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    blocks = padded.reshape(-1, row_block, boxes_a.shape[1])
    if n_valid is None:
        out = jax.lax.map(lambda blk: boxes_iou_bev(blk, boxes_b), blocks)
        return out.reshape(-1, boxes_b.shape[0])[:n]

    def step(carry, inp):
        bi, blk = inp
        out = jax.lax.cond(
            bi * row_block < n_valid,
            lambda b: boxes_iou_bev(b, boxes_b),
            lambda b: jnp.zeros((row_block, boxes_b.shape[0]), boxes_b.dtype),
            blk,
        )
        return carry, out

    _, out = jax.lax.scan(
        step, None, (jnp.arange(blocks.shape[0]), blocks)
    )
    return out.reshape(-1, boxes_b.shape[0])[:n]
