"""RoI-aware 3D grid pooling + RoI point pooling.

TPU-native equivalents of pcdet/ops/roiaware_pool3d (roiaware_pool3d_kernel.cu
roiaware_maxpool3d/avgpool3d: each RoI is split into an out^3 local grid and
point features max/avg-pool per cell) and pcdet/ops/roipoint_pool3d
(first `num_sampled` in-box points per RoI in index order + empty flag) —
the pooling layers of the Part-A2 / PV-RCNN / PointRCNN families
(SURVEY.md §2.2).

Fixed shapes throughout: (num_rois, out^3, C) via segment ops, jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_local(points, box):
    """Rotate/translate (N, 3) points into the box frame (box (7,))."""
    rel = points - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    x = rel[:, 0] * c - rel[:, 1] * s
    y = rel[:, 0] * s + rel[:, 1] * c
    return jnp.stack([x, y, rel[:, 2]], axis=1)


def roiaware_pool3d(rois, points, features, valid, out_size: int = 6,
                    pool_method: str = "max"):
    """(R, 7) rois x (N, 3)+(N, C) points -> (R, out, out, out, C).

    Cell index = floor(local / (extent / out)) clipped to the grid, matching
    the kernel's in-box test + voxel binning; empty cells are 0.
    """
    n = points.shape[0]
    n_cells = out_size ** 3

    def one(box):
        local = _to_local(points, box)
        half = box[3:6] / 2.0
        inside = jnp.all(jnp.abs(local) < half[None, :], axis=1) & valid
        cell_size = box[3:6] / out_size
        ijk = jnp.floor((local + half[None, :]) / cell_size[None, :])
        ijk = jnp.clip(ijk, 0, out_size - 1).astype(jnp.int32)
        flat = (ijk[:, 0] * out_size + ijk[:, 1]) * out_size + ijk[:, 2]
        flat = jnp.where(inside, flat, n_cells)  # dump slot
        if pool_method == "max":
            pooled = jax.ops.segment_max(
                jnp.where(inside[:, None], features, -1e10),
                flat, num_segments=n_cells + 1,
            )[:n_cells]
            count = jax.ops.segment_sum(
                inside.astype(jnp.int32), flat, num_segments=n_cells + 1
            )[:n_cells]
            pooled = jnp.where(count[:, None] > 0, pooled, 0.0)
        else:
            ssum = jax.ops.segment_sum(
                features * inside[:, None].astype(features.dtype),
                flat, num_segments=n_cells + 1,
            )[:n_cells]
            count = jax.ops.segment_sum(
                inside.astype(features.dtype), flat, num_segments=n_cells + 1
            )[:n_cells]
            pooled = ssum / jnp.maximum(count[:, None], 1.0)
        return pooled.reshape(out_size, out_size, out_size, -1)

    return jax.vmap(one)(rois)


def roipoint_pool3d(rois, points, features, valid, num_sampled: int = 512):
    """First `num_sampled` in-box points per RoI, index order; RoIs with
    0 < cnt < num_sampled are filled by CYCLIC duplication of the in-box
    points (roipoint_pool3d_kernel.cu:92-96 `pts_idx[k] = pts_idx[k %
    cnt]`) — zero-padding instead would change ball-query neighborhoods
    and grouped statistics for sparse RoIs, the radar norm. Fully empty
    RoIs stay zero (the kernel leaves them unwritten).

    pcdet/ops/roipoint_pool3d: returns (R, num_sampled, 3 + C) stacked
    [xyz | features] plus (R,) empty flags (1 when the RoI has no points)
    and (R,) in-box point counts (for per-slot validity masks).
    """
    def one(box):
        local = _to_local(points, box)
        half = box[3:6] / 2.0
        inside = jnp.all(jnp.abs(local) < half[None, :], axis=1) & valid
        order = jnp.cumsum(inside.astype(jnp.int32))
        cnt = jnp.sum(inside.astype(jnp.int32))
        slot = jnp.where(inside & (order <= num_sampled), order - 1,
                         num_sampled)
        stacked = jnp.concatenate([points, features], axis=1)
        out = jnp.zeros((num_sampled + 1, stacked.shape[1]), stacked.dtype)
        out = out.at[slot].set(stacked, mode="drop")[:num_sampled]
        # cyclic refill of the unwritten tail (k -> k % cnt); cnt==0 keeps
        # the zero rows via the clamp-to-0 gather of an all-zero prefix
        k = jnp.arange(num_sampled)
        src = jnp.where(cnt > 0, k % jnp.maximum(cnt, 1), 0)
        out = jnp.where((k < cnt)[:, None], out, out[src])
        return out, cnt == 0, cnt

    pooled, empty, counts = jax.vmap(one)(rois)
    return pooled, empty, counts
