"""PointNet++ primitives (FPS, ball query, grouping, 3-NN interpolation).

TPU-native equivalents of pcdet/ops/pointnet2/pointnet2_batch/src/*.cu
(ball_query_gpu.cu ball_query_kernel_fast, sampling_gpu.cu
farthest_point_sampling_kernel, group_points_gpu.cu, interpolate_gpu.cu) —
the building blocks of the PV-RCNN / PointRCNN families (SURVEY.md §2.2).

Design: everything is fixed-shape and jittable. Neighbor selection uses
masked cumsum-compaction over the full (M, N) distance matrix instead of the
CUDA per-thread scan — N <= ~16k keeps that matrix tiny next to the conv
workloads, and it vectorizes onto the VPU. FPS is a `fori_loop` with the
classic max-min update (sequential by nature, k iterations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz, valid, k: int):
    """(N, 3) points -> (k,) indices, classic FPS starting at index 0.

    sampling_gpu.cu: first centroid is index 0; each step picks the point
    with the largest distance to its nearest selected centroid. Invalid
    points never get selected (distance forced negative).
    """
    n = xyz.shape[0]
    big = jnp.where(valid, 1e10, -1.0)

    def body(i, carry):
        dists, idx = carry
        last = xyz[idx[i - 1]]
        d = jnp.sum((xyz - last) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(valid, d, -1.0))
        idx = idx.at[i].set(jnp.argmax(dists).astype(jnp.int32))
        return dists, idx

    idx0 = jnp.zeros((k,), jnp.int32)
    _, idx = jax.lax.fori_loop(1, k, body, (big, idx0))
    return idx


def ball_query(new_xyz, xyz, valid, radius: float, nsample: int):
    """(M, 3) centers x (N, 3) points -> (M, nsample) neighbor indices.

    Exact semantics of ball_query_kernel_fast: the first `nsample` in-radius
    points in INDEX ORDER; unfilled slots repeat the FIRST found index;
    centers with no neighbor return all-zeros (the wrapper's zero init).
    Also returns (M,) bool any-neighbor mask.
    """
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    mask = (d2 < radius * radius) & valid[None, :]  # (M, N)
    any_nb = jnp.any(mask, axis=1)
    first = jnp.argmax(mask, axis=1).astype(jnp.int32)  # 0 when empty
    order = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # 1-based rank
    take = mask & (order <= nsample)
    slot = jnp.where(take, order - 1, nsample)  # dump slot
    n = xyz.shape[0]
    cols = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mask.shape)
    base = jnp.where(any_nb, first, 0)[:, None] * jnp.ones(
        (1, nsample + 1), jnp.int32
    )
    idx = jax.vmap(
        lambda b, s, c: b.at[s].set(c, mode="drop")
    )(base, slot, cols)[:, :nsample]
    return idx, any_nb


def group_points(features, idx):
    """(N, C) features, (M, S) indices -> (M, S, C) grouped features
    (group_points_gpu.cu)."""
    return features[idx]


def query_and_group(new_xyz, xyz, features, valid, radius: float,
                    nsample: int, use_xyz: bool = True,
                    zero_empty: bool = True):
    """QueryAndGroup: relative xyz (+features) per group, (M, nsample,
    3 [+C]) centered on new_xyz.

    zero_empty selects between pcdet's two variants: the STACK modules
    zero groups with no in-radius neighbor (pointnet2_stack
    empty_ball_mask) — use for VSA; the BATCH modules do NOT — their CUDA
    ball_query leaves the zero-initialized index buffer, so an empty ball
    groups point 0's relative coords/features (pointnet2_batch) — use for
    the PointNet2MSG SA backbone, where zeroing would silence isolated
    long-range points the reference still featurizes.
    """
    idx, any_nb = ball_query(new_xyz, xyz, valid, radius, nsample)
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]
    out = grouped_xyz
    if features is not None:
        grouped = features[idx]
        out = jnp.concatenate([grouped_xyz, grouped], axis=-1) if use_xyz else grouped
    if zero_empty:
        out = out * any_nb[:, None, None].astype(out.dtype)
    return out, idx, any_nb


def three_nn(unknown, known, known_valid):
    """3 nearest known points per unknown point (interpolate_gpu.cu
    three_nn_kernel). Returns (dists (M, 3), idx (M, 3))."""
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(known_valid[None, :], d2, 1e10)
    neg, idx = jax.lax.top_k(-d2, 3)  # k=3: tiny, safe on TPU
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dists):
    """Inverse-distance weighted 3-NN feature interpolation
    (three_interpolate_kernel + the 1/(d+1e-8) weighting in the FP
    modules, pointnet2_modules.py:153-156 — d is the SQRT distance that
    three_nn returns, NOT the squared distance).
    features (N, C), idx/dists (M, 3) -> (M, C)."""
    w = 1.0 / (dists + 1e-8)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.sum(features[idx] * w[..., None], axis=1)
