"""LSS-style BEV pooling (interval sum / precomputed-rank sum) as segment ops.

TPU-native equivalents of pcdet/ops/bev_pool (src/bev_pool_cuda.cu:20-97,
interval-sum pooling used by the BEVFusion detector family) and
pcdet/ops/bev_pool_v2 (src/bev_pool_cuda.cu:21-139, BEVPoolv2's
precomputed-rank formulation). Both are scatter-adds over BEV cells, i.e.
`jax.ops.segment_sum` with static shapes:

- bev_pool: features (N, C) + per-point BEV cell ids -> dense (B, ny, nx, C)
  sum pool (the reference's interval bookkeeping exists only because CUDA
  needs contiguous runs; a segment op doesn't).
- bev_pool_v2: separate depth (N,) and feature gathers multiplied on the fly
  (out += depth[i] * feat[i]), identical reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bev_pool(feats, cell_ids, valid, batch_size: int, ny: int, nx: int):
    """Sum-pool point features into BEV cells.

    feats: (N, C); cell_ids: (N,) flat ids b*ny*nx + iy*nx + ix;
    valid: (N,) bool. Returns (B, ny, nx, C).
    """
    num = batch_size * ny * nx
    ids = jnp.where(valid, cell_ids, num)
    out = jax.ops.segment_sum(
        feats * valid[:, None].astype(feats.dtype), ids, num_segments=num + 1
    )
    return out[:num].reshape(batch_size, ny, nx, feats.shape[-1])


def bev_pool_v2(depth, feats, ranks_depth, ranks_feat, ranks_bev, valid,
                batch_size: int, ny: int, nx: int, channels: int):
    """BEVPoolv2: out[rank_bev] += depth[rank_depth] * feat[rank_feat].

    All rank arrays are (K,) int32 with a validity mask (static K replaces
    the reference's dynamic interval list). Returns (B, ny, nx, C).
    """
    num = batch_size * ny * nx
    d = depth.reshape(-1)[ranks_depth]  # (K,)
    f = feats.reshape(-1, channels)[ranks_feat]  # (K, C)
    contrib = f * d[:, None]
    ids = jnp.where(valid, ranks_bev, num)
    out = jax.ops.segment_sum(
        contrib * valid[:, None].astype(contrib.dtype), ids, num_segments=num + 1
    )
    return out[:num].reshape(batch_size, ny, nx, channels)
