"""Radar pillar feature net: split virtual/real encoding -> MLP -> scatter-max.

TPU-native equivalent of DynamicPillarFeatureNet + PillarMaxPooling
(pcdet/models/backbones_3d/vfe/pillarnet_modules/dynamic_pillar_encoder.py:9-121,
pcdet/ops/pillar_ops/pillar_modules.py:12-83). Differences by design:

- static shapes: points come padded to (B, N, D) with a validity mask instead
  of ragged per-sample lists;
- output is the dense (B, ny, nx, C) BEV grid + occupancy mask instead of a
  compacted SparseConvTensor (the downstream encoder runs dense on the MXU);
- scatter-max is jax.ops.segment_max (deterministic) instead of atomicMax
  with a fuzzy second-pass argmax (scatter_ops_gpu.cu:61-74).

Feature layout reproduced exactly (SURVEY.md Appendix A):
  input points (VoD): [xyz 3 | radar 4 | label one-hot 8 | idf 2] = 17
  split re-encoding:  [xyz 3 | real 12 | virtual 12 | idf 2] = 29
  (TJ4D: 18 in, 13-wide real/virtual slots, 31 out)
  MLP input: [encoded | xyz_rel 3 | xyz_rel - pillar_center 3]
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.voxelize import (
    gather_cells, points_to_pillar_ids, scatter_any_dense, scatter_max_dense,
    scatter_sum_dense,
)
from .layers import MaskedBatchNorm


class PillarFeatureNet(nn.Module):
    num_input_features: int = 29  # 29 VoD / 31 TJ4D (hgsfusion_vod.yaml:104)
    num_filters: Sequence[int] = (32,)
    pillar_size: float = 0.16
    pc_range: Sequence[float] = (0, -25.6, -3, 51.2, 25.6, 2)
    use_virtual: bool = True
    encoding_type: str = "split"
    dtype: object = None

    @property
    def grid_shape(self) -> Tuple[int, int]:
        """(ny, nx); nx = round(x-extent / pillar), pillar_utils.bev_spatial_shape:16-19."""
        nx = int(round((self.pc_range[3] - self.pc_range[0]) / self.pillar_size))
        ny = int(round((self.pc_range[4] - self.pc_range[1]) / self.pillar_size))
        return ny, nx

    def _split_encode(self, points):
        """Split-encode raw (B, N, D) points to (B, N, num_input_features).

        dynamic_pillar_encoder.py:64-86: a point's feature block (cols 3:3+k)
        lands in the "real" slot when idf1 >= 0.5 and in the "virtual" slot
        otherwise ((1,1)=raw real, (0,0)=gt-box real, (0,1)=virtual).
        """
        b, n, d = points.shape
        k = d - 5  # feature block width: 12 for VoD (17 cols), 13 for TJ4D (18)
        assert self.num_input_features == 3 + 2 * k + 2, (
            f"num_input_features {self.num_input_features} inconsistent with "
            f"point dim {d}"
        )
        xyz = points[..., 0:3]
        feats = points[..., 3 : 3 + k]
        idf = points[..., -2:]
        is_virtual = (points[..., -2:-1] < 0.5).astype(points.dtype)
        real_slot = feats * (1 - is_virtual)
        virtual_slot = feats * is_virtual
        return jnp.concatenate([xyz, real_slot, virtual_slot, idf], axis=-1)

    @nn.compact
    def __call__(self, points, points_valid, train: bool):
        """points: (B, N, D) raw encoded points; points_valid: (B, N) bool.

        Returns (bev (B, ny, nx, C), occupancy mask (B, ny, nx, 1)).
        """
        ny, nx = self.grid_shape

        if self.use_virtual and self.encoding_type == "split":
            pt_features = self._split_encode(points)
        elif self.encoding_type == "direct":
            pt_features = points[..., :-2]
        else:  # 'mixed' / non-virtual: raw features as-is
            pt_features = points

        # range-relative coordinates (dynamic_pillar_encoder.absl_to_relative:46-53)
        pc_min = jnp.asarray(self.pc_range[:3], points.dtype)
        xyz_rel = points[..., 0:3] - pc_min

        ids, in_grid = points_to_pillar_ids(
            xyz_rel, points_valid, self.pillar_size, nx, ny
        )
        # pillar centers in relative frame; z-center is the *absolute* range
        # midpoint, an inherited quirk of gen_indice_pairs (pillar_utils.py:
        # pillar_centers z = (pcr[5]+pcr[2])/2 while xyz is relative).
        ix = (ids % nx).astype(points.dtype)
        iy = (ids // nx).astype(points.dtype)
        center = jnp.stack(
            [
                (ix + 0.5) * self.pillar_size,
                (iy + 0.5) * self.pillar_size,
                jnp.full_like(ix, (self.pc_range[5] + self.pc_range[2]) / 2),
            ],
            axis=-1,
        )
        group = jnp.concatenate([pt_features, xyz_rel, xyz_rel - center], axis=-1)

        mask = in_grid[..., None]
        x = group
        for i, width in enumerate(self.num_filters):
            x = nn.Dense(width, use_bias=False, dtype=self.dtype,
                         name=f"mlp_{i}")(x)
            x = MaskedBatchNorm(width, eps=1e-3, momentum=0.01, name=f"bn_{i}")(
                x, mask, use_running_average=not train
            )
            x = nn.relu(x)
        x = x * mask.astype(x.dtype)  # zero contributions from dumped points

        bev = scatter_max_dense(x, ids, ny * nx)
        bev = bev.reshape(bev.shape[0], ny, nx, x.shape[-1])
        occ = scatter_any_dense(ids, ny * nx).reshape(bev.shape[0], ny, nx, 1)
        return bev, occ


class Radar7PillarVFE(nn.Module):
    """Classic PointPillars-style VFE over 7-feature radar points.

    TPU-native equivalent of Radar7PillarVFE (pillar_vfe.py:125-271), a
    registered-but-unused leftover the HGS configs never select. Input
    column layout [x, y, z, rcs, v_r, v_r_comp, time]; flags pick which
    raw columns feed the PFN alongside the two relative-offset triplets
    (f_cluster = xyz - in-pillar mean, f_center = xyz - pillar center).
    USE_ELEVATION=False zeroes z before anything else (:231-232).

    Design differences (static shapes, same math): instead of the
    host-voxelized ragged (V, P, C) tensor, points stay padded (B, N, D)
    and per-pillar statistics are dense segment ops; each PFN layer's
    pillar context is a segment-max gathered back per point (PFNLayer's
    x_repeat concat, pillar_vfe.py:31-60), and the final pillar feature
    is scattered straight into the (B, ny, nx, C) BEV grid — the separate
    PointPillarScatter pass the reference pairs this VFE with.
    """

    num_filters: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.16, 0.16, 5.0)
    pc_range: Sequence[float] = (0, -25.6, -3, 51.2, 25.6, 2)
    use_xyz: bool = True
    use_rcs: bool = True
    use_vr: bool = True
    use_vr_comp: bool = True
    use_time: bool = True
    use_elevation: bool = True
    with_distance: bool = False
    dtype: object = None

    @property
    def grid_shape(self):
        nx = int(round((self.pc_range[3] - self.pc_range[0]) / self.voxel_size[0]))
        ny = int(round((self.pc_range[4] - self.pc_range[1]) / self.voxel_size[1]))
        return ny, nx

    @nn.compact
    def __call__(self, points, points_valid, train: bool):
        """points: (B, N, >=7) [x y z rcs v_r v_r_comp time ...];
        points_valid: (B, N) bool. Returns (bev (B, ny, nx, C), occ mask)."""
        ny, nx = self.grid_shape
        pdt = points.dtype
        if not self.use_elevation:
            points = points.at[..., 2].set(0.0)
        xyz = points[..., 0:3]

        # per-axis binning (voxel_size may be non-square, unlike the
        # shared square-pillar helper points_to_pillar_ids)
        pc_min = jnp.asarray(self.pc_range[:3], pdt)
        rel = xyz - pc_min
        ix_i = jnp.floor(rel[..., 0] / self.voxel_size[0]).astype(jnp.int32)
        iy_i = jnp.floor(rel[..., 1] / self.voxel_size[1]).astype(jnp.int32)
        in_grid = (ix_i >= 0) & (ix_i < nx) & (iy_i >= 0) & (iy_i < ny) \
            & points_valid
        ids = jnp.where(in_grid, iy_i * nx + ix_i, nx * ny)

        # f_cluster: offset from the pillar's valid-point mean (:238-240)
        w = in_grid[..., None].astype(pdt)
        sums = scatter_sum_dense(jnp.concatenate([xyz * w, w], -1), ids,
                                 ny * nx)
        mean = gather_cells(sums, ids)
        f_cluster = xyz - mean[..., :3] / jnp.maximum(mean[..., 3:4], 1.0)

        # f_center: offset from the pillar's geometric center (:242-249)
        ix = (ids % nx).astype(pdt)
        iy = (ids // nx).astype(pdt)
        center = jnp.stack([
            ix * self.voxel_size[0] + (self.voxel_size[0] / 2 + self.pc_range[0]),
            iy * self.voxel_size[1] + (self.voxel_size[1] / 2 + self.pc_range[1]),
            jnp.full_like(ix, self.voxel_size[2] / 2 + self.pc_range[2]),
        ], axis=-1)
        f_center = xyz - center

        cols = []
        if self.use_xyz:
            cols.append(xyz)
        for flag, col in ((self.use_rcs, 3), (self.use_vr, 4),
                          (self.use_vr_comp, 5), (self.use_time, 6)):
            if flag:
                cols.append(points[..., col:col + 1])
        feats = [jnp.concatenate(cols, -1), f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, -1)

        # PFN stack with the reference's exact layer semantics
        # (pillar_vfe.py:9-49, :196-203): a NON-last layer outputs
        # width // 2 per-point features concatenated with the broadcast
        # pillar max (PFNLayer halves out_channels internally, :18-19,
        # so the concat totals `width`); ONLY the final layer pools to
        # pillar level — the reference's `i >= len(num_filters) - 2` is
        # evaluated against a list with the INPUT dim prepended (:195),
        # so it selects exactly the final user layer. Two deliberate
        # deviations around padding, both strictly cleaner than the
        # reference: (a) BN is masked, so padded points don't pollute
        # batch stats (the reference's BN1d includes them; identical in
        # eval mode); (b) the pillar max is over REAL points only —
        # the reference's torch.max also sees padded rows' relu(BN(0))
        # activations, which can lift the max of under-full voxels with
        # phantom values (pillar_vfe.py:262-266 zeroes padding only
        # BEFORE the stack). Exact parity holds for full voxels (see
        # tests/test_reference_parity.py) and whenever trained BN maps
        # zero rows to non-positive values.
        mask = in_grid[..., None]
        n_layers = len(self.num_filters)
        for i, width in enumerate(self.num_filters):
            last = i == n_layers - 1
            out_w = width if last else width // 2
            x = nn.Dense(out_w, use_bias=False, dtype=self.dtype,
                         name=f"pfn_{i}")(x)
            x = MaskedBatchNorm(out_w, eps=1e-3, momentum=0.01,
                                name=f"pfn_bn_{i}")(
                x, mask, use_running_average=not train)
            x = nn.relu(x) * mask.astype(x.dtype)
            if last:
                x = scatter_max_dense(x, ids, ny * nx)
            else:  # PFNLayer x_repeat concat (:46-49)
                pooled = scatter_max_dense(x, ids, ny * nx)
                x = jnp.concatenate([x, gather_cells(pooled, ids)], -1)

        bev = x.reshape(x.shape[0], ny, nx, x.shape[-1])
        occ = scatter_any_dense(ids, ny * nx).reshape(
            x.shape[0], ny, nx, 1)
        return bev, occ
