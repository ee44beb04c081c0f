"""SECOND-family 3D voxel backbone: sparse convs as dense masked 3D convs.

TPU-native equivalent of pcdet/models/backbones_3d/spconv_backbone.py
(VoxelBackBone8x:72-165, post_act_block:9-27), vfe/mean_vfe.py (MeanVFE)
and backbones_2d/map_to_bev/height_compression.py (HeightCompression).

Same equivalences as the 2D radar encoder (bev_encoder.py):
  SubMConv3d == dense 3D conv re-masked to the input active set;
  SparseConv3d(stride 2) == dense strided 3D conv with the new active set
  being the max-pool dilation of the old mask;
  spconv BatchNorm1d over active rows == MaskedBatchNorm.

Radar/VoD-scale grids (<= 32 x 320 x 320) keep the dense NDHWC volumes small
enough that straight MXU 3D convs beat sparse gather/scatter bookkeeping on
TPU; bf16 compute halves the footprint again.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MaskedBatchNorm


# ---------------------------------------------------------------------------
# Mean VFE (voxel mean of point features)
# ---------------------------------------------------------------------------

def points_to_voxel_ids(points, valid, pc_range, voxel_size,
                        grid_size: Tuple[int, int, int]):
    """Point -> flat 3D voxel id (B, N) int32; invalid/out-of-grid -> dump.

    grid_size is (nx, ny, nz); flat id = iz * (ny*nx) + iy * nx + ix so a
    reshape to (nz, ny, nx) gives the NDHWC depth-major layout.
    """
    nx, ny, nz = grid_size
    ix = jnp.floor((points[..., 0] - pc_range[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - pc_range[1]) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((points[..., 2] - pc_range[2]) / voxel_size[2]).astype(jnp.int32)
    in_grid = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        & (iz >= 0) & (iz < nz) & valid
    )
    flat = (iz * ny + iy) * nx + ix
    return jnp.where(in_grid, flat, nx * ny * nz), in_grid


def mean_vfe(points, valid, pc_range, voxel_size,
             grid_size: Tuple[int, int, int]):
    """MeanVFE: per-voxel mean of the raw point features (mean_vfe.py:8-35),
    scattered to a dense (B, D, H, W, C) volume (D = nz + 1, the extra top
    z-plane spconv adds via sparse_shape + [1, 0, 0]) plus the active mask.
    """
    nx, ny, nz = grid_size
    ids, in_grid = points_to_voxel_ids(points, valid, pc_range, voxel_size,
                                       grid_size)
    n_cells = nx * ny * nz

    def one(f, i, m):
        fsum = jax.ops.segment_sum(
            f * m[:, None].astype(f.dtype), i, num_segments=n_cells + 1
        )
        cnt = jax.ops.segment_sum(
            m.astype(f.dtype), i, num_segments=n_cells + 1
        )
        return fsum[:n_cells] / jnp.maximum(cnt[:n_cells, None], 1.0), (
            cnt[:n_cells] > 0
        )

    feats, mask = jax.vmap(one)(points, ids, in_grid)
    b, c = feats.shape[0], feats.shape[-1]
    dense = feats.reshape(b, nz, ny, nx, c)
    mask = mask.reshape(b, nz, ny, nx, 1)
    # spconv sparse_shape pads one empty plane at the TOP of z
    dense = jnp.pad(dense, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    return dense, mask


# ---------------------------------------------------------------------------
# Masked 3D conv blocks
# ---------------------------------------------------------------------------

class _SubMConvBN3D(nn.Module):
    """3x3x3 submanifold conv (no bias) -> masked BN -> ReLU; output
    re-masked to the input active set (post_act_block conv_type='subm')."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = nn.Conv(
            self.features, kernel_size=(3, 3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x * mask.astype(x.dtype))
        y = y * mask.astype(y.dtype)
        y = MaskedBatchNorm(self.features, eps=1e-3, momentum=0.01, name="bn")(
            y, mask, use_running_average=not train
        )
        return nn.relu(y) * mask.astype(y.dtype)


class _SparseDown3D(nn.Module):
    """SparseConv3d (growing active set) -> masked BN -> ReLU.

    kernel/stride/padding given per axis in (z, y, x) order like spconv."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        pad = tuple((p, p) for p in self.padding)
        y = nn.Conv(
            self.features, kernel_size=self.kernel, strides=self.stride,
            padding=pad, use_bias=False, dtype=self.dtype, name="conv",
        )(x * mask.astype(x.dtype))
        new_mask = nn.max_pool(
            mask.astype(jnp.float32), window_shape=self.kernel,
            strides=self.stride, padding=pad,
        ) > 0
        y = y * new_mask.astype(y.dtype)
        y = MaskedBatchNorm(self.features, eps=1e-3, momentum=0.01, name="bn")(
            y, new_mask, use_running_average=not train
        )
        return nn.relu(y) * new_mask.astype(y.dtype), new_mask


class VoxelBackBone8x(nn.Module):
    """Dense-masked equivalent of VoxelBackBone8x (spconv_backbone.py:72-165):
    16 -> 16 -> 32/s2 -> 64/s2 -> 64/s2(z-pad 0) -> 128 z-collapse.

    Input (B, D, H, W, C) NDHWC + (B, D, H, W, 1) mask; returns (out, mask,
    stages) where `stages` maps x_conv2/3/4 to their (features, mask,
    downsample_factor) — the multi-scale taps PV-RCNN's voxel set
    abstraction reads (voxel_set_abstraction.py FEATURES_SOURCE).
    """

    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        if x.shape[1] < 25:
            raise ValueError(
                f"VoxelBackBone8x needs >= 25 z-planes (got {x.shape[1]}): the"
                " four stride-2 z-downsamples otherwise collapse depth to 0."
                " Use a finer VOXEL_SIZE z (reference KITTI: 41 planes)."
            )
        x = _SubMConvBN3D(16, dtype=self.dtype, name="conv_input")(x, mask, train)
        x = _SubMConvBN3D(16, dtype=self.dtype, name="conv1")(x, mask, train)

        stages = {"x_conv1": (x, mask, 1)}
        x, mask = _SparseDown3D(32, dtype=self.dtype, name="conv2_down")(
            x, mask, train
        )
        x = _SubMConvBN3D(32, dtype=self.dtype, name="conv2_a")(x, mask, train)
        x = _SubMConvBN3D(32, dtype=self.dtype, name="conv2_b")(x, mask, train)
        stages["x_conv2"] = (x, mask, 2)

        x, mask = _SparseDown3D(64, dtype=self.dtype, name="conv3_down")(
            x, mask, train
        )
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv3_a")(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv3_b")(x, mask, train)
        stages["x_conv3"] = (x, mask, 4)

        x, mask = _SparseDown3D(
            64, padding=(0, 1, 1), dtype=self.dtype, name="conv4_down"
        )(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv4_a")(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv4_b")(x, mask, train)
        stages["x_conv4"] = (x, mask, 8)

        x, mask = _SparseDown3D(
            128, kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
            dtype=self.dtype, name="conv_out",
        )(x, mask, train)
        return x, mask, stages


class _SparseBasicBlock3D(nn.Module):
    """Residual submanifold block: (conv-bn-relu-conv-bn) + id -> relu.

    spconv_backbone.SparseBasicBlock:30-68 — note the reference passes
    bias=True to both convs whenever a norm_fn is given (bias = norm_fn is
    not None), so we keep the bias for checkpoint parity.
    """

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        m = mask.astype(x.dtype)

        def conv_bn(h, name):
            h = nn.Conv(
                self.features, kernel_size=(3, 3, 3), padding=1, use_bias=True,
                dtype=self.dtype, name=f"{name}_conv",
            )(h * m)
            h = h * m
            return MaskedBatchNorm(
                self.features, eps=1e-3, momentum=0.01, name=f"{name}_bn"
            )(h, mask, use_running_average=not train)

        out = nn.relu(conv_bn(x, "a")) * m
        out = conv_bn(out, "b")
        return nn.relu(out + x) * m


def _place_strided(src, src_mask, target_dhw, stride: int):
    """Scatter a coarser volume into a finer grid at every `stride`-th site.

    Dense equivalent of `x_conv5.indices[:, 1:] *= 2` (VoxelNeXt forward:
    193-196): the stride-16 feature at (i, j, k) lands at (2i, 2j, 2k) of the
    stride-8 grid, zeros elsewhere (NOT a nearest-neighbor upsample).
    """
    d, h, w = target_dhw
    out = jnp.zeros(src.shape[:1] + (d, h, w) + src.shape[-1:], src.dtype)
    m = jnp.zeros(src_mask.shape[:1] + (d, h, w, 1), bool)
    nd = min(src.shape[1], (d + stride - 1) // stride)
    nh = min(src.shape[2], (h + stride - 1) // stride)
    nw = min(src.shape[3], (w + stride - 1) // stride)
    out = out.at[:, : nd * stride : stride, : nh * stride : stride,
                 : nw * stride : stride].set(src[:, :nd, :nh, :nw])
    m = m.at[:, : nd * stride : stride, : nh * stride : stride,
             : nw * stride : stride].set(src_mask[:, :nd, :nh, :nw])
    return out, m


class VoxelResBackBone8xVoxelNeXt(nn.Module):
    """Dense-masked VoxelNeXt backbone (spconv_backbone_voxelnext.py:69-212).

    Residual stages 16/32/64/128 at strides 1/2/4/8, two extra stride-2
    stages conv5/conv6 (128ch) whose outputs are scattered back onto the
    stride-8 grid at x2/x4 coordinate spacing, then the z axis collapses by
    SUMMING features at duplicate (y, x) (bev_out:149-164). A sparse 3x3 2D
    conv + subm shared conv produce the final (B, H/8, W/8, C) BEV + mask.
    """

    out_channel: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        if x.shape[1] < 25:
            raise ValueError(
                f"VoxelNeXt backbone needs >= 25 z-planes (got {x.shape[1]})."
            )
        x = _SubMConvBN3D(16, dtype=self.dtype, name="conv_input")(x, mask, train)
        for i in range(2):
            x = _SparseBasicBlock3D(16, dtype=self.dtype, name=f"conv1_res{i}")(
                x, mask, train
            )

        feats = {}
        masks = {}
        for stage, ch in (("conv2", 32), ("conv3", 64), ("conv4", 128),
                          ("conv5", 128), ("conv6", 128)):
            x, mask = _SparseDown3D(ch, dtype=self.dtype, name=f"{stage}_down")(
                x, mask, train
            )
            for i in range(2):
                x = _SparseBasicBlock3D(ch, dtype=self.dtype,
                                        name=f"{stage}_res{i}")(x, mask, train)
            feats[stage], masks[stage] = x, mask

        # multi-scale fusion on the stride-8 grid + z-sum BEV collapse
        d4 = feats["conv4"].shape[1:4]
        p5, m5 = _place_strided(feats["conv5"], masks["conv5"], d4, 2)
        p6, m6 = _place_strided(feats["conv6"], masks["conv6"], d4, 4)
        merged = feats["conv4"] + p5 + p6
        bev = jnp.sum(merged, axis=1)  # (B, H, W, C) — index_add over dup yx
        bev_mask = jnp.any(masks["conv4"] | m5 | m6, axis=1)

        # conv_out: SparseConv2d 3x3 s1 p1 (active set dilates) + BN + ReLU
        y = nn.Conv(
            self.out_channel, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv_out",
        )(bev * bev_mask.astype(bev.dtype))
        out_mask = nn.max_pool(
            bev_mask.astype(jnp.float32), window_shape=(3, 3), strides=(1, 1),
            padding=((1, 1), (1, 1)),
        ) > 0
        y = y * out_mask.astype(y.dtype)
        y = MaskedBatchNorm(self.out_channel, eps=1e-3, momentum=0.01,
                            name="conv_out_bn")(
            y, out_mask, use_running_average=not train
        )
        y = nn.relu(y) * out_mask.astype(y.dtype)

        # shared_conv: SubMConv2d (bias) + torch-default BN (1e-5, 0.1)
        y = nn.Conv(
            self.out_channel, (3, 3), padding=1, use_bias=True,
            dtype=self.dtype, name="shared_conv",
        )(y) * out_mask.astype(y.dtype)
        y = MaskedBatchNorm(self.out_channel, eps=1e-5, momentum=0.1,
                            name="shared_bn")(
            y, out_mask, use_running_average=not train
        )
        return nn.relu(y) * out_mask.astype(y.dtype), out_mask


def height_compression(x):
    """(B, D, H, W, C) -> (B, H, W, C*D) BEV features.

    Matches HeightCompression's torch view (B, C, D, H, W) -> (B, C*D, H, W):
    output channel index = c * D + d, so transpose to (..., C, D) first.
    """
    b, d, h, w, c = x.shape
    return x.transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * d)
