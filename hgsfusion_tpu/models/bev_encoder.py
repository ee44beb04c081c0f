"""Radar BEV encoder: "sparse" ResNet18-style encoder as dense MXU convs
with active-site masking, plus the FPN_LSS top-down neck.

TPU-native equivalent of SpMiddlePillarEncoder18 (pcdet/.../pcnres18.py:83-281)
and FPN_LSS (pcdet/.../lss_fpn.py:12-127). Key equivalences:

- SubMConv2d on a zero-background dense grid == dense conv with the output
  re-masked to the input's active set (submanifold convs never grow the
  active set);
- SparseConv2d (stride 2, pad 1) == dense strided conv with the new active
  set = 3x3/2 max-pool dilation of the old mask;
- spconv's BatchNorm1d over active rows == MaskedBatchNorm over active sites.

The VoD/TJ4D BEV grids are tiny (<=320^2), so dense convs map straight onto
the MXU and beat sparse gather/scatter bookkeeping on TPU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import MaskedBatchNorm, upsample_bilinear_align_corners


def _dilate_mask_3x3_s2(mask):
    """New active set of a 3x3 stride-2 pad-1 sparse conv: max-pool the mask."""
    return nn.max_pool(
        mask, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


class _SubMConvBN(nn.Module):
    """3x3 submanifold conv (+bias) -> masked BN; output re-masked."""

    features: int
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # mask the input too: a sparse tensor cannot hold values at inactive
        # sites, so the dense emulation must ignore anything stored there
        y = nn.Conv(
            self.features, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x * mask.astype(x.dtype))
        y = y * mask.astype(y.dtype)
        y = MaskedBatchNorm(self.features, eps=1e-3, momentum=0.01, name="bn")(
            y, mask, use_running_average=not train
        )
        return y * mask.astype(y.dtype)


class SparseBasicBlockV(nn.Module):
    """Entry residual block: conv0 -> relu, then (conv1 -> relu -> conv2) + id.

    pcnres18.Sparse2DBasicBlockV:115-158.
    """

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.relu(
            _SubMConvBN(self.features, dtype=self.dtype, name="conv0")(x, mask, train)
        )
        identity = x
        out = nn.relu(
            _SubMConvBN(self.features, dtype=self.dtype, name="conv1")(x, mask, train)
        )
        out = _SubMConvBN(self.features, dtype=self.dtype, name="conv2")(out, mask, train)
        return nn.relu(out + identity) * mask.astype(out.dtype)


class SparseBasicBlock(nn.Module):
    """Residual block: (conv1 -> relu -> conv2) + id -> relu.

    pcnres18.Sparse2DBasicBlock:161-199.
    """

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        identity = x
        out = nn.relu(
            _SubMConvBN(self.features, dtype=self.dtype, name="conv1")(x, mask, train)
        )
        out = _SubMConvBN(self.features, dtype=self.dtype, name="conv2")(out, mask, train)
        return nn.relu(out + identity) * mask.astype(out.dtype)


class _Downsample(nn.Module):
    """SparseConv2d 3x3/2 (no bias) -> masked BN -> ReLU; grows the active set."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = nn.Conv(
            self.features, kernel_size=(3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        new_mask = _dilate_mask_3x3_s2(mask)
        y = y * new_mask.astype(y.dtype)
        y = MaskedBatchNorm(self.features, eps=1e-3, momentum=0.01, name="bn")(
            y, new_mask, use_running_average=not train
        )
        return nn.relu(y) * new_mask.astype(y.dtype), new_mask


class PillarResNet18BEV(nn.Module):
    """SpMiddlePillarEncoder18 equivalent: 4 stages at strides 1/2/4/8,
    channels 32/64/128/256 (pcnres18.py:212-245), returning the feature maps
    selected by out_indices (0-based stage index; cfg OUT_INDICES [0,1,2]).
    """

    in_planes: int = 32
    out_indices: Sequence[int] = (0, 1, 2)
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        outs = []
        # stage 1 (stride 1, 32ch)
        x = SparseBasicBlockV(32, dtype=dt, name="conv1_block0")(x, mask, train)
        x = SparseBasicBlock(32, dtype=dt, name="conv1_block1")(x, mask, train)
        outs.append((x, mask))
        # stage 2 (stride 2, 64ch)
        x, mask = _Downsample(64, dtype=dt, name="conv2_down")(x, mask, train)
        x = SparseBasicBlock(64, dtype=dt, name="conv2_block0")(x, mask, train)
        x = SparseBasicBlock(64, dtype=dt, name="conv2_block1")(x, mask, train)
        outs.append((x, mask))
        # stage 3 (stride 4, 128ch)
        x, mask = _Downsample(128, dtype=dt, name="conv3_down")(x, mask, train)
        x = SparseBasicBlock(128, dtype=dt, name="conv3_block0")(x, mask, train)
        x = SparseBasicBlock(128, dtype=dt, name="conv3_block1")(x, mask, train)
        outs.append((x, mask))
        # stage 4 (stride 8, 256ch)
        x, mask = _Downsample(256, dtype=dt, name="conv4_down")(x, mask, train)
        x = SparseBasicBlock(256, dtype=dt, name="conv4_block0")(x, mask, train)
        x = SparseBasicBlock(256, dtype=dt, name="conv4_block1")(x, mask, train)
        outs.append((x, mask))
        return [outs[i][0] for i in self.out_indices]


class _ConvBNReLU2x(nn.Module):
    """Two (conv3x3 no-bias -> BN -> ReLU) stacks (lss_fpn conv34/conv23)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2):
            x = nn.Conv(
                self.features, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class FPNLSS(nn.Module):
    """Top-down fuse of 3 BEV scales -> full-resolution 128ch radar BEV.

    FPN_LSS (lss_fpn.py:12-127) instantiated with extra_upsample=None and
    scale_factor=2 (pillarnet.py:44-49): up(x3) || x2 -> conv34, up || x1 ->
    conv23. Dense BN (type 'BN'), bilinear align_corners=True upsampling.
    """

    out_channels: Sequence[int] = (128, 128)
    scale_factor: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool):
        x1, x2, x3 = feats  # strides 1, 2, 4 (e.g. 32@320, 64@160, 128@80)
        up3 = upsample_bilinear_align_corners(x3, self.scale_factor)
        x34 = jnp.concatenate([x2, up3], axis=-1)
        x34 = _ConvBNReLU2x(self.out_channels[1], dtype=self.dtype,
                            name="conv34")(x34, train)
        x34 = upsample_bilinear_align_corners(x34, self.scale_factor)
        x23 = jnp.concatenate([x1, x34], axis=-1)
        return _ConvBNReLU2x(self.out_channels[0], dtype=self.dtype,
                             name="conv23")(x23, train)


class PillarNetRadar(nn.Module):
    """Reader -> backbone -> neck container (pillarnet.py:10-65).

    Takes the dense pillar BEV + occupancy mask from PillarFeatureNet and
    produces the (B, ny, nx, 128) radar BEV ('pillar_features_scattered').
    """

    out_indices: Sequence[int] = (0, 1, 2)
    neck_out_channels: Sequence[int] = (128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, pillar_bev, occ_mask, train: bool):
        feats = PillarResNet18BEV(
            out_indices=self.out_indices, dtype=self.dtype, name="backbone"
        )(pillar_bev, occ_mask.astype(pillar_bev.dtype), train)
        return FPNLSS(out_channels=self.neck_out_channels, dtype=self.dtype,
                      name="neck")(feats, train)
