"""Sparse 2-D pillar backbones, dense-masked (TPU-native).

Equivalents of the reference's spconv pillar backbones:
- PillarBackBone8x / PillarRes18BackBone8x
  (pcdet/models/backbones_3d/spconv_backbone_2d.py:114-300): four sparse
  stages at strides 1/2/4/8 (post-act or residual), then a DENSE stride-16
  stage — the reference densifies x_conv4 before conv5, so x_conv4/x_conv5
  are plain maps consumed by BaseBEVBackboneV1.
- VoxelResBackBone8xVoxelNeXt2D (spconv_backbone_voxelnext2d.py:70-219):
  six residual sparse stages (strides 1..32), the stride-16/32 maps
  index-doubled/quadrupled back onto the stride-8 grid with coincident
  features SUMMED (bev_out's index_add over unique indices), a regular
  sparse 3x3 conv (active set dilated) and a submanifold shared conv.

Dense-masked mapping (same scheme as the radar branch in bev_encoder.py):
the sparse tensor is (B, H, W, C) + an active-site mask; submanifold convs
preserve the mask, regular sparse convs grow it by the max-pooled stencil;
BN statistics are computed over active sites only (MaskedBatchNorm). The
index-doubling merge becomes a zero-stuffing upsample (features land at
(2i, 2j) exactly like the doubled sparse indices) followed by a dense add
— coincident-site summation for free, without the reference's
unique/index_add pass.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .bev_encoder import SparseBasicBlock, _Downsample, _SubMConvBN
from .layers import MaskedBatchNorm, batch_norm


class _SubMBlock(nn.Module):
    """post_act_block(conv_type='subm'): 3x3 subm conv (NO bias,
    spconv_backbone_2d.py:12) -> BN -> ReLU."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = _SubMConvBN(self.features, use_bias=False, dtype=self.dtype,
                        name="convbn")(x, mask, train)
        return nn.relu(y) * mask.astype(y.dtype)


class _DenseConvBNReLU(nn.Module):
    """post_act_block_dense: dense 3x3 conv -> BN2d -> ReLU."""

    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = batch_norm(self.features, eps=1e-3, torch_momentum=0.01, name="bn")(
            y, use_running_average=not train)
        return nn.relu(y)


class _DenseBasicBlock(nn.Module):
    """spconv_backbone_2d.BasicBlock:79-111 (dense residual, stride 1)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        # convs carry a bias (BasicBlock:86-91: bias = norm_fn is not None)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        y = batch_norm(self.features, eps=1e-3, torch_momentum=0.01, name="bn1")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        y = batch_norm(self.features, eps=1e-3, torch_momentum=0.01, name="bn2")(
            y, use_running_average=not train)
        return nn.relu(y + x)


class PillarRes18BackBone8x(nn.Module):
    """spconv_backbone_2d.PillarRes18BackBone8x:207-300.

    Input: (B, H, W, 32) pillar BEV + active mask. Returns the dict of
    multi-scale maps the reference stores in `multi_scale_2d_features`
    (x_conv4/x_conv5 dense, earlier stages masked) plus their masks.
    """

    residual: bool = True  # False = PillarBackBone8x (post-act blocks)
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        def blocks(x, mask, ch, n, stage):
            for i in range(n):
                cls = SparseBasicBlock if self.residual else _SubMBlock
                x = cls(ch, dtype=dt, name=f"{stage}_block{i}")(
                    x, mask, train)
            return x

        outs, masks = {}, {}
        x = blocks(x, mask, 32, 2, "conv1")
        outs["x_conv1"], masks["x_conv1"] = x, mask
        for si, ch in ((2, 64), (3, 128), (4, 256)):
            x, mask = _Downsample(ch, dtype=dt, name=f"conv{si}_down")(
                x, mask, train)
            x = blocks(x, mask, ch, 2, f"conv{si}")
            outs[f"x_conv{si}"], masks[f"x_conv{si}"] = x, mask
        # x_conv4.dense(); dense stride-16 stage (:246-250)
        x = outs["x_conv4"] * masks["x_conv4"].astype(x.dtype)
        outs["x_conv4"] = x
        y = _DenseConvBNReLU(256, stride=2, dtype=dt, name="conv5_down")(
            x, train)
        if self.residual:
            y = _DenseBasicBlock(256, dtype=dt, name="conv5_block0")(y, train)
            y = _DenseBasicBlock(256, dtype=dt, name="conv5_block1")(y, train)
        else:
            y = _DenseConvBNReLU(256, dtype=dt, name="conv5_block0")(y, train)
            y = _DenseConvBNReLU(256, dtype=dt, name="conv5_block1")(y, train)
        outs["x_conv5"] = y
        masks["x_conv5"] = jnp.ones(y.shape[:3] + (1,), bool)
        return outs, masks


def _zero_stuff(x, mask, factor: int, out_hw):
    """Place stride-8k features on the stride-8 grid at indices
    (factor*i, factor*j) — the dense image of `indices[:, 1:] *= factor`
    (spconv_backbone_voxelnext2d.py:190-191)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    out = jnp.zeros((b, oh, ow, c), x.dtype)
    om = jnp.zeros((b, oh, ow, 1), bool)
    xm = x * mask.astype(x.dtype)
    out = out.at[:, : factor * h : factor, : factor * w : factor].set(
        xm[:, : (oh + factor - 1) // factor, : (ow + factor - 1) // factor])
    om = om.at[:, : factor * h : factor, : factor * w : factor].set(
        mask[:, : (oh + factor - 1) // factor, : (ow + factor - 1) // factor])
    return out, om


class VoxelNeXt2DBackbone(nn.Module):
    """spconv_backbone_voxelnext2d.VoxelResBackBone8xVoxelNeXt2D:70-219.

    Six residual stages (3/4/6/3/3/3 blocks, strides 1..32); stride-16/32
    outputs are index-scaled onto the stride-8 grid and summed where
    coincident, then a regular 3x3 sparse conv (conv_out) and a subm
    shared conv produce the stride-8 output consumed by the center head.
    Only the default SPCONV_KERNEL_SIZES [3,3,3,3] is supported (the
    dense-masked downsample stencil is 3x3).
    """

    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        def blocks(x, mask, ch, n, stage):
            for i in range(n):
                x = SparseBasicBlock(ch, dtype=dt, name=f"{stage}_block{i}")(
                    x, mask, train)
            return x

        x = blocks(x, mask, 32, 3, "conv1")
        stages = {"x_conv1": (x, mask)}
        for si, ch, n in ((2, 64, 4), (3, 128, 6), (4, 256, 3),
                          (5, 256, 3), (6, 256, 3)):
            x, mask = _Downsample(ch, dtype=dt, name=f"conv{si}_down")(
                x, mask, train)
            x = blocks(x, mask, ch, n, f"conv{si}")
            stages[f"x_conv{si}"] = (x, mask)

        # merge 5/6 back onto the stride-8 grid; coincident features sum
        x4, m4 = stages["x_conv4"]
        hw8 = x4.shape[1:3]
        x5, m5 = _zero_stuff(*stages["x_conv5"], 2, hw8)
        x6, m6 = _zero_stuff(*stages["x_conv6"], 4, hw8)
        merged = x4 * m4.astype(x4.dtype) + x5 + x6
        mmask = m4 | m5 | m6

        # conv_out: REGULAR sparse 3x3 stride-1 conv -> active set dilated
        y = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv_out")(merged)
        omask = nn.max_pool(mmask, window_shape=(3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
        y = y * omask.astype(y.dtype)
        y = MaskedBatchNorm(256, eps=1e-3, momentum=0.01,
                            name="conv_out_bn")(
            y, omask, use_running_average=not train)
        y = nn.relu(y) * omask.astype(y.dtype)

        # shared_conv: subm 3x3 (bias) -> BN1d(default eps/momentum) -> ReLU
        z = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=dt, name="shared_conv")(
            y * omask.astype(y.dtype))
        z = z * omask.astype(z.dtype)
        z = MaskedBatchNorm(256, eps=1e-5, momentum=0.1,
                            name="shared_bn")(
            z, omask, use_running_average=not train)
        z = nn.relu(z) * omask.astype(z.dtype)
        return z, omask, {k: v[0] for k, v in stages.items()}


class BaseBEVBackboneV1(nn.Module):
    """backbones_2d/base_bev_backbone.py BaseBEVBackboneV1:115-204.

    Consumes x_conv4 (stride 8) and x_conv5 (stride 16): deblock each
    (transpose-conv upsample), run blocks[1] on x_conv5 first, concat, then
    blocks[0] on the concatenation.
    """

    layer_nums: Sequence[int] = (5, 5)
    num_filters: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, x_conv4, x_conv5, train: bool):
        dt = self.dtype

        def cbr(h, feats, name):
            h = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dt, name=f"{name}_conv")(h)
            h = batch_norm(feats, eps=1e-3, torch_momentum=0.01, name=f"{name}_bn")(
                h, use_running_average=not train)
            return nn.relu(h)

        def block(h, idx):
            # ZeroPad2d(1) + conv s1 p0 == conv p1, then layer_nums convs
            for i in range(1 + self.layer_nums[idx]):
                h = cbr(h, self.num_filters[idx], f"block{idx}_layer{i}")
            return h

        def deblock(h, idx):
            s = self.upsample_strides[idx]
            h = nn.ConvTranspose(
                self.num_upsample_filters[idx], (s, s), strides=(s, s),
                use_bias=False, dtype=dt, name=f"deblock{idx}_conv")(h)
            h = batch_norm(self.num_upsample_filters[idx],
                           eps=1e-3, torch_momentum=0.01, name=f"deblock{idx}_bn")(
                h, use_running_average=not train)
            return nn.relu(h)

        ups = [deblock(x_conv4, 0)]
        ups.append(deblock(block(x_conv5, 1), 1))
        return block(jnp.concatenate(ups, axis=-1), 0)
