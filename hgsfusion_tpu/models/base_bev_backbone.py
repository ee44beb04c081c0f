"""Classic SECOND/PointPillars 2D BEV backbone (encoder + upsample heads).

Reference: pcdet/models/backbones_2d/base_bev_backbone.py (BaseBEVBackbone):
per level, a stride-s conv followed by `layer_num` 3x3 convs (all conv-BN-
ReLU), then per-level transposed-conv upsampling back to a common stride and
channel concat. Used by the inherited PointPillar / SECOND detector family
(SURVEY.md §2.6) — not by the HGS path.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        def cbr(h, feats, stride, name):
            h = nn.Conv(
                feats, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                name=f"{name}_conv",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"{name}_bn",
            )(h)
            return nn.relu(h)

        ups = []
        h = x
        for li, (n_layers, stride, feats) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters)
        ):
            h = cbr(h, feats, stride, f"block{li}_down")
            for bi in range(n_layers):
                h = cbr(h, feats, 1, f"block{li}_layer{bi}")
            up_stride = self.upsample_strides[li]
            u = nn.ConvTranspose(
                self.num_upsample_filters[li], (up_stride, up_stride),
                strides=(up_stride, up_stride), use_bias=False,
                dtype=self.dtype, name=f"deblock{li}_conv",
            )(h)
            u = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"deblock{li}_bn",
            )(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1)


class RPNV2(nn.Module):
    """Two-level PillarNet RPN neck (fine + 2x-coarse BEV maps).

    TPU-native equivalent of RPNV2 (pillarnet_modules/rpn.py:129-254), a
    registered-but-unused leftover. Intended dataflow per its __init__
    (the reference forward has a dead `x` — block_5's input line is
    commented out, so the module as shipped cannot run): deblock_4 is a
    3x3 conv-BN-ReLU on the fine map; block_5 is a conv stack on the
    coarse map whose output deblock_5 transposed-convs 2x back up; the
    two are channel-concatenated and refined by block_4. Norm eps/momentum
    follow the reference's BN defaults (eps 1e-3, momentum 0.01).
    """

    layer_nums: Sequence[int] = (5, 5)          # (block_4, block_5)
    num_filters: Sequence[int] = (128, 256)     # ds_num_filters
    num_upsample_filters: Sequence[int] = (128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, x_fine, x_coarse, train: bool):
        """x_fine: (B, H, W, C4); x_coarse: (B, H/2, W/2, C5).
        Returns (B, H, W, sum(num_upsample_filters))."""
        def cbr(h, feats, name, transpose=False):
            if transpose:
                h = nn.ConvTranspose(
                    feats, (2, 2), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name=f"{name}_conv")(h)
            else:
                h = nn.Conv(
                    feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name=f"{name}_conv")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"{name}_bn")(h)
            return nn.relu(h)

        # block_5: conv stack on the coarse level (rpn.py:171-178, 215-233)
        h5 = cbr(x_coarse, self.num_filters[1], "block5_in")
        for bi in range(self.layer_nums[1]):
            h5 = cbr(h5, self.num_filters[1], f"block5_layer{bi}")
        up5 = cbr(h5, self.num_upsample_filters[1], "deblock5", transpose=True)

        # deblock_4: single 3x3 on the fine level (rpn.py:192-197)
        up4 = cbr(x_fine, self.num_upsample_filters[0], "deblock4")

        h = jnp.concatenate([up4, up5], axis=-1)
        # block_4: refinement stack at the fine resolution (rpn.py:198-203)
        h = cbr(h, sum(self.num_upsample_filters), "block4_in")
        for bi in range(self.layer_nums[0]):
            h = cbr(h, sum(self.num_upsample_filters), f"block4_layer{bi}")
        return h
