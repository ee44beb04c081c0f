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
