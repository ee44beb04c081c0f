"""DSM modality sync: SE fusion of image and radar BEV features.

TPU-native equivalent of FusionAfterBEVSEDirect
(pcdet/models/fusion/fusion_after_bev_se_direct.py:17-59).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import SEBlock, resize_bilinear


class FusionAfterBEVSE(nn.Module):
    """concat(image, radar) -> 3x3 conv + BN + ReLU -> SE block.

    Output channels = image_out + radar_out (256 in shipped configs). The
    image BEV is bilinearly resized (align_corners=False) to the radar BEV
    resolution when they differ (forward:51-52).
    """

    image_out_channels: int = 128
    radar_out_channels: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, image_bev, radar_bev, train: bool):
        if image_bev.shape[1:3] != radar_bev.shape[1:3]:
            image_bev = resize_bilinear(image_bev, radar_bev.shape[1:3])
        c = self.image_out_channels + self.radar_out_channels
        x = jnp.concatenate(
            [image_bev.astype(radar_bev.dtype), radar_bev], axis=-1
        )
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name="fuse_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="fuse_bn",
        )(x)
        x = nn.relu(x)
        return SEBlock(c, name="se")(x)
